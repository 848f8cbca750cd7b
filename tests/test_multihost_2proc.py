"""Real multi-controller test: 2 JAX processes, Gloo CPU collectives.

The one distributed capability a single-process suite cannot prove:
``jax.distributed.initialize`` + global-mesh formation + cross-process
collective peak reduction.  Two subprocesses (2 virtual CPU devices
each -> 4 global) each run the doppler-sharded CAF via
``multihost_caf_peak`` and must both print the golden answer computed
through cross-process pmax/pmin.  SURVEY §2.4's "to build" item,
now executed rather than just wrapped.
"""

import os
import pathlib
import socket
import subprocess
import sys
import textwrap

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]

WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from caf_cookoff_tpu.parallel import multihost

    multihost.initialize_cluster(f"localhost:{port}", num_processes=2,
                                 process_id=pid)
    assert jax.process_count() == 2, jax.process_count()
    assert len(jax.devices()) == 4, jax.devices()

    import numpy as np
    n, fs, lag, f_true = 512, 48e3, 137, -750.0
    rng = np.random.default_rng(3)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = np.zeros(n, np.complex64)
    hay[lag:] = (needle * np.exp(
        2j * np.pi * f_true * np.arange(n) / fs))[: n - lag]
    freqs = np.arange(-1000.0, 1000.0, 250.0, dtype=np.float32)

    mesh = multihost.global_mesh(doppler=4)        # spans both processes
    freq, got_lag, _ = multihost.multihost_caf_peak(
        needle, hay, freqs, fs, mesh, backend="xla")
    print(f"RESULT {pid} {freq} {got_lag}", flush=True)
""")


def test_two_process_doppler_sharded_peak(tmp_path):
    worker = tmp_path / "worker.py"
    worker.write_text(WORKER)
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    env = dict(os.environ,
               PYTHONPATH=f"{REPO_ROOT}:{os.environ.get('PYTHONPATH', '')}")
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), str(port)],
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=240)
        outs.append(out.decode())
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2000:]}"
        assert f"RESULT {i} -750.0 137" in out, out[-2000:]
