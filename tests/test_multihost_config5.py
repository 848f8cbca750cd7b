"""Config-5 compute pattern across REAL process boundaries.

Two JAX processes (Gloo CPU collectives) form one (pair=2, doppler=1,
time=2) global mesh and run the three-axis long-capture engine
(``_batched_os_peak_jit``): pairs shard ACROSS processes, lag chunks
shard across each process's devices with ``ppermute`` halos crossing
the device (and for this mesh layout, the process) boundary.  Each
process verifies the peaks of its addressable pair shard — the closest
executable evidence to BASELINE config 5's "N>=2 hosts with cross-host
halo exchange" that a single machine can give.
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
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from caf_cookoff_tpu.parallel import make_mesh
    from caf_cookoff_tpu.parallel.mesh import (
        AXIS_DOPPLER, AXIS_PAIR, AXIS_TIME,
    )
    from caf_cookoff_tpu.parallel.sharded import (
        _batched_os_peak_jit, _split_host, pad_axis_to,
    )

    fs = 48e3
    pairs, n, l = 4, 256, 8192
    lags = [100, 3000, 5555, 7936]
    f_true = [-500.0, 0.0, 250.0, 500.0]
    rng = np.random.default_rng(7)
    needles = (rng.standard_normal((pairs, n))
               + 1j * rng.standard_normal((pairs, n))).astype(np.complex64)
    hays = (1e-4 * (rng.standard_normal((pairs, l))
                    + 1j * rng.standard_normal((pairs, l)))
            ).astype(np.complex64)
    t = np.arange(n)
    for b in range(pairs):
        span = min(n, l - lags[b])
        hays[b, lags[b]:lags[b] + span] += (
            needles[b] * np.exp(2j * np.pi * f_true[b] * t / fs)
        ).astype(np.complex64)[:span]
    freqs = np.arange(-1000.0, 1000.0, 250.0, dtype=np.float32)

    # pair axis spans the PROCESSES, time axis each process's devices.
    mesh = make_mesh(pair=2, doppler=1, time=2)
    total_lags = l - n + 1
    needed = min(l, total_lags + n - 1)
    chunk = max(-(-needed // 2), n - 1)
    hay_p = np.pad(hays, ((0, 0), (0, 2 * chunk - l))) \\
        if 2 * chunk > l else hays[:, : 2 * chunk]
    ns_re, ns_im = _split_host(needles)
    hs_re, hs_im = _split_host(hay_p)
    freqs_p = pad_axis_to(freqs, 1)
    put = lambda x, spec: multihost.put_global(x, mesh, spec)
    peak = _batched_os_peak_jit(
        put(ns_re, P(AXIS_PAIR)), put(ns_im, P(AXIS_PAIR)),
        put(hs_re, P(AXIS_PAIR, AXIS_TIME)),
        put(hs_im, P(AXIS_PAIR, AXIS_TIME)),
        put(freqs_p, P(AXIS_DOPPLER)), fs, mesh, n, chunk, total_lags,
        "xla")
    # Each process checks the pairs it can address.
    checked = 0
    for shard in peak.lag_idx.addressable_shards:
        b0 = shard.index[0].start or 0
        for i, got_lag in enumerate(np.asarray(shard.data)):
            b = b0 + i
            assert int(got_lag) == lags[b], (b, int(got_lag), lags[b])
            checked += 1
    for shard in peak.freq_idx.addressable_shards:
        b0 = shard.index[0].start or 0
        for i, fidx in enumerate(np.asarray(shard.data)):
            b = b0 + i
            assert float(freqs_p[int(fidx)]) == f_true[b], (
                b, freqs_p[int(fidx)], f_true[b])
    print(f"RESULT {pid} checked={checked}", flush=True)
""")


def test_two_process_config5_pattern(tmp_path):
    worker = tmp_path / "worker5.py"
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
    outs = [p.communicate(timeout=300)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-2500:]}"
        # 2 local pairs x 2 local devices (time replicas) = 4 entries.
        assert f"RESULT {i} checked=4" in out, out[-2500:]
