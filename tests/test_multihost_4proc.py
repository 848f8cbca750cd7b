"""Four-process multi-controller test: one mesh axis spans ALL four.

The 2-process tests prove the Gloo mechanism but never exercise a
shard_map axis spanning more than two processes — the first shape where
a wrong ``put_global`` spec, a wrong axis ordering, or a broken halo
permutation would show (interior processes have BOTH a left and a right
neighbor).  Here 4 processes (one XLA CPU device each) form a
``time=4`` global mesh and run the time-sharded overlap-save engine:

* a tail-lag emitter whose correlation window lives entirely in the
  LAST process's chunk + halo (data arrives via 3 chained ppermute
  boundaries' worth of shard layout);
* an emitter straddling the 2nd/3rd process boundary (its window spans
  two processes — recovered only if the cross-process halo carries real
  neighbor samples);
* the multi-emitter lattice reduction (``global_peaks`` all_gather +
  deterministic merge) replicated identically on every process.
"""

import os
import pathlib
import socket
import subprocess
import sys
import textwrap

import pytest

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]

NPROCS = 4

WORKER = textwrap.dedent("""
    import os, sys
    pid, port = int(sys.argv[1]), sys.argv[2]
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    import jax
    jax.config.update("jax_platforms", "cpu")

    from caf_cookoff_tpu.parallel import multihost

    multihost.initialize_cluster(f"localhost:{port}", num_processes=4,
                                 process_id=pid)
    assert jax.process_count() == 4
    assert len(jax.devices()) == 4

    import numpy as np
    from jax.sharding import PartitionSpec as P

    from caf_cookoff_tpu.parallel import make_mesh
    from caf_cookoff_tpu.parallel.mesh import AXIS_DOPPLER, AXIS_TIME
    from caf_cookoff_tpu.parallel.sharded import (
        _os_sharded_peak_jit, _os_sharded_peaks_jit, _split_host,
        pad_axis_to,
    )

    fs = 48e3
    n, l = 256, 8192
    total_lags = l - n + 1
    t_shards = 4
    chunk = max(-(-min(l, total_lags + n - 1) // t_shards), n - 1)
    # Emitter 1: tail lag (last chunk's halo is zero-fill — the lag
    # must still win).  Emitter 2: window straddles the chunk-1/chunk-2
    # process boundary.  Emitter 3: interior of chunk 0.
    lag_tail = total_lags - 1
    lag_straddle = 2 * chunk - n // 2
    truths = [(-500.0, 77, 1.0), (250.0, lag_straddle, 0.8),
              (500.0, lag_tail, 0.6)]
    rng = np.random.default_rng(7)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(l)
                   + 1j * rng.standard_normal(l))).astype(np.complex64)
    t = np.arange(n)
    for f_hz, lag, amp in truths:
        span = min(n, l - lag)
        hay[lag:lag + span] += (amp * needle * np.exp(
            2j * np.pi * f_hz * t / fs)).astype(np.complex64)[:span]
    freqs = np.arange(-1000.0, 1000.0, 250.0, dtype=np.float32)

    mesh = make_mesh(time=4)           # the axis spans ALL 4 processes
    hay_p = np.pad(hay, (0, t_shards * chunk - l)) \\
        if t_shards * chunk > l else hay[: t_shards * chunk]
    n_re, n_im = _split_host(needle)
    h_re, h_im = _split_host(hay_p)
    freqs_p = pad_axis_to(freqs, 1)
    put = lambda x, spec: multihost.put_global(x, mesh, spec)
    g = (put(n_re, P()), put(n_im, P()),
         put(h_re, P(AXIS_TIME)), put(h_im, P(AXIS_TIME)),
         put(freqs_p, P(AXIS_DOPPLER)))

    # Single-peak: the strongest emitter, exactly, on every process.
    pk = _os_sharded_peak_jit(*g, fs, mesh, n, chunk, total_lags, "xla")
    assert (float(freqs_p[int(pk.freq_idx)]), int(pk.lag_idx)) == \\
        (truths[0][0], truths[0][1]), (pid, pk)

    # Multi-peak lattice across all 4 processes: every emitter
    # recovered, strongest first, incl. the straddler and the tail.
    lat = _os_sharded_peaks_jit(*g, fs, mesh, n, chunk, total_lags,
                                "xla", 4, 2, 16, len(freqs_p))
    got = [(float(freqs_p[int(k)]), int(lg))
           for k, lg, v in zip(np.asarray(lat.freq_idx),
                               np.asarray(lat.lag_idx),
                               np.asarray(lat.value))
           if np.isfinite(float(v))][:3]
    want = [(f, lag) for f, lag, _ in truths]
    assert got == want, (pid, got, want)

    # Lattice + DETECTION under real multi-controller semantics
    # (round 5): the measured noise floor psums over the 4-process
    # time axis; the three emitters clear a 25 dB threshold and the
    # spare 4th slot (an emitter sidelobe at ~20 dB — the documented
    # noise-relative-floor caveat) masks — identically on every
    # process.
    from caf_cookoff_tpu.models.overlap_save import mean_floor
    from caf_cookoff_tpu.ops.peak import apply_detection_threshold

    lat2, fsum, fcnt = _os_sharded_peaks_jit(
        *g, fs, mesh, n, chunk, total_lags, "xla", 4, 2, 16,
        len(freqs_p), with_floor=True)
    assert np.allclose(np.asarray(lat2.value), np.asarray(lat.value)), \\
        (pid, lat2.value, lat.value)
    floor = mean_floor(np.asarray(fsum), np.asarray(fcnt))
    vals, snr, thresh = apply_detection_threshold(
        np.asarray(lat2.value), floor, total_lags * len(freqs), 25.0)
    n_det = int(np.isfinite(vals).sum())
    assert n_det == 3, (pid, vals, snr, thresh)
    assert (snr[:3] > thresh).all(), (pid, snr, thresh)
    assert not np.isfinite(vals[3]), (pid, vals)
    # The auto (cell-count-derived) threshold also computes and keeps
    # every real emitter.
    vals_a, _, _ = apply_detection_threshold(
        np.asarray(lat2.value), floor, total_lags * len(freqs), "auto")
    assert np.isfinite(vals_a[:3]).all(), (pid, vals_a)
    print(f"RESULT {pid} single+lattice+detection ok", flush=True)
""")


@pytest.mark.skipif(os.cpu_count() < NPROCS,
                    reason="needs 4 cores for 4 JAX processes")
def test_four_process_time_axis(tmp_path):
    worker = tmp_path / "worker4.py"
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
        for i in range(NPROCS)]
    outs = [p.communicate(timeout=420)[0].decode() for p in procs]
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-3000:]}"
        assert f"RESULT {i} single+lattice+detection ok" in out, \
            out[-3000:]
