"""Randomized cross-engine consistency (seeded, deterministic).

The reference pins one fixture through all seven strategies
(``caf_rust/tests/test.rs:15-145``); this sweeps randomized workloads
— random needle lengths, on-grid dopplers, lags incl. edges — through
every exact engine family and requires identical (freq, lag).  The
kind of coverage a fixed fixture set cannot give.
"""

import numpy as np
import pytest

from caf_cookoff_tpu.models.batched_stein import (
    batched_stein_os_peak,
    batched_stein_peak,
)
from caf_cookoff_tpu.models.filterbank import caf_peak
from caf_cookoff_tpu.models.overlap_save import overlap_save_peak
from caf_cookoff_tpu.models.stein import (
    stein_caf_peak,
    stein_overlap_save_peak,
)
from caf_cookoff_tpu.models.streaming import StreamingCAF

FS = 48_000.0

CASES = [
    # (seed, n, lag, f_idx, grid_start, grid_step, grid_bins)
    (0, 1024, 0, 3, -400.0, 50.0, 16),          # zero lag
    (1, 2048, 1792, 11, -100.0, 12.5, 16),      # late lag, 12% overlap
    (2, 1000, 421, 7, -750.0, 125.0, 12),       # non-pow2 needle
    (3, 4096, 96, 0, -100.0, 25.0, 8),          # grid edge bin
    (4, 512, 300, 15, -1000.0, 125.0, 16),      # last grid bin
    (5, 8192, 5000, 5, -50.0, 6.25, 16),        # long needle, fine grid
    (6, 2048, 777, 9, -8000.0, 1000.0, 16),     # wide span (banded)
    (7, 4096, 1234, 21, -5000.0, 250.0, 40),    # wide span, denser
]


@pytest.mark.parametrize("seed,n,lag,f_idx,g0,gs,gk", CASES)
def test_engines_agree_randomized(seed, n, lag, f_idx, g0, gs, gk):
    rng = np.random.default_rng(seed)
    freqs = (g0 + gs * np.arange(gk)).astype(np.float32)
    f_true = float(freqs[f_idx])
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(n)
                   + 1j * rng.standard_normal(n))).astype(np.complex64)
    span = n - lag
    hay[lag:] += (needle * np.exp(
        2j * np.pi * f_true * np.arange(n) / FS)).astype(np.complex64)[:span]

    want = (f_true, lag)
    for backend in ("xla", "matmul", "matmul-highest"):
        freq, got_lag, _ = caf_peak(needle, hay, freqs, FS,
                                    backend=backend)
        assert (freq, got_lag) == want, (backend, freq, got_lag)
    freq, got_lag, _ = stein_caf_peak(needle, hay, freqs, FS)
    assert (freq, got_lag) == want, ("stein", freq, got_lag)
    fr, lg, _ = batched_stein_peak(needle[None], hay[None], freqs, FS)
    assert (float(fr[0]), int(lg[0])) == want, ("batched", fr[0], lg[0])


LONG_CASES = [
    # (seed, n, total, lag, f_idx, grid_start, grid_step, grid_bins,
    #  chunk) — chunk deliberately not dividing total in case 12.
    (10, 512, 16384, 0, 2, -400.0, 50.0, 16, 2048),      # zero lag
    (11, 1024, 32768, 31744, 5, -100.0, 12.5, 16, 4096),  # last full lag
    (12, 1000, 20000, 13777, 7, -750.0, 125.0, 12, 3000),  # non-pow2 all
    (13, 256, 8192, 7936, 3, -250.0, 62.5, 8, 1024),     # last-sample lag
    (14, 2048, 65536, 50123, 9, -8000.0, 1000.0, 16, 8192),  # wide span
]


MULTI_CASES = [
    # (seed, n, total, chunk, [(f_idx, lag, amp)]) — emitters at
    # distinct doppler bins and well-separated lags; the stein and XLA
    # streaming lattices must produce the SAME detections.
    (20, 1024, 32768, 8192, [(3, 9000, 1.0), (11, 22000, 0.7)]),
    (21, 512, 16384, 2048, [(2, 500, 1.0), (9, 9100, 0.8),
                            (14, 15000, 0.6)]),
    (22, 1024, 24576, 4096, [(5, 4090, 1.0), (12, 4300, 0.75)]),
    (23, 2048, 65536, 8192, [(1, 63400, 1.0), (8, 31000, 0.65)]),
]


@pytest.mark.parametrize("seed,n,total,chunk,emitters", MULTI_CASES)
def test_streaming_lattices_agree_fuzz(seed, n, total, chunk, emitters):
    """Multi-emitter streaming consistency: the fused stein stream's
    lattice (want_top2 per-bin candidates + constrained exact
    re-score) and the XLA stream's lattice recover the SAME emitter
    set from randomized captures — including a pair separated by only
    ~210 lags inside one chunk window (case 22) and a boundary-area
    emitter at the capture tail (case 23)."""
    rng = np.random.default_rng(seed)
    freqs = np.arange(-100, 100, 12.5, dtype=np.float32)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))
           ).astype(np.complex64)
    t = np.arange(n)
    truths = []
    for f_idx, lag, amp in emitters:
        f = float(freqs[f_idx])
        span = min(n, total - lag)
        hay[lag:lag + span] += (amp * needle * np.exp(
            2j * np.pi * f * t / FS)).astype(np.complex64)[:span]
        truths.append((f, lag))
    p = len(emitters) + 1          # one spare slot (stays -inf/noise)
    results = {}
    for backend in ("xla", "stein"):
        s = StreamingCAF(needle, freqs, FS, chunk_len=chunk,
                         num_peaks=p, backend=backend)
        for i in range(0, total, chunk):
            s.process(hay[i:i + chunk])
        fr, lg, vv = s.peaks()
        results[backend] = [(float(f), int(l))
                            for f, l, v in zip(fr, lg, vv)
                            if np.isfinite(float(v))][:len(emitters)]
    assert results["xla"][:len(truths)] == truths, results
    assert results["stein"][:len(truths)] == truths, results
    # The fused batched OS lattice engine (round 5) on the same capture
    # must recover the same emitter set as the streams.
    from caf_cookoff_tpu.models.batched_stein import batched_stein_os_peaks

    fr, lg, vv = batched_stein_os_peaks(needle[None], hay[None], freqs,
                                        FS, p)
    got = [(float(f), int(l)) for f, l, v in zip(fr[0], lg[0], vv[0])
           if np.isfinite(float(v))][:len(truths)]
    assert got == truths, ("batched-os", got)


@pytest.mark.parametrize("seed,n,total,lag,f_idx,g0,gs,gk,chunk",
                         LONG_CASES)
def test_long_capture_engines_agree(seed, n, total, lag, f_idx, g0, gs,
                                    gk, chunk):
    """Long-capture family: the XLA overlap-save scan (oracle), the
    Stein OS engine (banded where the span demands it), the windowed
    batch engine, and StreamingCAF all recover the same (freq, lag)
    from randomized captures — absolute lags, including the final
    full-overlap lag (the copy's last sample IS the capture's last)."""
    rng = np.random.default_rng(seed)
    freqs = (g0 + gs * np.arange(gk)).astype(np.float32)
    f_true = float(freqs[f_idx])
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))
           ).astype(np.complex64)
    span = min(n, total - lag)
    hay[lag:lag + span] += (needle * np.exp(
        2j * np.pi * f_true * np.arange(n) / FS)
    ).astype(np.complex64)[:span]

    want = (f_true, lag)
    got = overlap_save_peak(needle, hay, freqs, FS, backend="xla")
    assert got[:2] == want, ("os-xla", got)
    got = stein_overlap_save_peak(needle, hay, freqs, FS)
    assert got[:2] == want, ("stein-os", got)
    fr, lg, _ = batched_stein_os_peak(needle[None], hay[None], freqs, FS)
    assert (float(fr[0]), int(lg[0])) == want, ("batched-os", fr[0], lg[0])
    s = StreamingCAF(needle, freqs, FS, chunk_len=chunk)
    for i in range(0, total, chunk):
        s.process(hay[i:i + chunk])
    got = s.best()
    assert got[:2] == want, ("stream", got)
    # Stein-mode streaming bands are undefined past fs/32 spans — only
    # run it where the envelope admits a block length.
    if max(abs(freqs)) <= FS / 32:
        s = StreamingCAF(needle, freqs, FS, chunk_len=chunk,
                         backend="stein")
        for i in range(0, total, chunk):
            s.process(hay[i:i + chunk])
        got = s.best()
        assert got[:2] == want, ("stream-stein", got)
