"""Batched-pair and streaming engine tests (BASELINE configs 2 and 4)."""

import numpy as np
import pytest

from caf_cookoff_tpu.config import FreqGrid
from caf_cookoff_tpu.models.batched import batched_caf_peak, batched_caf_surface
from caf_cookoff_tpu.models.filterbank import caf_peak, caf_surface
from caf_cookoff_tpu.models.overlap_save import overlap_save_peak
from caf_cookoff_tpu.models.streaming import StreamingCAF

FS = 48_000.0
GRID = FreqGrid(-100.0, 100.0, 0.25)


def test_batched_matches_single(chirp):
    freqs = GRID.frequencies(np.float32)
    idxs = [0, 3, 7]
    needles, haystacks, singles = [], [], []
    for i in idxs:
        n, h, _ = chirp(i)
        needles.append(n)
        haystacks.append(h)
        singles.append(caf_peak(n, h, freqs, FS))
    fr, lg, val = batched_caf_peak(np.stack(needles), np.stack(haystacks),
                                   freqs, FS)
    for b, (f1, l1, v1) in enumerate(singles):
        assert (float(fr[b]), int(lg[b])) == (f1, l1)
        assert val[b] == pytest.approx(v1, rel=1e-5)


def test_batched_surface_matches_single(chirp):
    freqs = np.arange(-50, 50, 5.0, dtype=np.float32)
    n0, h0, _ = chirp(0)
    n1, h1, _ = chirp(1)
    batch = batched_caf_surface(np.stack([n0, n1]), np.stack([h0, h1]),
                                freqs, FS)
    single = caf_surface(n1, h1, freqs, FS)
    np.testing.assert_allclose(np.asarray(batch[1]), np.asarray(single),
                               rtol=1e-4, atol=1e-2)


def test_batched_shape_validation():
    with pytest.raises(ValueError):
        batched_caf_peak(np.zeros((2, 64), np.complex64),
                         np.zeros((3, 64), np.complex64),
                         np.zeros(4, np.float32), FS)


def _make_capture(needle, lag, f_hz, total, fs, noise=1e-4, seed=0):
    rng = np.random.default_rng(seed)
    cap = (noise * (rng.standard_normal(total)
                    + 1j * rng.standard_normal(total))).astype(np.complex64)
    n = len(needle)
    cap[lag:lag + n] += needle * np.exp(
        2j * np.pi * f_hz * np.arange(n) / fs).astype(np.complex64)
    return cap


def test_streaming_matches_overlap_save():
    rng = np.random.default_rng(21)
    n, total, lag, f_true = 256, 8192, 5000, 750.0
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    capture = _make_capture(needle, lag, f_true, total, FS, seed=22)
    freqs = np.arange(-2000.0, 2000.0, 250.0, dtype=np.float32)

    want = overlap_save_peak(needle, capture, freqs, FS)

    s = StreamingCAF(needle, freqs, FS)
    chunk = 1024
    for i in range(0, total, chunk):
        s.process(capture[i:i + chunk])
    got = s.best()
    assert got[:2] == want[:2] == (f_true, lag)
    assert got[2] == pytest.approx(want[2], rel=1e-4)


def test_streaming_peak_straddles_chunk_boundary():
    """Emitter placed so the correlation window crosses a chunk edge —
    the tail carry-over must preserve it."""
    rng = np.random.default_rng(31)
    n, chunk = 128, 512
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    lag = chunk - n // 2  # needle copy spans the first chunk boundary
    total = 4 * chunk
    capture = _make_capture(needle, lag, 0.0, total, FS, seed=32)
    freqs = np.zeros(1, dtype=np.float32)

    s = StreamingCAF(needle, freqs, FS)
    for i in range(0, total, chunk):
        s.process(capture[i:i + chunk])
    _, got_lag, _ = s.best()
    assert got_lag == lag


def test_streaming_uneven_chunks():
    """Mixed chunk lengths (short remainders AND an oversized chunk)
    compile exactly ONE executable: the stream pins its chunk length,
    pads+masks short chunks and slices long ones (no mid-stream
    recompile — round-1 weak #5)."""
    from caf_cookoff_tpu.models.streaming import _stream_step_jit

    rng = np.random.default_rng(41)
    n, total, lag = 64, 3000, 1777
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    capture = _make_capture(needle, lag, -300.0, total, FS, seed=42)
    freqs = np.arange(-600.0, 600.0, 100.0, dtype=np.float32)

    compiles_before = _stream_step_jit._cache_size()
    s = StreamingCAF(needle, freqs, FS)
    splits = [0, 700, 1200, 1201, 2900, 3000]
    for a, b in zip(splits[:-1], splits[1:]):
        if b > a:
            s.process(capture[a:b])
    freq, got_lag, _ = s.best()
    assert (freq, got_lag) == (-300.0, lag)
    assert s.samples_seen == total
    assert _stream_step_jit._cache_size() - compiles_before == 1


def test_streaming_pinned_chunk_len():
    """An explicit chunk_len pins the executable up front; a capture
    whose length is not a multiple still streams correctly."""
    rng = np.random.default_rng(43)
    n, total, lag, f_true = 64, 2500, 2100, 200.0
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    capture = _make_capture(needle, lag, f_true, total, FS, seed=44)
    freqs = np.arange(-600.0, 600.0, 100.0, dtype=np.float32)

    s = StreamingCAF(needle, freqs, FS, chunk_len=1024)
    for i in range(0, total, 1024):
        s.process(capture[i:i + 1024])  # final chunk is 452 samples
    freq, got_lag, _ = s.best()
    assert (freq, got_lag) == (f_true, lag)
    assert s.samples_seen == total


def test_streaming_stein_mode_matches_overlap_save():
    """backend='stein' streaming: fused per-chunk coarse scan + exact
    best-window re-score equals the overlap-save engine's answer, with
    uneven chunk lengths handled by the same pinned executable."""
    rng = np.random.default_rng(23)
    n, total, lag, f_true = 512, 8192, 5321, 750.0
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    capture = _make_capture(needle, lag, f_true, total, FS, seed=24)
    freqs = np.arange(-1000.0, 1000.0, 125.0, dtype=np.float32)
    want = overlap_save_peak(needle, capture, freqs, FS)

    s = StreamingCAF(needle, freqs, FS, backend="stein")
    for i in range(0, total, 1024):
        s.process(capture[i:i + 1024])
    assert s.best()[:2] == want[:2] == (f_true, lag)

    s2 = StreamingCAF(needle, freqs, FS, backend="stein", chunk_len=1024)
    for a, b in [(0, 700), (700, 701), (701, 6000), (6000, total)]:
        s2.process(capture[a:b])
    assert s2.best()[:2] == (f_true, lag)


def test_streaming_stein_value_full_energy():
    """best()'s exact re-score on the carried window reports the true
    full-energy |R|^2 — the carry is guard-extended past needle_pad so
    the winning lag's last products don't hit the zero tail."""
    from tests.test_stein import _exact_value_at

    rng = np.random.default_rng(29)
    n, total, lag, f_true = 512, 8192, 5321, 750.0
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    capture = _make_capture(needle, lag, f_true, total, FS, seed=24)
    freqs = np.arange(-1000.0, 1000.0, 125.0, dtype=np.float32)
    s = StreamingCAF(needle, freqs, FS, backend="stein")
    for i in range(0, total, 1024):
        s.process(capture[i:i + 1024])
    freq, got_lag, value = s.best()
    assert (freq, got_lag) == (f_true, lag)
    oracle = _exact_value_at(needle, capture[lag:lag + n], f_true, FS)
    assert value == pytest.approx(oracle, rel=1e-4)
