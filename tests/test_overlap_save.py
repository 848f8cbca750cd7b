"""Overlap-save segmented correlation tests.

The capability the reference lacks entirely (it truncates every haystack
to needle length, ``caf_go/main.go:20``, ``caf_python/caf.py:130``).
Correctness is pinned two ways, per SURVEY §7 "hard parts":

* block stitching vs a whole-array linear-correlation oracle on small
  sizes (off-by-one halos show up immediately);
* golden fixtures searched over their FULL haystack (needle + lag + 96
  trailing zeros) must recover the same (freq, lag) the truncated-path
  golden tests pin.
"""

import numpy as np
import pytest

from caf_cookoff_tpu.config import FreqGrid
from caf_cookoff_tpu.models.overlap_save import (
    overlap_save_peak,
    overlap_save_surface,
    plan_blocks,
)
from caf_cookoff_tpu.utils.io import load_c64

FS = 48_000.0


def _linear_xcor_oracle(needle: np.ndarray, haystack: np.ndarray,
                        freqs: np.ndarray, fs: float) -> np.ndarray:
    """Direct O(K * L * N) linear correlation surface, mag^2."""
    n, l = len(needle), len(haystack)
    lags = l - n + 1
    t = np.arange(n)
    out = np.zeros((len(freqs), lags), dtype=np.float64)
    for k, f in enumerate(freqs):
        shifted = needle * np.exp(2j * np.pi * float(f) * t / fs)
        for tau in range(lags):
            acc = np.vdot(shifted, haystack[tau:tau + n])  # sum h * conj(s)
            out[k, tau] = abs(acc) ** 2
    return out


def test_plan_blocks():
    m, v, b = plan_blocks(4096, 5000)
    assert (m, v) == (8192, 4096)
    assert b == 2


def test_surface_matches_oracle_small():
    rng = np.random.default_rng(7)
    n, l = 32, 300
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    haystack = (rng.standard_normal(l) + 1j * rng.standard_normal(l)).astype(np.complex64)
    freqs = np.array([-900.0, 0.0, 450.0], dtype=np.float32)
    got = np.asarray(overlap_save_surface(needle, haystack, freqs, FS))
    want = _linear_xcor_oracle(needle, haystack, freqs, FS)
    assert got.shape == want.shape == (3, l - n + 1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)


def test_surface_block_boundaries_exact():
    """A delta needle makes the correlation a pure shifted copy — any halo
    off-by-one breaks equality at specific lags."""
    n, l = 16, 200
    needle = np.zeros(n, dtype=np.complex64)
    needle[0] = 1.0
    rng = np.random.default_rng(3)
    haystack = (rng.standard_normal(l) + 1j * rng.standard_normal(l)).astype(np.complex64)
    surf = np.asarray(overlap_save_surface(needle, haystack, np.zeros(1, np.float32), FS))
    want = np.abs(haystack[: l - n + 1]) ** 2
    np.testing.assert_allclose(surf[0], want, rtol=1e-4, atol=1e-5)


def test_peak_matches_surface_argmax():
    rng = np.random.default_rng(11)
    n, l = 64, 1000
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    lag = 517
    haystack = np.zeros(l, dtype=np.complex64)
    haystack[lag:lag + n] = needle * np.exp(
        2j * np.pi * 200.0 * np.arange(n) / FS)
    freqs = np.arange(-400, 400, 50, dtype=np.float32)
    surf = np.asarray(overlap_save_surface(needle, haystack, freqs, FS))
    k, t = np.unravel_index(surf.argmax(), surf.shape)
    freq, got_lag, val = overlap_save_peak(needle, haystack, freqs, FS)
    assert (freq, got_lag) == (float(freqs[k]), int(t)) == (200.0, lag)
    assert val == pytest.approx(surf.max(), rel=1e-5)


@pytest.mark.parametrize("idx,grid,want_freq,want_lag", [
    (0, FreqGrid(-100.0, 100.0, 0.25), 69.25, 202),
    (4, FreqGrid(80.0, 100.0, 0.1), 82.9, 70),
    (6, FreqGrid(-100.0, 100.0, 0.25), -49.75, 15),
])
def test_golden_full_haystack(fixture_pairs, idx, grid, want_freq, want_lag):
    """Search the UNtruncated haystack (what the reference cannot do) and
    still land on the golden (freq, lag)."""
    needle_path, haystack_path = fixture_pairs[idx]
    needle = load_c64(needle_path)
    haystack = load_c64(haystack_path)  # full length: N + lag + 96
    assert len(haystack) > len(needle)
    freqs = grid.frequencies(np.float32)
    freq, lag, _ = overlap_save_peak(needle, haystack, freqs, FS)
    assert freq == pytest.approx(want_freq, abs=1e-4)
    assert lag == want_lag


def test_overlap_save_peaks_num_peaks_one_shapes():
    """num_peaks=1 returns (1,)-shaped lattice rows (the documented
    contract), matching overlap_save_peak's triple."""
    import numpy as np

    from caf_cookoff_tpu.models.overlap_save import (
        batched_overlap_save_peaks_local,
        overlap_save_peak,
        overlap_save_peaks,
    )

    rng = np.random.default_rng(1)
    n = 1024
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = np.zeros(4096, np.complex64)
    hay[700:700 + n] = needle * np.exp(
        2j * np.pi * 40.0 * np.arange(n) / 48e3).astype(np.complex64)
    freqs = np.arange(-100, 100, 1.0, dtype=np.float32)
    f1, l1, v1 = overlap_save_peak(needle, hay, freqs, 48e3,
                                   backend="xla")
    fr, lg, vv, snr = overlap_save_peaks(needle, hay, freqs, 48e3, 1,
                                         backend="xla", with_snr=True)
    assert fr.shape == lg.shape == vv.shape == snr.shape == (1,)
    assert (float(fr[0]), int(lg[0]), float(vv[0])) == (f1, l1, v1)
    frb, lgb, vvb = batched_overlap_save_peaks_local(
        np.stack([needle]), np.stack([hay]), freqs, 48e3, 1,
        backend="xla")
    assert frb.shape == (1, 1)
    assert (float(frb[0, 0]), int(lgb[0, 0])) == (f1, l1)
