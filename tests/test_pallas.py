"""Fused Pallas kernel tests (interpret mode on CPU).

The compiled path is exercised on real TPU hardware by bench.py and the
on-chip golden validation; here the same kernel runs under the Pallas
interpreter and must agree with the XLA engines bin-exactly.
"""

import numpy as np
import pytest

from caf_cookoff_tpu.models.filterbank import caf_peak
from caf_cookoff_tpu.ops.pallas_caf import (
    TILE_BINS,
    _fourstep_constants,
    haystack_spectrum_noreorder,
)

FS = 48_000.0


def test_fourstep_constants_shapes():
    n1, n2, c = _fourstep_constants(8192)
    assert (n1, n2) == (64, 128)
    assert c["f1s"].shape == (128, 128)
    assert c["f2s"].shape == (256, 256)
    assert c["tw_re"].shape == (64, 128)


def test_haystack_spectrum_layout():
    """(k1,k2)-layout spectrum is the reordered standard FFT."""
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(96) + 1j * rng.standard_normal(96)).astype(
        np.complex64)
    m = 256
    n1, n2, _ = _fourstep_constants(m)
    h2r, h2i = haystack_spectrum_noreorder(x.real.copy(), x.imag.copy(), m)
    want = np.fft.fft(np.pad(x, (0, m - len(x))))
    # layout: Z[k1, k2] = X[k1 + n1*k2]
    got = (np.asarray(h2r) + 1j * np.asarray(h2i))
    want2d = want.reshape(n2, n1).T  # X[k1 + n1*k2] -> [k1, k2]
    np.testing.assert_allclose(got, want2d.astype(np.complex64),
                               rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("backend", ["pallas", "pallas-refine",
                                     "pallas-bf16"])
def test_pallas_golden_chirp0(chirp, backend):
    """Interpret-mode kernel recovers the chirp_0 golden peak on a
    narrow grid around the true offset (24 bins, fast to interpret)."""
    needle, haystack, _ = chirp(0)
    freqs = (68.0 + 0.25 * np.arange(24)).astype(np.float32)  # 24 bins
    freq, lag, _ = caf_peak(needle, haystack, freqs, FS, backend=backend)
    assert (freq, lag) == (69.25, 202)


def test_pallas_matches_matmul_synthetic():
    rng = np.random.default_rng(11)
    n = 512
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    hay = np.roll(needle, 40) * np.exp(
        2j * np.pi * 1000.0 * np.arange(n) / FS).astype(np.complex64)
    freqs = np.arange(-2000.0, 2000.0, 250.0, dtype=np.float32)  # 16 bins
    want = caf_peak(needle, hay, freqs, FS, backend="matmul")
    got = caf_peak(needle, hay, freqs, FS, backend="pallas")
    assert got[:2] == want[:2] == (1000.0, 40)


def test_pallas_surface_matches_matmul():
    """Surface-emitting kernel variant: same (K, M) surface as the XLA
    matmul path (natural lag order, 1/M^2 normalization parity)."""
    from caf_cookoff_tpu.models.filterbank import caf_surface

    rng = np.random.default_rng(5)
    n = 512
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    hay = np.roll(needle, 40) * np.exp(
        2j * np.pi * 1000.0 * np.arange(n) / FS).astype(np.complex64)
    freqs = np.arange(-2000.0, 2000.0, 250.0, dtype=np.float32)
    a = np.asarray(caf_surface(needle, hay, freqs, FS, backend="matmul"))
    b = np.asarray(caf_surface(needle, hay, freqs, FS, backend="pallas"))
    assert a.shape == b.shape == (16, 1024)
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4 * a.max())


def test_bin_padding_to_tile():
    """A bin count not divisible by TILE_BINS pads with duplicates of
    the last frequency; the original bin must win ties."""
    rng = np.random.default_rng(13)
    n = 256
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    hay = np.roll(needle, 7)
    freqs = np.arange(-500.0, 750.0, 250.0, dtype=np.float32)  # 5 bins
    assert len(freqs) % TILE_BINS != 0
    freq, lag, _ = caf_peak(needle, hay, freqs, FS, backend="pallas")
    assert (freq, lag) == (0.0, 7)


def test_non_pow2_needle_length():
    """5000-sample needle (M rounds to 16384, not a column multiple):
    the kernel zero-pads the needle — identical correlation — instead
    of rejecting it."""
    rng = np.random.default_rng(0)
    n = 5000
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    hay = np.roll(needle, 123)
    freqs = np.arange(-100.0, 100.0, 10.0, dtype=np.float32)
    assert caf_peak(needle, hay, freqs, FS,
                    backend="pallas")[:2] == (0.0, 123)
    from caf_cookoff_tpu.models.filterbank import caf_surface

    s = caf_surface(needle, hay, freqs, FS, backend="pallas")
    assert s.shape == (20, 16384)


def test_fused_vmem_demand_guard():
    """Shapes past the chip's VMEM budget raise the actionable message
    (the engines' kernel-route try/except relies on this ValueError to
    fall back to the scan/matmul paths)."""
    import pytest

    from caf_cookoff_tpu.ops.pallas_stein import _vmem_demand

    # A small shape fits with room to spare...
    assert _vmem_demand(128, 20480, 64, 16, 16384, 400, 1, 4,
                        want_idxs=True) <= 100 * 2**20
    # ...a huge staircase span does not.
    with pytest.raises(ValueError, match="VMEM"):
        _vmem_demand(512, 400_000, 64, 16, 16384, 400, 1, 4,
                     want_idxs=True)
