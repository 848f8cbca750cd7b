"""Kernel unit tests against numpy/scipy oracles.

The reference has no unit tests of xcor/apply_shift in isolation
(SURVEY §4); these close that gap.
"""

import numpy as np
import pytest

from caf_cookoff_tpu.config import FreqGrid, next_pow2, xcor_length
from caf_cookoff_tpu.ops.fft import fft_matmul
from caf_cookoff_tpu.ops.peak import find_peak_2d, signed_lag, surface_peak
from caf_cookoff_tpu.ops.shift import freq_shift, phasor_bank, shift_bank
from caf_cookoff_tpu.ops.xcor import pad_to, xcor, xcor_bank, xcor_pair

RNG = np.random.default_rng(42)
FS = 48_000.0


def _signal(n, dtype=np.complex64):
    return (RNG.standard_normal(n) + 1j * RNG.standard_normal(n)).astype(dtype)


class TestFreqShift:
    def test_matches_closed_form(self):
        x = _signal(1000)
        f = 73.25
        want = x * np.exp(2j * np.pi * f * np.arange(1000) / FS)
        got = np.asarray(freq_shift(x, np.float32(f), FS))
        np.testing.assert_allclose(got, want.astype(np.complex64), atol=2e-5)

    def test_zero_shift_is_identity(self):
        x = _signal(256)
        np.testing.assert_allclose(np.asarray(freq_shift(x, np.float32(0.0), FS)), x)

    def test_negative_frequency_conjugate_symmetry(self):
        x = np.ones(512, np.complex64)
        up = np.asarray(freq_shift(x, np.float32(50.0), FS))
        down = np.asarray(freq_shift(x, np.float32(-50.0), FS))
        np.testing.assert_allclose(up, np.conj(down), atol=1e-6)

    def test_phasor_bank_rows_equal_single_shifts(self):
        freqs = np.array([-100.0, -0.5, 0.25, 99.5], np.float32)
        bank = np.asarray(phasor_bank(freqs, 128, FS))
        for i, f in enumerate(freqs):
            row = np.asarray(freq_shift(np.ones(128, np.complex64), f, FS))
            np.testing.assert_allclose(bank[i], row, atol=1e-6)

    def test_shift_bank_shape(self):
        x = _signal(64)
        out = np.asarray(shift_bank(x, np.linspace(-10, 10, 7, dtype=np.float32), FS))
        assert out.shape == (7, 64)


class TestXcor:
    def test_pair_matches_numpy_full_correlation(self):
        n = 128
        a, b = _signal(n, np.complex128), _signal(n, np.complex128)
        got = np.asarray(xcor_pair(a, b))  # computed at c64 (x64 off)
        # oracle: r[tau] = sum_s a[s+tau] conj(b[s]) for positive lags
        full = np.correlate(a, b, mode="full")  # index n-1+tau <-> lag tau
        scale = np.abs(full).max()
        m = xcor_length(n)
        np.testing.assert_allclose(
            got[:n] / scale, full[n - 1:] / scale, atol=1e-5)
        # negative lags wrap to the top of the circular buffer
        np.testing.assert_allclose(
            got[m - n + 1:] / scale, full[:n - 1] / scale, atol=1e-5)

    def test_known_delay_peaks_at_lag(self):
        n, d = 512, 37
        sig = _signal(n - d)
        a = np.concatenate([np.zeros(d, np.complex64), sig])
        b = np.concatenate([sig, np.zeros(d, np.complex64)])
        r = np.abs(np.asarray(xcor_pair(a, b)))
        assert int(r.argmax()) == d

    def test_same_mode_matches_scipy(self):
        from scipy import signal as sp_signal

        for n in (64, 63):  # even and odd lengths hit different centers
            a, b = _signal(n, np.complex128), _signal(n, np.complex128)
            want = np.abs(sp_signal.correlate(a, b, mode="same", method="fft"))
            got = np.asarray(xcor(a, b))  # c64 compute (x64 off)
            np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_bank_matches_pairs(self):
        n, k = 64, 5
        hay = _signal(n)
        needles = np.stack([_signal(n) for _ in range(k)])
        m = xcor_length(n)
        import jax.numpy as jnp

        spec = jnp.fft.fft(pad_to(jnp.asarray(hay), m))
        rows = np.asarray(xcor_bank(spec, pad_to(jnp.asarray(needles), m)))
        for i in range(k):
            np.testing.assert_allclose(
                rows[i], np.asarray(xcor_pair(hay, needles[i])), atol=1e-4)

    def test_pad_to_validates(self):
        import jax.numpy as jnp

        with pytest.raises(ValueError):
            pad_to(jnp.zeros(16), 8)


class TestMatmulFFT:
    @pytest.mark.parametrize("n", [64, 1024, 8192, 96, 60])
    def test_forward_matches_numpy(self, n):
        x = _signal(n, np.complex64)
        got = np.asarray(fft_matmul(x))
        want = np.fft.fft(x)
        scale = np.abs(want).max()
        np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)

    @pytest.mark.parametrize("n", [256, 8192])
    def test_roundtrip(self, n):
        x = _signal(n, np.complex64)
        back = np.asarray(fft_matmul(fft_matmul(x), forward=False))
        np.testing.assert_allclose(back, x, atol=2e-4)

    def test_batched(self):
        x = np.stack([_signal(512, np.complex64) for _ in range(6)])
        got = np.asarray(fft_matmul(x))
        want = np.fft.fft(x, axis=-1)
        np.testing.assert_allclose(got, want, atol=2e-2)


class TestPeak:
    def test_find_peak_2d(self):
        s = np.zeros((10, 20), np.float32)
        s[7, 13] = 5.0
        peak = find_peak_2d(s)
        assert (float(peak.value), int(peak.freq_idx), int(peak.lag_idx)) == (5.0, 7, 13)

    def test_surface_peak_fused_equals_two_step(self):
        rows = _signal(32 * 64).reshape(32, 64)
        fused = surface_peak(rows)
        two_step = find_peak_2d(np.abs(rows) ** 2)
        assert int(fused.freq_idx) == int(two_step.freq_idx)
        assert int(fused.lag_idx) == int(two_step.lag_idx)

    def test_signed_lag_wraps(self):
        import jax.numpy as jnp

        m, n = 8192, 4096
        assert int(signed_lag(jnp.int32(202), m, n)) == 202
        assert int(signed_lag(jnp.int32(m - 37), m, n)) == -37
        assert int(signed_lag(jnp.int32(0), m, n)) == 0


class TestConfig:
    def test_grid_matches_reference_generator(self):
        # identical to gen_float_shifts(-100, 100, 0.25) — test.rs:335-352
        g = FreqGrid(-100.0, 100.0, 0.25)
        f = g.frequencies()
        assert g.num_bins == 800 and f[0] == -100.0 and f[-1] == 99.75
        # 1 mHz integer stepping avoids float accumulation drift
        g2 = FreqGrid(30.0, 35.0, 0.05)
        assert g2.num_bins == 100
        np.testing.assert_allclose(np.diff(g2.frequencies()), 0.05, rtol=0, atol=1e-12)

    def test_grid_padding(self):
        g = FreqGrid(-100.0, 100.0, 0.5)
        padded, valid = g.padded(128)
        assert valid == 400 and padded.num_bins == 512
        assert padded.frequencies()[:400].tolist() == g.frequencies().tolist()

    def test_next_pow2(self):
        assert [next_pow2(n) for n in (1, 2, 3, 4096, 4097)] == [1, 2, 4, 4096, 8192]
        assert xcor_length(4096) == 8192
        assert xcor_length(4100) == 16384


def test_interpolate_peak_removed():
    """interpolate_peak completed its deprecation cycle (round 4 warn,
    round 5 removal); ops.refine.refine_peak is the supported path."""
    from caf_cookoff_tpu.ops import peak

    assert not hasattr(peak, "interpolate_peak")


def test_doppler_cell_bins_single_frequency_grid():
    """k=1 grids have step 0: the cell must clamp to the grid size, not
    overflow the int32 cast (ADVICE r3)."""
    import jax.numpy as jnp

    from caf_cookoff_tpu.ops.peak import doppler_cell_bins

    one = doppler_cell_bins(jnp.asarray([42.0], jnp.float32), 4096, 48e3)
    assert int(one) == 1
    # ...and a normal grid still derives the fs/N mainlobe in bins.
    grid = jnp.arange(-100.0, 100.0, 0.5, dtype=jnp.float32)
    assert int(doppler_cell_bins(grid, 4096, 48e3)) == 24


def test_streaming_peak_lattice_requires_exclusions():
    """num_peaks>1 without explicit NMS windows is a loud error, not a
    silent waveform-unrelated default."""
    import jax.numpy as jnp

    from caf_cookoff_tpu.models.overlap_save import (
        needle_spectra_conj,
        streaming_peak,
    )

    n = 256
    nsp = needle_spectra_conj(
        (jnp.zeros(n), jnp.zeros(n)), jnp.zeros(4, jnp.float32), 48e3,
        512, backend="xla")
    hay = (jnp.zeros(1024), jnp.zeros(1024))
    with pytest.raises(ValueError, match="exclusion"):
        streaming_peak(nsp, hay, n, 512, num_peaks=3)


class TestFindPeaks:
    """Multi-emitter non-max-suppressed peak extraction."""

    def test_two_emitters(self):
        from caf_cookoff_tpu.models.filterbank import caf_surface
        from caf_cookoff_tpu.ops.peak import find_peaks

        rng = np.random.default_rng(8)
        fs, n = 48e3, 2048
        needle = (rng.standard_normal(n)
                  + 1j * rng.standard_normal(n)).astype(np.complex64)
        t = np.arange(n)
        hay = (needle * np.exp(2j * np.pi * 40.0 * t / fs)
               + 0.6 * np.roll(needle, 500)
               * np.exp(-2j * np.pi * 60.0 * t / fs)).astype(np.complex64)
        freqs = np.arange(-100.0, 100.0, 2.0, dtype=np.float32)
        surf = caf_surface(needle, hay, freqs, fs)
        # Exclusion must cover the resolution cell: doppler mainlobe is
        # +-fs/N ~ +-23 Hz = +-12 bins at this 2 Hz grid.
        pks = find_peaks(surf, num_peaks=2, exclude_freq=12,
                         exclude_lag=64)
        got = sorted((float(freqs[int(pks.freq_idx[i])]),
                      int(pks.lag_idx[i])) for i in range(2))
        assert got == [(-60.0, 500), (40.0, 0)]
        assert float(pks.value[0]) >= float(pks.value[1])

    def test_suppression_window(self):
        from caf_cookoff_tpu.ops.peak import find_peaks

        surf = np.zeros((8, 128), dtype=np.float32)
        surf[3, 50] = 10.0
        surf[3, 55] = 9.0   # inside the exclusion window
        surf[6, 100] = 8.0
        pks = find_peaks(surf, num_peaks=2, exclude_freq=1, exclude_lag=8)
        assert [int(f) for f in pks.freq_idx] == [3, 6]
        assert [int(t) for t in pks.lag_idx] == [50, 100]


def test_signed_lag_negative_regime():
    """Needle transmitted BEFORE the capture start (negative true lag):
    the circular peak index wraps near M; signed_lag recovers it — the
    regime the reference never handles (its lags are always positive)."""
    from caf_cookoff_tpu.models.filterbank import caf_peak, caf_surface
    from caf_cookoff_tpu.ops.peak import signed_lag
    import jax.numpy as jnp

    rng = np.random.default_rng(12)
    n, shift = 1024, 37  # haystack = needle advanced by 37 samples
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = np.zeros(n, dtype=np.complex64)
    hay[: n - shift] = needle[shift:]
    freqs = np.zeros(1, dtype=np.float32)
    _, raw_lag, _ = caf_peak(needle, hay, freqs, 48e3)
    m = 2 * n
    assert raw_lag == m - shift  # wrapped circular index
    assert int(signed_lag(jnp.asarray(raw_lag), m, n)) == -shift
