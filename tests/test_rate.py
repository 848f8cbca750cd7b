"""Second-order CAF: the dechirp-bank coarse engine (models/rate.py)
chained into the joint (freq, rate, lag) refine.

The reference's model is strictly first-order; a hard sweep (rate*T
many doppler bins) smears its surface peak.  These tests pin that the
dechirp bank recovers such an emitter coherently, that the unswept case
still routes to rate 0, and that chaining into refine_peak_rate with
the bank's answer yields continuous estimates.
"""

import numpy as np

from caf_cookoff_tpu.models.filterbank import caf_peak
from caf_cookoff_tpu.models.rate import rate_caf_peak
from caf_cookoff_tpu.ops.refine import refine_peak_rate

FS = 48_000.0


def _swept_pair(f0, rate, lag, n=4096, seed=3):
    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t_sec = np.arange(n) / FS
    hay = (1e-4 * (rng.standard_normal(n)
                   + 1j * rng.standard_normal(n))).astype(np.complex64)
    cp = (needle * np.exp(2j * np.pi * f0 * t_sec
                          + 1j * np.pi * rate * t_sec ** 2)
          ).astype(np.complex64)
    hay[lag:] += cp[: n - lag]
    return needle, hay


def test_rate_bank_recovers_hard_sweep():
    """412 Hz/s over an 85 ms window = ~70 doppler bins of smear: the
    first-order peak degrades; the dechirp bank recovers (r, f, lag)
    coherently with a visibly larger peak value."""
    f0, rate_true, lag = 20.0, 412.34, 137
    needle, hay = _swept_pair(f0, rate_true, lag)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    _, _, v1 = caf_peak(needle, hay, freqs, FS, backend="xla")
    rates = np.arange(-600.0, 601.0, 100.0)
    r_hat, f_hat, lag_hat, v = rate_caf_peak(needle, hay, freqs, rates,
                                             FS, backend="xla")
    assert lag_hat == lag
    assert abs(r_hat - rate_true) <= 100.0       # within one grid step
    assert abs(f_hat - f0) <= 1.0
    assert v > 1.3 * v1                           # coherent vs smeared


def test_rate_bank_zero_rate_emitter():
    """An unswept emitter routes to the r=0 bank entry and matches the
    first-order answer exactly."""
    f0, lag = -41.5, 70
    needle, hay = _swept_pair(f0, 0.0, lag)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    want = caf_peak(needle, hay, freqs, FS, backend="xla")
    rates = np.arange(-600.0, 601.0, 100.0)
    r_hat, f_hat, lag_hat, _ = rate_caf_peak(needle, hay, freqs, rates,
                                             FS, backend="xla")
    assert r_hat == 0.0
    assert (f_hat, lag_hat) == want[:2]


def test_rate_bank_chained_refine():
    """bank coarse -> refine_peak_rate(rate0=bank answer) recovers the
    sweep continuously."""
    f0, rate_true, lag = 20.0, 412.34, 137
    needle, hay = _swept_pair(f0, rate_true, lag)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    rates = np.arange(-600.0, 601.0, 100.0)
    r_hat, f_hat, lag_hat, _ = rate_caf_peak(needle, hay, freqs, rates,
                                             FS, backend="xla")
    f2, r2, t2, _ = refine_peak_rate(
        needle, hay, f_hat, lag_hat, FS, rate0_hz_per_s=r_hat,
        max_rate_hz_per_s=100.0, coarse_step_hz=0.5, backend="xla")
    assert abs(f2 - f0) <= 0.02
    assert abs(r2 - rate_true) <= 0.5
    assert abs(t2 - lag) <= 0.01
