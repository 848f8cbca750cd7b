"""Second-order CAF: joint (rate, doppler, lag) search via a dechirp bank.

The reference's CAF model is strictly first-order — a constant
frequency offset (``caf_rust/src/caf/mod.rs:44-65``) — yet its own
generator synthesizes time-varying offsets by phase integration
(``utils/generate.py:10-20``).  An emitter with real doppler RATE
(accelerating platform) smears across the first-order surface: a sweep
of ``r`` Hz/s spreads the peak over ``r*T`` Hz of doppler bins and
suppresses it by ~``sinc``-like loss once ``r*T`` passes a bin.  The
refine-stage estimator (:func:`caf_cookoff_tpu.ops.refine.
refine_peak_rate`) recovers rates up to about one bin of drift; THIS
engine is the coarse search for everything beyond it.

TPU shape: the rate axis is a **dechirp bank** — pre-chirp the needle by
each candidate rate (one (R, N) phasor multiply, exact by shift
composition: a swept copy ``n[t]e^{j2pi f t + j pi r t^2}`` correlates
coherently with the ``r``-pre-chirped needle at offset ``f``) and run
the standard filterbank over the whole bank as one extra vmap axis.
One jitted program computes all R x K x M cells and reduces to the
(rate, freq, lag) argmax triple without materializing anything in HBM —
the doppler fan-out trick, applied twice.

Rate grid sizing: the rate resolution cell is ``~2/T^2`` (quadratic
phase of pi*r*t^2 reaching ~pi at the window edge); pick steps <= 1/T^2
for a contiguous search, like doppler steps <= fs/N.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from caf_cookoff_tpu.config import as_grid, default_backend, xcor_length
from caf_cookoff_tpu.models.filterbank import _peak_split_jit
from caf_cookoff_tpu.ops import splitfft


@functools.partial(
    jax.jit, static_argnames=("xcor_len", "backend"))
def _rate_bank_peak_jit(n_re, n_im, h_re, h_im, freqs_hz, rates, sample_rate,
                        xcor_len, backend):
    dtype = n_re.dtype
    fs = jnp.asarray(sample_rate, dtype)
    t = jnp.arange(n_re.shape[-1], dtype=dtype) / fs
    # Pre-chirp bank: n_r[t] = n[t] * e^{+j pi r t^2}  (R, N)
    ph = jnp.pi * rates[:, None] * (t * t)[None, :]
    c, s = jnp.cos(ph), jnp.sin(ph)
    nb_re = n_re[None, :] * c - n_im[None, :] * s
    nb_im = n_re[None, :] * s + n_im[None, :] * c

    peaks = jax.vmap(
        lambda nr, ni: _peak_split_jit.__wrapped__(
            nr, ni, h_re, h_im, freqs_hz, sample_rate, xcor_len, backend)
    )(nb_re, nb_im)                               # fields (R,)
    r_best = jnp.argmax(peaks.value)
    return (r_best.astype(jnp.int32), peaks.value[r_best],
            peaks.freq_idx[r_best], peaks.lag_idx[r_best])


def rate_caf_peak(needle, haystack, freqs_hz, rates_hz_per_s, sample_rate,
                  *, backend: Optional[str] = None
                  ) -> Tuple[float, float, int, float]:
    """(rate_hz_per_s, freq_hz, lag_idx, value): dechirp-bank CAF peak.

    ``rates_hz_per_s`` is the candidate rate grid (include 0.0 to keep
    unswept emitters detectable); frequency is reported at the WINDOW
    START (t = 0) convention, like :func:`refine_peak_rate`.  Chain
    with ``refine_peak_rate`` (bracket = one rate step) for continuous
    estimates.
    """
    backend = backend or default_backend()
    n_re, n_im = splitfft.split_array(needle)
    h_re, h_im = splitfft.split_array(haystack)
    freqs = as_grid(freqs_hz, dtype=n_re.dtype)
    rates = np.asarray(rates_hz_per_s, dtype=n_re.dtype).reshape(-1)
    r_idx, value, f_idx, lag_idx = _rate_bank_peak_jit(
        jnp.asarray(n_re), jnp.asarray(n_im), jnp.asarray(h_re),
        jnp.asarray(h_im), jnp.asarray(freqs), jnp.asarray(rates),
        float(sample_rate), xcor_length(n_re.shape[-1]), backend)
    return (float(rates[int(r_idx)]), float(freqs[int(f_idx)]),
            int(lag_idx), float(value))
