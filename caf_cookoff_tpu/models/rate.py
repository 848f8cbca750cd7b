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
    estimates.  The haystack is a needle-length window (the raw lag is
    a CIRCULAR xcor index — unwrap with :func:`caf_cookoff_tpu.ops.
    peak.unwrap_lag` before treating it as a capture offset); for
    captures longer than the needle use :func:`rate_overlap_save_peak`.
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


@functools.partial(
    jax.jit, static_argnames=("num_lags", "needle_len", "backend"))
def _rate_os_peak_jit(n_re, n_im, h_re, h_im, freqs_hz, rates, sample_rate,
                      num_lags, needle_len, backend):
    """Dechirp bank x overlap-save: scan over rates, each rate running
    the full block scan; memory stays O(K*M) — one pre-chirped needle
    spectrum bank live at a time, never (R, K, M)."""
    from caf_cookoff_tpu.models.overlap_save import (
        needle_spectra_conj,
        plan_blocks,
        streaming_peak,
    )

    dtype = n_re.dtype
    m, _, _ = plan_blocks(needle_len, num_lags)
    fs = jnp.asarray(sample_rate, dtype)
    t = jnp.arange(needle_len, dtype=dtype) / fs

    def step(best, xr):
        r_idx, r = xr
        ph = jnp.pi * r * (t * t)
        c, s = jnp.cos(ph), jnp.sin(ph)
        nb = (n_re * c - n_im * s, n_re * s + n_im * c)
        s_conj = needle_spectra_conj(nb, freqs_hz, sample_rate, m,
                                     backend)
        pk = streaming_peak(s_conj, (h_re, h_im), needle_len, num_lags,
                            backend=backend)
        b_ridx, b_val, b_f, b_lag = best
        take = pk.value > b_val  # strict: earlier (lower) rate wins ties
        return ((jnp.where(take, r_idx, b_ridx),
                 jnp.where(take, pk.value, b_val),
                 jnp.where(take, pk.freq_idx, b_f),
                 jnp.where(take, pk.lag_idx, b_lag)), None)

    num_rates = rates.shape[0]
    init = (jnp.asarray(0, jnp.int32), jnp.asarray(-jnp.inf, dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(0, jnp.int32))
    best, _ = jax.lax.scan(
        step, init, (jnp.arange(num_rates, dtype=jnp.int32), rates))
    return best


def rate_overlap_save_peak(needle, haystack, freqs_hz, rates_hz_per_s,
                           sample_rate, num_lags: Optional[int] = None,
                           *, backend: Optional[str] = None
                           ) -> Tuple[float, float, int, float]:
    """(rate_hz_per_s, freq_hz, lag_samples, value): joint
    (rate, doppler, lag) search over a LONG capture.

    Composes the dechirp bank with the overlap-save block scan: each
    candidate rate pre-chirps the needle (one (N,) phasor multiply),
    its shifted-spectrum bank streams over every lag of the capture,
    and the (rate, freq, lag) argmax reduces through the scans without
    materializing anything — the search the reference's generator
    implies but no engine anywhere provides (it synthesizes
    time-varying offsets, ``utils/generate.py:10-20``, and then
    truncates every capture to needle length).

    Physics note: an emitter swept at ``r`` Hz/s over CAPTURE time that
    starts at absolute lag ``tau`` presents a window-start frequency of
    ``f0 + r*tau/fs`` — size the doppler grid to cover that range, not
    just ``f0`` (the returned frequency uses the same window-start
    convention as :func:`caf_cookoff_tpu.ops.refine.refine_peak_rate`,
    so chaining refinement needs no conversion).  The returned lag is
    an absolute capture offset (no circular wrap — overlap-save lags
    are linear).
    """
    backend = backend or default_backend()
    n_re, n_im = splitfft.split_array(needle)
    h_re, h_im = splitfft.split_array(haystack)
    n = n_re.shape[-1]
    if h_re.shape[-1] < n:
        raise ValueError(
            f"haystack ({h_re.shape[-1]}) shorter than needle ({n})")
    lags = num_lags or h_re.shape[-1] - n + 1
    freqs = as_grid(freqs_hz, dtype=n_re.dtype)
    rates = np.asarray(rates_hz_per_s, dtype=n_re.dtype).reshape(-1)
    r_idx, value, f_idx, lag_idx = _rate_os_peak_jit(
        jnp.asarray(n_re), jnp.asarray(n_im), jnp.asarray(h_re),
        jnp.asarray(h_im), jnp.asarray(freqs), jnp.asarray(rates),
        float(sample_rate), lags, n, backend)
    return (float(rates[int(r_idx)]), float(freqs[int(f_idx)]),
            int(lag_idx), float(value))
