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
from caf_cookoff_tpu.ops.peak import as_lattice, resolve_exclusions


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


def _merge_rate_lattice(v, key, lag, ridx, fws, rvals, num_peaks,
                        exclude_freq, exclude_lag, half_t_bins):
    """Greedy NMS over (center-freq key, lag) with a RATE-AWARE window.

    Cross-rate physics: an emitter swept at true rate ``r`` appears at
    every trial dechirp rate ``r'`` with the SAME window-center
    frequency ``f0 + r*T/2`` (dechirping tilts the instantaneous-
    frequency slope but preserves the window mean), smeared over a
    residual-chirp ridge of half-extent ``|r - r'| * T / 2`` Hz around
    that center.  So candidates from different trial rates are merged
    in center-frequency space (``key``), and the suppression window
    between two candidates widens by their rate distance's ridge
    extent: a ridge SUB-peak of a mismatched rate may sit anywhere
    within its half-extent of the common center, and the matched-rate
    top entry's widened window covers exactly that span — a strong
    emitter's rate sidelobes cannot claim lattice slots and displace a
    weaker real emitter.  Same deterministic order and
    suppressed-cannot-suppress semantics as :func:`caf_cookoff_tpu.
    ops.peak.merge_peaks`; ``ridx``/``fws``/``rvals`` are per-candidate
    payloads (trial-rate index, window-start freq bin, physical rate)
    permuted alongside.
    """
    c = v.shape[0]
    order = jnp.lexsort((lag, key, -v)).astype(jnp.int32)
    v, key, lag = v[order], key[order], lag[order]
    ridx, fws, rvals = ridx[order], fws[order], rvals[order]
    valid = v > -jnp.inf
    ridge = jnp.ceil(jnp.abs(rvals[:, None] - rvals[None, :])
                     * half_t_bins).astype(jnp.int32)
    # Cross-rate pairs get one EXTRA exclusion cell beyond the ridge
    # half-extent: the ridge edge is convolved with the window's sinc,
    # so its skirt/first sidelobe peaks up to ~1.5 resolution cells
    # past the nominal extent (measured: a +1-step trial-rate ghost at
    # 0.5 bins past ridge+1 cell).  Same-rate pairs (ridge == 0) keep
    # the exact resolution cell so two same-rate emitters one cell
    # apart still resolve, matching the first-order lattice contract.
    margin = jnp.where(ridge > 0, exclude_freq, 0)
    close = ((jnp.abs(key[:, None] - key[None, :])
              <= exclude_freq + ridge + margin)
             & (jnp.abs(lag[:, None] - lag[None, :]) <= exclude_lag))
    pos = jnp.arange(c)

    def step(kept, i):
        suppressed = jnp.any(kept & close[:, i] & (pos < i))
        return kept.at[i].set(valid[i] & ~suppressed), None

    kept, _ = jax.lax.scan(step, v > jnp.inf, pos)
    sel = jnp.argsort(jnp.where(kept, pos, c))[:num_peaks]
    filled = jnp.arange(num_peaks) < jnp.sum(kept)
    return (jnp.where(filled, v[sel], -jnp.inf),
            jnp.where(filled, key[sel], 0).astype(jnp.int32),
            jnp.where(filled, lag[sel], 0).astype(jnp.int32),
            jnp.where(filled, ridx[sel], 0).astype(jnp.int32),
            jnp.where(filled, fws[sel], 0).astype(jnp.int32),
            jnp.where(filled, rvals[sel], 0.0))


def _rate_grid_half_t_bins(freqs_np, needle_len: int,
                           sample_rate) -> float:
    """Host-side center-key factor ``T / (2*df)`` (grid bins per unit
    rate): ``key = f_ws_bin + round(r * half_t_bins)``.  Host-derived
    and STATIC so the single-chip and mesh engines (where shards may
    own pad-duplicated grid rows with a degenerate local step) agree
    bit-for-bit on every key and ridge window."""
    freqs_np = np.asarray(freqs_np, np.float64).reshape(-1)
    t_win = needle_len / float(sample_rate)
    if freqs_np.shape[0] > 1:
        df = float(np.min(np.abs(np.diff(freqs_np))))
    else:
        df = float(sample_rate) / needle_len
    return t_win / (2.0 * max(df, 1e-30))


@functools.partial(
    jax.jit, static_argnames=("num_lags", "needle_len", "backend",
                              "num_peaks", "exclude_freq", "exclude_lag",
                              "half_t_bins", "with_floor"))
def _rate_os_peaks_jit(n_re, n_im, h_re, h_im, freqs_hz, rates,
                       sample_rate, num_lags, needle_len, backend,
                       num_peaks, exclude_freq, exclude_lag,
                       half_t_bins, with_floor=False):
    """Dechirp bank x overlap-save LATTICE: scan over rates, each rate
    carrying a top-``num_peaks`` NMS lattice through the block scan,
    cross-rate-merged in center-frequency space (memory stays O(K*M) +
    the (P,) lattice — never (R, K, M))."""
    from caf_cookoff_tpu.models.overlap_save import (
        needle_spectra_conj,
        plan_blocks,
        streaming_peak,
    )

    dtype = n_re.dtype
    m, _, _ = plan_blocks(needle_len, num_lags)
    fs = jnp.asarray(sample_rate, dtype)
    t = jnp.arange(needle_len, dtype=dtype) / fs
    half_t_bins = jnp.asarray(half_t_bins, dtype)
    p = num_peaks

    def step(carry, xr):
        lat, fsum, fcnt = carry
        vals, keys, lags_c, ridx_c, fws_c, rvl_c = lat
        r_idx, r = xr
        ph = jnp.pi * r * (t * t)
        c, s = jnp.cos(ph), jnp.sin(ph)
        nb = (n_re * c - n_im * s, n_re * s + n_im * c)
        s_conj = needle_spectra_conj(nb, freqs_hz, sample_rate, m,
                                     backend)
        out = streaming_peak(s_conj, (h_re, h_im), needle_len, num_lags,
                             backend=backend, num_peaks=p,
                             exclude_freq=exclude_freq,
                             exclude_lag=exclude_lag,
                             with_floor=with_floor)
        if with_floor:
            pk, fsum_b, fcnt_b = out
            fsum = fsum + fsum_b
            fcnt = fcnt + fcnt_b
        else:
            pk = out
        if p == 1:
            pk = as_lattice(pk)
        off = jnp.round(r * half_t_bins).astype(jnp.int32)
        merged = _merge_rate_lattice(
            jnp.concatenate([vals, pk.value]),
            jnp.concatenate([keys, pk.freq_idx + off]),
            jnp.concatenate([lags_c, pk.lag_idx]),
            jnp.concatenate([ridx_c, jnp.full((p,), r_idx, jnp.int32)]),
            jnp.concatenate([fws_c, pk.freq_idx]),
            jnp.concatenate([rvl_c, jnp.full((p,), r, dtype)]),
            p, exclude_freq, exclude_lag, half_t_bins)
        return (merged, fsum, fcnt), None

    zero = jnp.zeros((), dtype)
    init_lat = (jnp.full((p,), -jnp.inf, dtype),
                jnp.zeros((p,), jnp.int32), jnp.zeros((p,), jnp.int32),
                jnp.zeros((p,), jnp.int32), jnp.zeros((p,), jnp.int32),
                jnp.zeros((p,), dtype))
    num_rates = rates.shape[0]
    (lat, fsum, fcnt), _ = jax.lax.scan(
        step, (init_lat, zero, zero),
        (jnp.arange(num_rates, dtype=jnp.int32), rates))
    return lat, fsum, fcnt


def rate_overlap_save_peaks(needle, haystack, freqs_hz, rates_hz_per_s,
                            sample_rate, num_peaks: int,
                            num_lags: Optional[int] = None, *,
                            exclude_freq: Optional[int] = None,
                            exclude_lag: Optional[int] = None,
                            backend: Optional[str] = None,
                            min_snr_db=None, with_snr: bool = False):
    """Top-``num_peaks`` ACCELERATING emitters of a long capture —
    multi-emitter + detection through the joint (rate, doppler, lag)
    search.

    Each trial rate runs the lattice-carrying overlap-save scan
    (:func:`caf_cookoff_tpu.models.overlap_save.streaming_peak` with
    ``num_peaks``); lattices merge across rates in window-CENTER
    frequency space with a rate-aware suppression window (see
    :func:`_merge_rate_lattice` — a strong emitter's residual-chirp
    ridge at mismatched trial rates deduplicates against its
    matched-rate peak instead of displacing weaker real emitters).
    The reference cannot do any of this: no rate model, no
    multi-emitter notion, no detection decision (argmax only,
    ``caf_rust/src/caf/mod.rs:31-42``), and every impl truncates the
    capture to needle length (``caf_go/main.go:20``).

    ``min_snr_db`` / ``with_snr`` apply the detection threshold over
    the full searched cell count ``R*K*num_lags`` (the floor is the
    mean mag^2 over every cell of every trial-rate surface,
    accumulated inside the scans).  Returns ``(rates (P,), freqs (P,),
    lags (P,), values (P,)[, snr_db (P,)])`` numpy arrays, strongest
    first; empty/sub-threshold slots carry ``value=-inf``.  Reported
    frequencies use the window-start convention, lags are absolute
    capture offsets — chain each row through :func:`caf_cookoff_tpu.
    ops.refine.refine_peak_rate` for continuous estimates.
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
    exclude_freq, exclude_lag = resolve_exclusions(
        needle, freqs, sample_rate, exclude_freq, exclude_lag)
    want_floor = with_snr or min_snr_db is not None
    lat, fsum, fcnt = _rate_os_peaks_jit(
        jnp.asarray(n_re), jnp.asarray(n_im), jnp.asarray(h_re),
        jnp.asarray(h_im), jnp.asarray(freqs), jnp.asarray(rates),
        float(sample_rate), lags, n, backend, int(num_peaks),
        exclude_freq, exclude_lag,
        _rate_grid_half_t_bins(freqs, n, sample_rate),
        with_floor=want_floor)
    vals, _keys, lag_idx, ridx, fws, _rv = (np.asarray(x) for x in lat)
    out_rates = rates.astype(np.float64)[ridx]
    out_freqs = np.asarray(freqs, np.float64)[fws]
    if not want_floor:
        return out_rates, out_freqs, lag_idx, vals
    from caf_cookoff_tpu.models.overlap_save import mean_floor
    from caf_cookoff_tpu.ops.peak import apply_detection_threshold

    floor = mean_floor(fsum, fcnt)
    num_cells = rates.shape[0] * freqs.shape[0] * lags
    vals, snr, _ = apply_detection_threshold(vals, floor, num_cells,
                                             min_snr_db)
    out = (out_rates, out_freqs, lag_idx, vals)
    return out + ((snr,) if with_snr else ())
