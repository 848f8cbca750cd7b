"""Peak extraction over the delay x doppler surface.

The reference computes a per-row (argmax, max) fused into the surface build
(``caf_rust/src/caf/mod.rs:91-102``) and then a linear scan over rows for
the global peak (``find_peak``, ``mod.rs:31-42``). Here both levels are one
XLA reduction; a signed-lag helper handles the 2N circular wrap that the
reference never hits (its haystack is truncated to needle length, so all
true lags are positive).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class CafPeak(NamedTuple):
    """Result triple: surface value, frequency-bin index, lag index."""

    value: jax.Array      # f32/f64 peak magnitude-squared
    freq_idx: jax.Array   # i32 row (doppler bin)
    lag_idx: jax.Array    # i32 raw column (circular lag index)


def find_peak_2d(surface: jax.Array) -> CafPeak:
    """Global argmax over a (K, M) real surface → (value, k, tau)."""
    k, m = surface.shape[-2], surface.shape[-1]
    flat_idx = jnp.argmax(surface.reshape(*surface.shape[:-2], k * m), axis=-1)
    value = jnp.max(surface, axis=(-2, -1))
    return CafPeak(
        value=value,
        freq_idx=(flat_idx // m).astype(jnp.int32),
        lag_idx=(flat_idx % m).astype(jnp.int32),
    )


def surface_peak(rows_complex: jax.Array) -> CafPeak:
    """Fused |.|^2 + argmax over complex xcor rows without storing |.|^2.

    XLA fuses the magnitude-squared into the reduction, so the f32 surface
    is never written to HBM — the analog of the reference's fused
    mag2+argmax inner loop (``caf_rust/src/caf/mod.rs:94-102``) but across
    the whole surface at once.
    """
    mag2 = (rows_complex.real * rows_complex.real
            + rows_complex.imag * rows_complex.imag)
    return find_peak_2d(mag2)


def signed_lag(lag_idx: jax.Array, xcor_len: int, needle_len: int) -> jax.Array:
    """Convert a raw circular lag index into a signed sample lag.

    Indices in ``[0, needle_len)`` are positive lags (the reference's only
    regime, ``caf_rust/tests/test.rs:29-30`` asserts raw index == lag);
    indices near ``xcor_len`` wrap to negative lags.
    """
    lag = lag_idx.astype(jnp.int32)
    return jnp.where(lag >= xcor_len - needle_len, lag - xcor_len, lag)


def grid_frequency(freq_idx: jax.Array, freqs_hz: jax.Array) -> jax.Array:
    """Look up the physical frequency of a doppler-bin index."""
    return jnp.take(freqs_hz, freq_idx, axis=-1)


def _lag_distance(a, b, lag_period: Optional[int]):
    """|a - b|, circularly when ``lag_period`` is set (equal-length
    engines: the lag axis is a CIRCULAR xcor index, so a peak near lag
    0 and its own wrap-around mainlobe skirt near ``m - 1`` are one
    resolution cell apart, not ``m - 1`` apart)."""
    d = jnp.abs(a - b)
    if lag_period is None:
        return d
    return jnp.minimum(d, lag_period - d)


def find_peaks(surface, num_peaks: int, exclude_freq: int,
               exclude_lag: int, lag_period: Optional[int] = None):
    """Top-``num_peaks`` surface peaks with non-maximum suppression.

    Multi-emitter extraction (a capability past the reference, which
    only ever reports the single global argmax): iteratively take the
    global peak, then mask a ``(2*exclude_freq+1) x (2*exclude_lag+1)``
    exclusion window around it so sidelobes and the mainlobe skirt do
    not re-detect.  The exclusion windows are REQUIRED — size them to
    the waveform's resolution cell via :func:`resolution_cell` /
    :func:`resolve_exclusions` (the doppler mainlobe spans ~``fs/N`` Hz
    in bins of your grid, the lag mainlobe ~``fs/bandwidth`` samples; a
    hardcoded default would be unrelated to your waveform).  Returns a
    :class:`CafPeak` whose fields are ``(num_peaks,)`` arrays,
    strongest first.  Jit-compatible (``num_peaks`` static).

    ``lag_period``: set to the surface's lag-axis length for CIRCULAR
    xcor surfaces (equal-length pairs) so a peak's wrap-around skirt
    cannot claim a slot (see :func:`_lag_distance`); linear
    (overlap-save) surfaces leave it ``None``.
    """
    surface = jnp.asarray(surface)
    k, m = surface.shape
    ki = jax.lax.broadcasted_iota(jnp.int32, (k, m), 0)
    ti = jax.lax.broadcasted_iota(jnp.int32, (k, m), 1)

    def step(surf, _):
        pk = find_peak_2d(surf)
        inside = ((jnp.abs(ki - pk.freq_idx) <= exclude_freq)
                  & (_lag_distance(ti, pk.lag_idx, lag_period)
                     <= exclude_lag))
        return jnp.where(inside, -jnp.inf, surf), pk

    _, peaks = jax.lax.scan(step, surface, None, length=num_peaks)
    return peaks


def topk_separated(values: jax.Array, k: int, sep) -> jax.Array:
    """Indices of the top-``k`` entries of a 1-D score vector with a
    minimum index separation ``sep`` between picks (greedy 1-D NMS).

    ``sep`` may be traced (e.g. a mainlobe width derived from a traced
    grid step), ``k`` is static.  If fewer than ``k`` separated entries
    exist above ``-inf``, the surplus slots repeat whatever argmax of
    an all-``-inf`` vector returns — harmless for re-score consumers
    (duplicate candidates re-score to duplicate rows).
    """
    idxs = jnp.arange(values.shape[-1])
    sep = jnp.asarray(sep)

    def step(vals, _):
        i = jnp.argmax(vals)
        masked = jnp.where(jnp.abs(idxs - i) <= sep, -jnp.inf, vals)
        return masked, i.astype(jnp.int32)

    _, cand = jax.lax.scan(step, values, None, length=k)
    return cand


def doppler_cell_bins(freqs_hz: jax.Array, needle_len: int,
                      sample_rate) -> jax.Array:
    """Doppler mainlobe width (fs/N Hz) in bins of a traced grid —
    the in-trace counterpart of :func:`resolution_cell`'s first field
    (at least 1)."""
    dtype = freqs_hz.dtype
    k = freqs_hz.shape[-1]
    step = jnp.abs(freqs_hz[min(1, k - 1)] - freqs_hz[0])
    step = jnp.maximum(step, jnp.asarray(1e-30, dtype))
    cell = jnp.asarray(sample_rate, dtype) / needle_len
    # Cap at the grid size BEFORE the int cast: a single-frequency grid
    # (k=1) has step=0 -> cell/step ~1e32, which would overflow int32
    # into an implementation-defined separation; a window wider than
    # the grid itself is meaningless anyway.
    return jnp.clip(jnp.ceil(cell / step), 1.0, float(k)).astype(jnp.int32)


def resolution_cell(needle, freqs_hz, sample_rate) -> Tuple[int, int]:
    """Derive NMS exclusion windows from the waveform's resolution cell.

    ``(exclude_freq_bins, exclude_lag_samples)`` sized to the CAF
    mainlobe, so two emitters one resolution cell apart survive NMS
    while one emitter's skirt cannot re-detect:

    * doppler: coherent integration over ``N/fs`` seconds puts the
      mainlobe's first null at ``fs/N`` Hz from the peak — converted to
      bins of the CALLER'S grid (a 0.05 Hz grid gets a proportionally
      wider bin window than a 0.5 Hz grid, fixing the hardcoded-window
      trap where fine grids re-detect the skirt).
    * lag: the correlation mainlobe of a band-limited waveform spans
      ``~fs/B`` samples, with ``B`` the occupied (−20 dB) two-sided
      bandwidth measured from the needle's own spectrum.

    Host-side (numpy): the results are static ints that specialize the
    jitted NMS programs.  The reference has no multi-peak notion at all
    (global argmax only, ``caf_rust/src/caf/mod.rs:31-42``).
    """
    x = np.asarray(needle)
    n = x.shape[-1]
    fs = float(sample_rate)
    freqs = np.asarray(freqs_hz, dtype=np.float64).reshape(-1)
    step = float(np.min(np.abs(np.diff(freqs)))) if freqs.size > 1 \
        else fs / n
    exclude_freq = max(1, int(np.ceil((fs / n) / max(step, 1e-30))))
    psd = np.abs(np.fft.fft(x.astype(np.complex128))) ** 2
    occupied = int(np.count_nonzero(psd > psd.max() * 1e-2))
    bandwidth = max(occupied, 1) * fs / n
    exclude_lag = max(1, int(np.ceil(fs / bandwidth)))
    return exclude_freq, exclude_lag


def resolve_exclusions(needle, freqs_hz, sample_rate,
                       exclude_freq: Optional[int],
                       exclude_lag: Optional[int]) -> Tuple[int, int]:
    """Fill unset NMS exclusion windows from :func:`resolution_cell`
    (the shared default of every multi-peak entry point)."""
    if exclude_freq is None or exclude_lag is None:
        auto_f, auto_l = resolution_cell(needle, freqs_hz, sample_rate)
        exclude_freq = auto_f if exclude_freq is None else exclude_freq
        exclude_lag = auto_l if exclude_lag is None else exclude_lag
    return int(exclude_freq), int(exclude_lag)


def unwrap_lag(raw_lag: int, xcor_len: int, needle_len: int) -> int:
    """Host-side :func:`signed_lag`: convert a raw circular xcor column
    into a signed sample lag (wrap region → negative)."""
    raw_lag = int(raw_lag)
    return raw_lag - xcor_len if raw_lag >= xcor_len - needle_len \
        else raw_lag


def detection_threshold_db(num_cells: int,
                           false_alarm: float = 1e-3) -> float:
    """SNR threshold (dB over the mean surface floor) for a stated
    per-search false-alarm probability.

    Noise-only mag^2 cells of an FFT cross-correlation surface are
    (approximately iid) exponential — each is the squared magnitude of
    a complex-Gaussian sum — so the chance that ANY of ``num_cells``
    cells exceeds ``T x mean`` is ``~ num_cells * e^-T``.  Solving for
    the stated ``false_alarm`` gives ``T = ln(num_cells/false_alarm)``.
    The reference has no detection decision at all (it reports the
    argmax unconditionally, ``caf_rust/src/caf/mod.rs:31-42``); this is
    what turns lattice slots into detections.
    """
    n = max(int(num_cells), 2)
    return 10.0 * float(np.log10(np.log(n / float(false_alarm))))


def apply_detection_threshold(values: np.ndarray, floor,
                              num_cells: int,
                              min_snr_db) -> Tuple[np.ndarray, np.ndarray,
                                                   float]:
    """Convert lattice slots into detections (host-side post-pass).

    ``values`` are lattice peak mag^2 (empty slots ``-inf``); ``floor``
    is the surface's mean mag^2 over all searched cells — a scalar, or
    an array broadcastable against ``values`` (batched engines carry
    one floor per pair).  Returns ``(values_masked, snr_db,
    threshold_db)``: per-slot peak-to-floor in dB, with slots below the
    threshold masked to ``-inf`` (SNR is monotone in value at a common
    floor, so masking is always a suffix of the strongest-first
    lattice).  ``min_snr_db`` is a float, or ``"auto"`` to derive
    :func:`detection_threshold_db` from the searched cell count at the
    default false-alarm rate, or ``None`` to disable masking (SNRs
    still returned).
    """
    values = np.asarray(values, np.float64)
    floor = np.maximum(np.asarray(floor, np.float64), 1e-300)
    if floor.ndim and floor.ndim < values.ndim:
        floor = floor.reshape(floor.shape + (1,) * (values.ndim
                                                    - floor.ndim))
    with np.errstate(divide="ignore", invalid="ignore"):
        snr = 10.0 * np.log10(
            np.where(values > 0, values, np.nan) / floor)
    snr = np.where(np.isfinite(values) & (values > 0), snr, -np.inf)
    if min_snr_db is None:
        return values, snr, float("-inf")
    thresh = (detection_threshold_db(num_cells)
              if isinstance(min_snr_db, str) and min_snr_db == "auto"
              else float(min_snr_db))
    keep = snr >= thresh
    return np.where(keep, values, -np.inf), snr, thresh


def concat_peaks(a: CafPeak, b: CafPeak) -> CafPeak:
    """Concatenate two candidate lattices along the candidate axis."""
    return CafPeak(jnp.concatenate([a.value, b.value]),
                   jnp.concatenate([a.freq_idx, b.freq_idx]),
                   jnp.concatenate([a.lag_idx, b.lag_idx]))


def as_lattice(pk: CafPeak) -> CafPeak:
    """Lift a scalar-field single-peak result to a (1,)-slot lattice.

    The ``num_peaks == 1`` fast path of the streaming scans returns
    scalar fields (no NMS carry); lattice consumers (concat + merge,
    collective gathers) need a trailing candidate axis — every lattice
    engine routes its P == 1 case through this so ``num_peaks=1`` is a
    valid degenerate lattice instead of a trace-time shape error.
    """
    return CafPeak(jnp.atleast_1d(pk.value),
                   jnp.atleast_1d(pk.freq_idx),
                   jnp.atleast_1d(pk.lag_idx))


def merge_peaks(candidates: CafPeak, num_peaks: int, exclude_freq: int,
                exclude_lag: int, return_indices: bool = False,
                lag_period: Optional[int] = None):
    """Greedy NMS merge of ``C`` candidate triples → top-``num_peaks``.

    The jit-compatible reduction primitive behind every multi-emitter
    path: block-local lattices (overlap-save scan carries), chunk
    lattices (streaming), and all_gather-ed shard lattices (collective
    peak reduction) all funnel through this.  Candidates whose value is
    ``-inf`` are empty slots and can neither win nor suppress.  Order is
    deterministic: value descending, then (freq_idx, lag_idx) row-major
    — matching the serial-scan tie-break of the single-peak reduction.
    Fields of the result are ``(num_peaks,)``; unfilled slots carry
    ``-inf`` / index 0.

    ``return_indices=True`` additionally returns the ``(num_peaks,)``
    positions of the selected entries in the ORIGINAL candidate order
    (0 for unfilled slots) so callers can gather per-candidate payloads
    (e.g. the stein stream's carried re-score windows) alongside.

    ``lag_period``: circular lag distance for equal-length (circular
    xcor) lattices — see :func:`_lag_distance`.
    """
    v = jnp.asarray(candidates.value)
    f = candidates.freq_idx.astype(jnp.int32)
    lg = candidates.lag_idx.astype(jnp.int32)
    c = v.shape[-1]
    if c < num_peaks:
        pad = num_peaks - c
        v = jnp.concatenate([v, jnp.full(pad, -jnp.inf, v.dtype)])
        f = jnp.concatenate([f, jnp.zeros(pad, jnp.int32)])
        lg = jnp.concatenate([lg, jnp.zeros(pad, jnp.int32)])
        c = num_peaks
    order = jnp.lexsort((lg, f, -v)).astype(jnp.int32)
    v, f, lg = v[order], f[order], lg[order]
    valid = v > -jnp.inf
    close = ((jnp.abs(f[:, None] - f[None, :]) <= exclude_freq)
             & (_lag_distance(lg[:, None], lg[None, :], lag_period)
                <= exclude_lag))
    pos = jnp.arange(c)

    def step(kept, i):
        suppressed = jnp.any(kept & close[:, i] & (pos < i))
        return kept.at[i].set(valid[i] & ~suppressed), None

    # All-False init derived from the traced values so it inherits
    # their varying-manual-axes under shard_map (a plain zeros(bool)
    # carry would not match the body output's vma).
    kept, _ = jax.lax.scan(step, v > jnp.inf, pos)
    # Kept candidates, in (already value-sorted) order, first P slots.
    sel = jnp.argsort(jnp.where(kept, pos, c))[:num_peaks]
    filled = jnp.arange(num_peaks) < jnp.sum(kept)
    out = CafPeak(
        value=jnp.where(filled, v[sel], -jnp.inf),
        freq_idx=jnp.where(filled, f[sel], 0).astype(jnp.int32),
        lag_idx=jnp.where(filled, lg[sel], 0).astype(jnp.int32),
    )
    if return_indices:
        orig = jnp.where(filled, order[sel], 0).astype(jnp.int32)
        return out, orig
    return out


# interpolate_peak (parabolic sub-bin estimate) was deprecated in round 4
# and removed in round 5 as promised: use ops.refine.refine_peak — the
# jit/vmap-safe zoom re-score, ~100x more accurate on the golden fixtures.
