"""Batched Stein engine — one fused program for a (B, N) batch of pairs.

BASELINE config 2's workload (64 pairs x 400x8192 on one chip).  The
round-1 path walked ``lax.map`` over per-pair Stein programs — zero
batch amortization (0.060 ms/surface vs 0.054 single-surface).  This
engine restructures the whole batch around two MXU-shaped stages:

* **Stage A — segment correlations as a direct MXU dot.**  For needle
  blocks of length D, ``G[b, tau] = sum_d conj(n[bD+d]) * h[bD+d+tau]``
  is a D-tap cross-correlation — and at D = 64 direct evaluation
  (D MACs/lag) beats any FFT factorization (~(n1+n2) MACs/lag at
  M = 8192), so the FFTs of the single-pair engine (``models/stein.py``)
  disappear entirely.  Block ``b``'s correlations land at staircase
  column ``b*D + tau`` and the whole stage is one stacked dense
  (2B, 2*D) x (2*D, span) matmul against shifted-haystack Hankel rows.
  (An ``lax.conv`` formulation of the same math lowered pathologically
  on TPU — 53.6 ms for the 64-pair batch — hence the explicit
  operator.)

* **Stage B — fused kernel** (``ops/pallas_stein.fused_stein_rank``):
  one program per pair runs BOTH stages in VMEM — Hankel rows built
  from the ~100 KB haystack extension, the stage-A dot, staircase
  extraction, the two stacked synthesis matmuls, and the
  |.|^2 / per-bin-max epilogue.  Nothing pair-sized touches HBM; the
  (K, P*M) synthesized surface (~1.7 GB at config-2 shape) never
  exists.  On CPU the pure-XLA twin :func:`_coarse_rank_xla` runs the
  identical math (HBM-materialized) for tests.

* **Exactness — batched top-k re-score.**  The coarse pass (bf16 conv +
  bf16 synthesis + block-phase approximation) only RANKS bins; the top
  ``_REFINE_BINS`` per pair are re-scored with exact filterbank rows
  (vmapped), the same rank-then-score contract as every other engine.

Reference analog: the threadpool strategy saturating all cores on one
surface (``caf_rust/src/caf/mod.rs:388-462``) — here the batch axis is
what saturates the chip.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from caf_cookoff_tpu.config import (as_grid, default_backend, floor_pow2,
                                    xcor_length)
from caf_cookoff_tpu.errors import EligibilityError, SpanError
from caf_cookoff_tpu.models.filterbank import _surface_rows_split
from caf_cookoff_tpu.models.stein import _auto_block_len
from caf_cookoff_tpu.ops import splitfft
from caf_cookoff_tpu.ops.peak import (
    CafPeak,
    find_peak_2d,
    merge_peaks,
)
# The super-block width is the kernel's layout contract — one source.
from caf_cookoff_tpu.ops.pallas_stein import SUPER


def _pow2_block_len(sample_rate: float, freqs_hz: np.ndarray,
                    requested: int) -> int:
    """Largest power-of-two block length within the sinc-envelope limit
    (:func:`caf_cookoff_tpu.models.stein._auto_block_len`), capped at
    ``SUPER`` so SUPER-padded needles split into whole blocks."""
    d = floor_pow2(min(_auto_block_len(sample_rate, freqs_hz, requested),
                       SUPER))
    if d < 8:
        raise SpanError("block length below 8 after pow2 rounding")
    return d


def _needle_operator(ns_re, ns_im, d: int):
    """(P, 2B, 2*D) DENSE needle-tap operator for stage A.

    Row layout: rows [0, B) produce Re(G), rows [B, 2B) Im(G); columns
    [0, D) act on shifted-haystack real rows, [D, 2*D) on imaginary
    rows.  Block ``b``'s correlations land at staircase column
    ``b*D + tau`` (the per-block staircase — the kernel's un-shear
    handles the 64-aligned offsets; an earlier super-block layout
    zero-padded each row to 128 taps and paid 2x the stage-A MACs at
    D = 64).  Needles must already be padded to whole blocks.
    Returns ``(lmat, D)`` — the second element rides to the kernel's
    ``sup`` argument.
    """
    p, n_pad = ns_re.shape
    b = n_pad // d
    tr = ns_re.reshape(p, b, d)              # Re(conj n) = nr
    ti = (-ns_im).reshape(p, b, d)           # Im(conj n) = -ni
    # G = sum conj(n)*h: Gr = nr.hr + ni.hi = tr.hr + (-ti).hi;
    #                    Gi = nr.hi - ni.hr = ti.hr + tr.hi.
    top = jnp.concatenate([tr, -ti], axis=2)   # (P, B, 2*D) Gr rows
    bot = jnp.concatenate([ti, tr], axis=2)    # Gi rows
    return jnp.concatenate([top, bot], axis=1), d


def _haystack_extension(hs_re, hs_im, m: int, span: int):
    """(P, 2, span+SUPER-1) circularly-extended haystack planes.

    The M-point FFT correlation of the single-pair engine indexes h
    mod M (zeros in [N, M)); staircase column c reads samples
    [c, c+block_len), so the extension tiles the zero-padded period.
    Columns past the masked lag range are never consumed.  (The buffer
    keeps the kernel's span+SUPER-1 sizing contract even when
    block_len < SUPER.)
    """
    p, n_h = hs_re.shape
    need = span + SUPER - 1
    reps = -(-need // m)

    def circ(hp):
        base = jnp.concatenate(
            [hp, jnp.zeros((p, m - n_h), hp.dtype)], axis=-1)
        return jnp.tile(base, (1, reps))[:, :need]

    return jnp.stack([circ(hs_re), circ(hs_im)], axis=1)


_BIG_IDX = np.int32(2 ** 30)


def _coarse_rank_xla(ws1, ws2, lmat, h_ext, b: int, sup: int,
                     num_lags: int, num_valid=None, want_top2: bool = False,
                     sep: int = 0):
    """Pure-XLA twin of ops/pallas_stein.fused_stein_rank — the CPU
    (and numerical-reference) path: same math, same per-block staircase
    layout, materialized in HBM instead of VMEM.  ``num_valid`` is the
    kernel's per-program lag bound ((P,) int32 — see the shadowing
    note there).  ``want_top2`` mirrors the kernel's top-2-separated
    epilogue ((vals, idxs, vals2, idxs2), slot-2 sentinel ``-1.0``);
    computed globally here (no tile merge), so this twin is exact for
    same-bin pairs ``> sep`` apart where the kernel guarantees
    ``> 2*sep`` — a strict superset of the kernel's contract."""
    from caf_cookoff_tpu.ops.pallas_stein import FUSED_TILE

    span = h_ext.shape[-1] - (SUPER - 1)
    hank = jnp.concatenate([
        jnp.stack([h_ext[:, 0, e:e + span] for e in range(sup)], axis=1),
        jnp.stack([h_ext[:, 1, e:e + span] for e in range(sup)], axis=1),
    ], axis=1)                                        # (P, 2*sup, span)
    co = jnp.einsum("pbe,pes->pbs", lmat, hank)       # (P, 2B, span)
    m_pad = -(-num_lags // FUSED_TILE) * FUSED_TILE
    g_top = jnp.stack(
        [co[:, blk, blk * sup:blk * sup + m_pad] for blk in range(b)],
        axis=1)
    g_bot = jnp.stack(
        [co[:, b + blk, blk * sup:blk * sup + m_pad] for blk in range(b)],
        axis=1)
    g = jnp.concatenate([g_top, g_bot], axis=1)       # (P, 2B, m_pad)
    rr = jnp.einsum("kb,pbm->pkm", ws1, g)
    ri = jnp.einsum("kb,pbm->pkm", ws2, g)
    mag2 = rr * rr + ri * ri
    bound = (num_lags if num_valid is None
             else jnp.asarray(num_valid, jnp.int32)[:, None, None])
    mag2 = jnp.where(jnp.arange(m_pad)[None, None, :] < bound,
                     mag2, -1.0)
    if want_top2:
        lag = jnp.arange(m_pad, dtype=jnp.int32)
        m1 = jnp.max(mag2, axis=-1, keepdims=True)
        a1 = jnp.min(jnp.where(mag2 >= m1, lag, _BIG_IDX), axis=-1,
                     keepdims=True)
        masked = jnp.where(jnp.abs(lag - a1) <= sep, -1.0, mag2)
        m2 = jnp.max(masked, axis=-1, keepdims=True)
        a2 = jnp.min(jnp.where(masked >= m2, lag, _BIG_IDX), axis=-1,
                     keepdims=True)
        a1 = jnp.where(a1 == _BIG_IDX, 0, a1)
        a2 = jnp.where(a2 == _BIG_IDX, 0, a2)
        return (m1[..., 0].T, a1[..., 0].T.astype(jnp.int32),
                m2[..., 0].T, a2[..., 0].T.astype(jnp.int32))
    vals = jnp.max(mag2, axis=-1)                     # (P, K)
    idxs = jnp.argmax(mag2, axis=-1).astype(jnp.int32)
    return vals.T, idxs.T


def _batched_stein_core(ns_re, ns_im, hs_re, hs_im, freqs_hz,
                        sample_rate, xcor_len, block_len, backend,
                        refine: bool, interpret: bool):
    """Traceable batch pipeline (also the ``shard_map`` body of
    :func:`caf_cookoff_tpu.parallel.sharded_batched_stein_peak`)."""
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    b = ns_re.shape[-1] // block_len
    lmat, group = _needle_operator(ns_re, ns_im, block_len)
    span = fused_span(b, group, xcor_len)
    h_ext = _haystack_extension(hs_re, hs_im, xcor_len, span)
    ws1, ws2 = stein_synthesis_weights(freqs_hz, sample_rate, b, block_len)
    if interpret:
        # CPU path: the kernel's pure-XLA twin (HBM-materialized).
        vals, idxs = _coarse_rank_xla(ws1, ws2, lmat, h_ext, b, group,
                                      xcor_len)               # (K, P)
    else:
        vals, idxs = fused_stein_rank(ws1, ws2, lmat, h_ext, b, group,
                                      xcor_len,
                                      want_idxs=not refine)   # (K, P)
    vals_t = vals.T                                          # (P, K)
    if not refine:
        best = jnp.argmax(vals_t, axis=1)                    # (P,)
        take = lambda a: jnp.take_along_axis(
            a.T, best[:, None], axis=1)[:, 0]
        return CafPeak(value=take(vals),
                       freq_idx=best.astype(jnp.int32),
                       lag_idx=take(idxs).astype(jnp.int32))

    return _batched_refine(ns_re, ns_im, hs_re, hs_im, freqs_hz, vals_t,
                           sample_rate, xcor_len, backend)


def _batched_refine(ns_re, ns_im, hs_re, hs_im, freqs_all, vals_t,
                    sample_rate, xcor_len: int, backend: str,
                    num_valid=None) -> CafPeak:
    """Per-pair exact re-score of a (P, K) coarse ranking — shared by
    the plain and banded batch paths.  ``num_valid`` caps the candidate
    count so -inf padded bins never enter the re-score.  Candidates are
    the hybrid plain/mainlobe-separated set (``_refine_candidates``),
    so fine grids cover distinct lobes, not one skirt."""
    from caf_cookoff_tpu.models.stein import _refine_candidates

    cand = _refine_candidates(vals_t, freqs_all, ns_re.shape[-1],
                              sample_rate, num_valid)        # (P, r)

    def rescore(nr, ni, hr, hi, fsel):
        exact = splitfft.mag2(_surface_rows_split(
            (nr, ni), (hr, hi), fsel, sample_rate, xcor_len, backend))
        rowmax = jnp.max(exact, axis=-1)                     # (r,)
        return rowmax, jnp.argmax(exact, axis=-1).astype(jnp.int32)

    rowmax, lags = jax.vmap(rescore)(
        ns_re, ns_im, hs_re, hs_im, freqs_all[cand])         # (P, r) each

    def pick(rm, cd, lg):
        best = jnp.lexsort((cd.astype(jnp.int32), -rm))[0]
        return CafPeak(value=rm[best],
                       freq_idx=cd[best].astype(jnp.int32),
                       lag_idx=lg[best])

    return jax.vmap(pick)(rowmax, cand, lags)


_batched_stein_peak_jit = functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "refine",
                     "interpret"))(_batched_stein_core)


@functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "num_bins",
                     "interpret"))
def _banded_batched_jit(ns_re, ns_im, hs_re, hs_im, freqs_pad, centers,
                        rel, sample_rate, xcor_len, block_len, backend,
                        num_bins, interpret):
    """Wide-span batch: (pair, band) as the kernel's batch axis.

    Same construction as the single-pair banded path
    (models/stein.py:_banded_stein_peak_jit) with every pair's needle
    shifted to every band center; the exact per-pair re-score runs on
    absolute frequencies with the unshifted needles.
    """
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    p = ns_re.shape[0]
    s = centers.shape[0]
    sr, si = _shift_to_centers(ns_re, ns_im, centers, sample_rate)
    b = sr.shape[-1] // block_len
    lmat, group = _needle_operator(sr, si, block_len)
    span = fused_span(b, group, xcor_len)
    # ONE extension per pair: the kernel's share_h index map hands the
    # same slice to all of a pair's band programs (no x S HBM copies).
    h_ext = _haystack_extension(hs_re, hs_im, xcor_len, span)
    ws1, ws2 = stein_synthesis_weights(rel, sample_rate, b, block_len)
    if interpret:
        vals, _ = _coarse_rank_xla(ws1, ws2, lmat,
                                   jnp.repeat(h_ext, s, axis=0), b,
                                   group, xcor_len)          # (Kb, P*S)
    else:
        vals, _ = fused_stein_rank(ws1, ws2, lmat, h_ext, b, group,
                                   xcor_len, want_idxs=False,
                                   share_h=s)
    kb = rel.shape[0]
    flat = vals.T.reshape(p, s * kb)                # bin = s_idx*Kb + j
    flat = jnp.where(jnp.arange(s * kb)[None, :] < num_bins, flat,
                     -jnp.inf)
    return _batched_refine(ns_re, ns_im, hs_re, hs_im, freqs_pad, flat,
                           sample_rate, xcor_len, backend,
                           num_valid=num_bins)


def _shift_to_centers(ns_re, ns_im, centers, sample_rate):
    """(P*S, N_pad) needle planes shifted to every band center (exact —
    shift composition), padded to whole SUPER tiles, band-major."""
    p, n = ns_re.shape
    s = centers.shape[0]
    t = jnp.arange(n, dtype=ns_re.dtype)
    ph = ((2.0 * jnp.pi) / jnp.asarray(sample_rate, ns_re.dtype)
          ) * centers[None, :, None] * t[None, None, :]      # (1, S, n)
    cs, sn = jnp.cos(ph), jnp.sin(ph)
    sr = (ns_re[:, None, :] * cs - ns_im[:, None, :] * sn).reshape(
        p * s, n)
    si = (ns_re[:, None, :] * sn + ns_im[:, None, :] * cs).reshape(
        p * s, n)
    pad = (-n) % SUPER
    if pad:
        sr = jnp.pad(sr, ((0, 0), (0, pad)))
        si = jnp.pad(si, ((0, 0), (0, pad)))
    return sr, si


def _os_window_extensions(hs_re, hs_im, v: int, windows: int, span: int):
    """(P*W, 2, span+SUPER-1) linear (non-circular) per-window slices.

    Window ``w`` of a pair covers lags [w*V, w*V + V); its extension is
    the raw capture from sample ``w*V`` (correlations read real
    neighboring samples — overlap-save's implicit halo), zero-padded at
    the capture tail so trailing lags score 0 and never win.
    """
    p = hs_re.shape[0]
    need = (windows - 1) * v + span + SUPER - 1
    pad = need - hs_re.shape[-1]
    if pad > 0:
        hs_re = jnp.pad(hs_re, ((0, 0), (0, pad)))
        hs_im = jnp.pad(hs_im, ((0, 0), (0, pad)))
    win_len = span + SUPER - 1
    slices = [jnp.stack([hs_re[:, w * v:w * v + win_len],
                         hs_im[:, w * v:w * v + win_len]], axis=1)
              for w in range(windows)]                # each (P, 2, L)
    return jnp.stack(slices, axis=1).reshape(p * windows, 2, win_len)


@functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "windows",
                     "total_lags", "needle_len", "interpret"))
def _batched_stein_os_jit(ns_re, ns_im, hs_re, hs_im, freqs_hz,
                          sample_rate, xcor_len, block_len, backend,
                          windows: int, total_lags: int, needle_len: int,
                          interpret: bool):
    """Coarse windowed scan + on-device top-k exact refinement."""
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    p = ns_re.shape[0]
    b = ns_re.shape[-1] // block_len
    v = xcor_len                      # lags per window
    lmat, group = _needle_operator(ns_re, ns_im, block_len)
    span = fused_span(b, group, v)
    h_ext = _os_window_extensions(hs_re, hs_im, v, windows, span)
    ws1, ws2 = stein_synthesis_weights(freqs_hz, sample_rate, b,
                                       block_len)
    # Per-window scanned-lag bound: the final window's range may end
    # mid-window (num_lags cap), and real capture samples past it must
    # not shadow in-range peaks (per-bin max/argmax — see
    # fused_stein_rank's num_valid note).
    per_w = np.clip(total_lags - np.arange(windows) * v, 0, v)
    num_valid = jnp.asarray(np.tile(per_w, ns_re.shape[0]), jnp.int32)
    if interpret:
        lmat_rep = jnp.repeat(lmat, windows, axis=0)
        vals, idxs = _coarse_rank_xla(ws1, ws2, lmat_rep, h_ext, b,
                                      group, v, num_valid=num_valid)
    else:
        vals, idxs = fused_stein_rank(ws1, ws2, lmat, h_ext, b, group, v,
                                      windows=windows,
                                      num_valid=num_valid)
    k = freqs_hz.shape[0]
    vals = vals.reshape(k, p, windows)
    idxs = idxs.reshape(k, p, windows)
    glob = idxs + jnp.arange(windows, dtype=jnp.int32) * v
    valid = glob < total_lags
    vals = jnp.where(valid, vals, -1.0)
    # Per (bin, pair): best window -> per-pair coarse ranking over bins.
    wbest = jnp.argmax(vals, axis=-1)                    # (K, P)
    take_w = lambda a: jnp.take_along_axis(
        a, wbest[..., None], axis=-1)[..., 0]
    rowmax = take_w(vals).T                              # (P, K)
    rowlag = take_w(glob).T                              # (P, K)
    return _os_topk_refine(ns_re, ns_im, hs_re, hs_im, freqs_hz,
                           rowmax, rowlag, sample_rate, xcor_len,
                           backend, total_lags, needle_len)


def _os_topk_refine(ns_re, ns_im, hs_re, hs_im, freqs_all, rowmax,
                    rowlag, sample_rate, xcor_len: int, backend,
                    total_lags: int, needle_len: int,
                    num_valid_bins=None) -> CafPeak:
    """Windowed-coarse closer: per-pair top-k exact re-score of a
    (P, K) ranking whose per-bin best lags are ``rowlag``.

    Exact re-score happens on a guard-extended capture slice around
    each pair's coarse winning lag (the stein_overlap_save_peak refine
    contract), on-device via dynamic_slice — no host round-trip.
    ``num_valid_bins`` caps the candidate count when the ranking
    carries -inf padded bins (banded grids).  Candidates are the hybrid
    plain/mainlobe-separated set (``_refine_candidates``).
    """
    from caf_cookoff_tpu.models.stein import _refine_candidates

    cand = _refine_candidates(rowmax, freqs_all, needle_len,
                              sample_rate, num_valid_bins)   # (P, r)
    best_bin = jnp.argmax(rowmax, axis=-1)               # (P,)
    best_lag = jnp.take_along_axis(rowlag, best_bin[:, None],
                                   axis=1)[:, 0]         # (P,)
    # Slice a guard-extended window (based on the ORIGINAL needle
    # length — ns planes may carry SUPER padding): the winning local
    # lag (~``guard``) then correlates every needle sample against
    # real data; an n-sample window would truncate the last ``guard``
    # products to zeros and bias the reported value low.  The near-tie
    # guard must stay well under the needle length or the window
    # shifts off the emitter entirely.
    n = needle_len
    hay_len = hs_re.shape[-1]
    guard = min(64, n // 4, max((hay_len - n) // 2, 0))
    win = n + 2 * guard
    start = jnp.clip(best_lag - guard, 0, max(hay_len - win, 0))
    # Only local lags with full correlation energy may win, and the
    # absolute lag must stay inside the requested range.
    local = jnp.arange(xcor_len, dtype=jnp.int32)

    def rescore(nr, ni, hr, hi, s, fsel):
        wr = jax.lax.dynamic_slice(hr, (s,), (win,))
        wi = jax.lax.dynamic_slice(hi, (s,), (win,))
        exact = splitfft.mag2(_surface_rows_split(
            (nr, ni), (wr, wi), fsel, sample_rate, xcor_len, backend))
        ok = (local <= 2 * guard) & (s + local < total_lags)
        exact = jnp.where(ok[None, :], exact, -1.0)
        return jnp.max(exact, axis=-1), jnp.argmax(
            exact, axis=-1).astype(jnp.int32)

    rowmax_e, lag_e = jax.vmap(rescore)(
        ns_re, ns_im, hs_re, hs_im, start, freqs_all[cand])  # (P, r)

    def pick(rm, cd, lg, s):
        best = jnp.lexsort((cd.astype(jnp.int32), -rm))[0]
        return CafPeak(value=rm[best],
                       freq_idx=cd[best].astype(jnp.int32),
                       lag_idx=(s + lg[best]).astype(jnp.int32))

    return jax.vmap(pick)(rowmax_e, cand, lag_e, start)


@functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "windows",
                     "total_lags", "needle_len", "num_bins", "interpret"))
def _banded_stein_os_jit(ns_re, ns_im, hs_re, hs_im, freqs_pad, centers,
                         rel, sample_rate, xcor_len, block_len, backend,
                         windows: int, total_lags: int, needle_len: int,
                         num_bins: int, interpret: bool):
    """Banded long-capture coarse scan: (pair, band, window) programs.

    The windows x share_h composition of the fused kernel: each pair
    contributes one needle operator per band (needle shifted to the
    band center) and one haystack extension per overlap-save window —
    S*W programs per pair, every one a full-size MXU workload.  For
    fine uniform grids this beats the unbanded windowed engine by
    design: the block length rises from the envelope-limited
    ``fs/(4*f_max)`` to ``min(128, sqrt(fs/2g))`` (see
    models/stein._plan_bands), cutting the dominant synthesis term
    K*B*M by the same factor.  Exact per-pair re-score on absolute
    frequencies with the unshifted needles.
    """
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    p = ns_re.shape[0]
    s = centers.shape[0]
    v = xcor_len
    sr, si = _shift_to_centers(ns_re, ns_im, centers, sample_rate)
    b = sr.shape[-1] // block_len
    lmat, sup = _needle_operator(sr, si, block_len)
    span = fused_span(b, sup, v)
    h_ext = _os_window_extensions(hs_re, hs_im, v, windows, span)
    ws1, ws2 = stein_synthesis_weights(rel, sample_rate, b, block_len)
    per_w = np.clip(total_lags - np.arange(windows) * v, 0, v)
    num_valid = jnp.asarray(np.tile(per_w, p * s), jnp.int32)
    if interpret:
        lmat_rep = jnp.repeat(lmat, windows, axis=0)
        l = h_ext.shape[-1]
        h_rep = jnp.broadcast_to(
            h_ext.reshape(p, 1, windows, 2, l),
            (p, s, windows, 2, l)).reshape(p * s * windows, 2, l)
        vals, idxs = _coarse_rank_xla(ws1, ws2, lmat_rep, h_rep, b, sup,
                                      v, num_valid=num_valid)
    else:
        vals, idxs = fused_stein_rank(ws1, ws2, lmat, h_ext, b, sup, v,
                                      windows=windows, share_h=s,
                                      num_valid=num_valid)
    kb = rel.shape[0]
    vals = vals.reshape(kb, p, s, windows)
    idxs = idxs.reshape(kb, p, s, windows)
    glob = idxs + jnp.arange(windows, dtype=jnp.int32) * v
    vals = jnp.where(glob < total_lags, vals, -1.0)
    wbest = jnp.argmax(vals, axis=-1)                    # (Kb, P, S)
    take_w = lambda a: jnp.take_along_axis(
        a, wbest[..., None], axis=-1)[..., 0]
    # Global bin = band*Kb + j (freqs_pad's ascending lattice).
    rowmax = take_w(vals).transpose(1, 2, 0).reshape(p, s * kb)
    rowlag = take_w(glob).transpose(1, 2, 0).reshape(p, s * kb)
    rowmax = jnp.where(jnp.arange(s * kb)[None, :] < num_bins, rowmax,
                       -jnp.inf)
    return _os_topk_refine(ns_re, ns_im, hs_re, hs_im, freqs_pad,
                           rowmax, rowlag, sample_rate, xcor_len,
                           backend, total_lags, needle_len,
                           num_valid_bins=num_bins)


def batched_stein_os_peak(needles, haystacks, freqs_hz, sample_rate, *,
                          num_lags: Optional[int] = None,
                          block_len: int = 64,
                          backend: Optional[str] = None
                          ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Long-capture per-pair peaks: (freqs (P,), lags (P,), values (P,)).

    BASELINE config 4's workload (16 pairs x 1024 bins x 32768 lags):
    each pair's lag axis splits into M-lag overlap-save windows and
    every (pair, window) runs as one fused-kernel program — the batch
    and window axes together keep the MXU saturated, vs the round-1
    ``lax.map``-of-scans path.  Coarse ranking is window-global; the
    exact top-k re-score happens on a guard-extended slice at the
    coarse winning lag (the :func:`stein_overlap_save_peak` refine
    contract).

    Uniform grids route through the BANDED windowed engine
    (``_banded_stein_os_jit``) whenever the band plan's modeled cost —
    ``s + K_pad/D_band`` vs ``1 + K/D_plain`` MACs per lag column, in
    units of 4N — wins, which covers both wide spans the single-band
    envelope cannot take at all and fine grids where banding lifts the
    block length toward 128 and slashes the dominant synthesis term.
    """
    from caf_cookoff_tpu.models.stein import _band_routing

    backend = backend or default_backend()
    needles = np.asarray(needles)
    haystacks = np.asarray(haystacks)
    if needles.ndim != 2 or haystacks.ndim != 2 \
            or needles.shape[0] != haystacks.shape[0]:
        raise ValueError(
            f"need (P, N) needles and (P, L) haystacks, got "
            f"{needles.shape} vs {haystacks.shape}")
    n = needles.shape[-1]
    if haystacks.shape[-1] <= n:
        raise ValueError("use batched_stein_peak for equal-length pairs")
    ns_re, ns_im = splitfft.split_array(needles)
    hs_re, hs_im = splitfft.split_array(haystacks)
    freqs = as_grid(freqs_hz, dtype=ns_re.dtype)
    try:
        d = _pow2_block_len(sample_rate, freqs, block_len)
    except SpanError:
        d = None                     # span needs banding (or raises below)
    use_banded, d, freqs_pad, centers, rel = _band_routing(
        sample_rate, freqs, d)
    if d is None:
        _pow2_block_len(sample_rate, freqs, block_len)   # re-raise
    m = xcor_length(n)
    total_lags = num_lags or haystacks.shape[-1] - n + 1
    windows = -(-total_lags // m)
    interpret = jax.default_backend() == "cpu"
    if use_banded:
        peak = _banded_stein_os_jit(
            jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
            jnp.asarray(hs_im), jnp.asarray(freqs_pad),
            jnp.asarray(centers), jnp.asarray(rel),
            float(sample_rate), m, d, backend, windows,
            total_lags, n, len(freqs), interpret)
        return (freqs_pad[np.asarray(peak.freq_idx)],
                np.asarray(peak.lag_idx), np.asarray(peak.value))
    pad = (-n) % SUPER
    if pad:
        ns_re = np.pad(ns_re, ((0, 0), (0, pad)))
        ns_im = np.pad(ns_im, ((0, 0), (0, pad)))
    peak = _batched_stein_os_jit(
        jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
        jnp.asarray(hs_im), jnp.asarray(freqs), float(sample_rate), m, d,
        backend, windows, total_lags, n, interpret)
    return (freqs[np.asarray(peak.freq_idx)], np.asarray(peak.lag_idx),
            np.asarray(peak.value))


def batched_stein_peak(needles, haystacks, freqs_hz, sample_rate, *,
                       block_len: int = 64, refine: bool = True,
                       backend: Optional[str] = None
                       ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Per-pair peaks for a (P, N) batch: (freqs (P,), lags (P,), values).

    The fused config-2 path: one conv + one Pallas kernel + one batched
    re-score for the whole batch.  Bin-exact (same answers as
    :func:`caf_cookoff_tpu.models.stein.stein_caf_peak` per pair).
    """
    backend = backend or default_backend()
    needles = np.asarray(needles)
    haystacks = np.asarray(haystacks)
    if needles.ndim != 2 or haystacks.shape != needles.shape:
        raise ValueError(
            f"need matching (P, N) batches, got {needles.shape} vs "
            f"{haystacks.shape}")
    ns_re, ns_im = splitfft.split_array(needles)
    hs_re, hs_im = splitfft.split_array(haystacks)
    freqs = as_grid(freqs_hz, dtype=ns_re.dtype)
    n = ns_re.shape[-1]
    m = xcor_length(n)
    from caf_cookoff_tpu.ops.pallas_stein import FUSED_TILE

    if m % FUSED_TILE:
        raise EligibilityError(
            f"xcor length {m} not a multiple of {FUSED_TILE}")
    interpret = jax.default_backend() == "cpu"
    try:
        d = _pow2_block_len(sample_rate, freqs, block_len)
    except SpanError:
        # Wide-span batch: band the grid, (pair, band) as the batch
        # axis — same construction as the single-pair banded path.
        from caf_cookoff_tpu.models.stein import _plan_bands

        plan = _plan_bands(sample_rate, freqs) if refine else None
        if plan is None:
            raise
        peak = _banded_batched_jit(
            jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
            jnp.asarray(hs_im), jnp.asarray(plan["freqs_pad"]),
            jnp.asarray(plan["centers"]), jnp.asarray(plan["rel"]),
            float(sample_rate), m, plan["block_len"], backend,
            len(freqs), interpret)
        return (plan["freqs_pad"][np.asarray(peak.freq_idx)],
                np.asarray(peak.lag_idx), np.asarray(peak.value))
    # Pad the NEEDLE to whole super-blocks (appended zero blocks add
    # nothing to any correlation); the haystack and M are untouched, so
    # lag semantics match the single-pair engine exactly.
    pad = (-n) % SUPER
    if pad:
        ns_re = np.pad(ns_re, ((0, 0), (0, pad)))
        ns_im = np.pad(ns_im, ((0, 0), (0, pad)))
    peak = _batched_stein_peak_jit(
        jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
        jnp.asarray(hs_im), jnp.asarray(freqs), float(sample_rate), m, d,
        backend, refine, interpret)
    return (freqs[np.asarray(peak.freq_idx)], np.asarray(peak.lag_idx),
            np.asarray(peak.value))


# ---------------------------------------------------------------------------
# Multi-emitter lattices through the fused kernel (round 5)
# ---------------------------------------------------------------------------
#
# The kernel's top-2-separated epilogue (``want_top2`` — two
# ``>= exclude_lag``-separated lag candidates per doppler bin per
# program) feeds an NMS lattice, so BASELINE config 4/5's
# "streaming multi-emitter" workload runs at fused-kernel speed instead
# of falling back to the XLA lattice scan (``parallel/sharded.
# _batched_os_peaks_jit``).  Coarse lattice entries are then re-scored
# EXACTLY on a guard-extended capture window around each entry's lag
# (per-entry rank-then-score — the same contract as the stein stream's
# carried windows, ``models/streaming.py``), and the lattice re-sorts
# and re-dedups on the exact values.
#
# Exactness contract (same as the stein stream): exact for emitters in
# distinct doppler bins, and for same-bin pairs separated by more than
# ``2*exclude_lag`` samples (the kernel's tile-merge guarantee; the CPU
# twin is exact past ``exclude_lag``).  A same-bin pair within
# (cell, 2*cell], or 3+ same-bin emitters in one window, needs the XLA
# lattice engines.  The reference has only a global argmax
# (``caf_rust/src/caf/mod.rs:31-42``).


def _lattice_from_bin_candidates(vals_j, lags_j, num_peaks: int,
                                 exclude_freq: int, exclude_lag: int,
                                 bin_offset=0,
                                 num_bins: Optional[int] = None,
                                 lag_period: Optional[int] = None):
    """NMS lattice from per-bin candidate slots.

    ``vals_j``/``lags_j``: (K, J) per-bin candidates (J slots per bin —
    the kernel's top-2, possibly stacked over windows).  Negative
    values are kernel sentinels (no separated second / fully-masked
    program) and become ``-inf`` so they can neither win nor suppress.
    ``bin_offset``/``num_bins``: banded grids report GLOBAL bins
    ``offset + row`` on the ascending ``freqs_pad`` lattice, with pad
    rows past ``num_bins`` masked out.
    """
    k, j = vals_j.shape
    rows = bin_offset + jnp.arange(k, dtype=jnp.int32)
    bins = jnp.broadcast_to(rows[:, None], (k, j))
    v = jnp.where(vals_j < 0, -jnp.inf, vals_j)
    if num_bins is not None:
        v = jnp.where(bins < num_bins, v, -jnp.inf)
    cands = CafPeak(v.reshape(-1), bins.reshape(-1),
                    lags_j.reshape(-1).astype(jnp.int32))
    return merge_peaks(cands, num_peaks, exclude_freq, exclude_lag,
                       lag_period=lag_period)


def _entry_candidate_bins(vals_flat, lags_flat, lag_e, bin_e,
                          exclude_lag: int, exclude_freq: int,
                          num_bins: int,
                          lag_period: Optional[int] = None):
    """Exact-re-score candidate bins for ONE lattice entry.

    ``vals_flat``/``lags_flat``: (K, J) coarse per-bin candidates with
    lags in the entry's lag coordinates.  The ranking is DOUBLY
    restricted — to candidates within one lag exclusion cell of the
    entry's lag AND to bins within one freq exclusion cell of the
    entry's OWN coarse bin: the coarse bin sits on this emitter's
    mainlobe (bf16/block-phase perturbation moves it at most within the
    cell), and without the freq restriction a same-lag STRONGER emitter
    farther away in frequency would capture the re-score argmax and
    collapse this entry onto it (the post-re-score NMS then dedups
    them, silently dropping a real emitter).  Anything outside the cell
    is by definition a different detection.  Top-``_REFINE_BINS`` of
    the masked ranking.
    """
    from caf_cookoff_tpu.models.stein import _REFINE_BINS

    from caf_cookoff_tpu.ops.peak import _lag_distance

    ok = ((_lag_distance(lags_flat, lag_e, lag_period) <= exclude_lag)
          & (vals_flat >= 0))
    rank = jnp.max(jnp.where(ok, vals_flat, -jnp.inf), axis=-1)  # (K,)
    bins_all = jnp.arange(num_bins, dtype=jnp.int32)
    rank = jnp.where(jnp.abs(bins_all - bin_e) <= exclude_freq, rank,
                     -jnp.inf)
    r = min(_REFINE_BINS, num_bins)
    sel_rank, bins = jax.lax.top_k(rank, r)
    # (bins, valid): a cell narrower than the refine width leaves -inf
    # slots whose bins are arbitrary — their exact rows must be masked,
    # not scored (they could lie outside the entry's freq cell).
    return bins, jnp.isfinite(sel_rank)


def _rescore_guards(needle_len: int, auto_lag_cell: int,
                    hay_len: int) -> Tuple[int, int]:
    """(guard, rescore_win) for the per-entry exact re-score windows.

    The window must hold the whole needle plus ``guard`` samples each
    side; the argmax slack around the coarse candidate is
    resolution-derived (floored at 4 samples for bf16 flat-top tie
    ambiguity) and clamped to the guard so the constrained argmax stays
    inside the window.
    """
    win = max(int(auto_lag_cell), 4)
    guard = min(max(64, win), max(needle_len // 4, 1),
                max((hay_len - needle_len) // 2, 1))
    return guard, min(win, guard)


def _rescore_entries_circular(ns, circ, freqs, vals_j, lags_j, lat,
                              sample_rate, xcor_len: int, guard: int,
                              rescore_win: int, exclude_lag: int,
                              exclude_freq: int, backend: str):
    """Exact re-score of one pair's coarse lattice — CIRCULAR lags.

    ``circ``: (2, M + wlen) circularly-extended haystack planes (the
    zero-padded M-period tiled past the wrap), so a window starting at
    ``(lag - guard) mod M`` reads the exact samples circular lag
    ``lag`` correlates against; local lag ``d`` of the window equals
    circular lag ``(start + d) mod M`` for ``d <= 2*guard`` (every
    needle sample hits in-window data).  The argmax is constrained to
    ``|d - guard| <= rescore_win`` — one resolution cell of slack
    around the entry's OWN coarse lag, so a nearby stronger emitter
    cannot capture the argmax and collapse two entries (see
    ``models/streaming._stein_lattice_rescore_jit``).
    """
    from caf_cookoff_tpu.models.filterbank import _surface_rows_split

    m = xcor_len
    n = ns[0].shape[-1]
    wlen = n + 2 * guard
    k = freqs.shape[0]

    def one(lag_e, bin_e, coarse_ok):
        bins, bok = _entry_candidate_bins(vals_j, lags_j, lag_e, bin_e,
                                          exclude_lag, exclude_freq, k,
                                          lag_period=m)
        start = jnp.mod(lag_e - guard, m)
        wr = jax.lax.dynamic_slice(circ[0], (start,), (wlen,))
        wi = jax.lax.dynamic_slice(circ[1], (start,), (wlen,))
        exact = splitfft.mag2(_surface_rows_split(
            ns, (wr, wi), freqs[bins], sample_rate, m, backend))
        d = jax.lax.broadcasted_iota(jnp.int32, exact.shape, 1)
        keep = (bok[:, None] & (d <= 2 * guard)
                & (jnp.abs(d - guard) <= rescore_win))
        pk = find_peak_2d(jnp.where(keep, exact, -jnp.inf))
        return (jnp.where(coarse_ok, pk.value, -jnp.inf),
                bins[pk.freq_idx].astype(jnp.int32),
                jnp.mod(lag_e + pk.lag_idx - guard, m).astype(jnp.int32))

    vals_e, bins_e, lags_e = jax.vmap(one)(
        lat.lag_idx, lat.freq_idx, jnp.isfinite(lat.value))
    return vals_e, bins_e, lags_e


def _rescore_entries_windowed(ns, hs, freqs, vals_j, lags_j, lat,
                              sample_rate, xcor_len: int,
                              needle_len: int, total_lags: int,
                              guard: int, rescore_win: int,
                              exclude_lag: int, exclude_freq: int,
                              backend: str):
    """Exact re-score of one pair's coarse lattice — LINEAR capture lags
    (the overlap-save path): a guard-extended slice of the raw capture
    around each entry's lag, local lags constrained to full-overlap
    range, the requested lag bound, and one resolution cell around the
    entry's own coarse lag (see :func:`_rescore_entries_circular`)."""
    from caf_cookoff_tpu.models.filterbank import _surface_rows_split

    n = needle_len
    wlen = n + 2 * guard
    hay_len = hs[0].shape[-1]
    k = freqs.shape[0]

    def one(lag_e, bin_e, coarse_ok):
        bins, bok = _entry_candidate_bins(vals_j, lags_j, lag_e, bin_e,
                                          exclude_lag, exclude_freq, k)
        start = jnp.clip(lag_e - guard, 0, max(hay_len - wlen, 0))
        wr = jax.lax.dynamic_slice(hs[0], (start,), (wlen,))
        wi = jax.lax.dynamic_slice(hs[1], (start,), (wlen,))
        exact = splitfft.mag2(_surface_rows_split(
            ns, (wr, wi), freqs[bins], sample_rate, xcor_len, backend))
        d = jax.lax.broadcasted_iota(jnp.int32, exact.shape, 1)
        keep = (bok[:, None] & (d <= 2 * guard) & (start + d < total_lags)
                & (jnp.abs(start + d - lag_e) <= rescore_win))
        pk = find_peak_2d(jnp.where(keep, exact, -jnp.inf))
        return (jnp.where(coarse_ok, pk.value, -jnp.inf),
                bins[pk.freq_idx].astype(jnp.int32),
                (start + pk.lag_idx).astype(jnp.int32))

    vals_e, bins_e, lags_e = jax.vmap(one)(
        lat.lag_idx, lat.freq_idx, jnp.isfinite(lat.value))
    return vals_e, bins_e, lags_e


def _batched_stein_peaks_core(ns_re, ns_im, hs_re, hs_im, freqs,
                              sample_rate, xcor_len: int, block_len: int,
                              backend: str, num_peaks: int,
                              exclude_freq: int, exclude_lag: int,
                              guard: int, rescore_win: int,
                              interpret: bool) -> CafPeak:
    """Traceable equal-length multi-emitter batch pipeline (also the
    ``shard_map`` body of ``parallel.sharded.
    sharded_batched_stein_peaks``).  Fields (P_pairs, num_peaks)."""
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    pad = (-ns_re.shape[-1]) % SUPER
    np_re = jnp.pad(ns_re, ((0, 0), (0, pad)))
    np_im = jnp.pad(ns_im, ((0, 0), (0, pad)))
    b = np_re.shape[-1] // block_len
    lmat, group = _needle_operator(np_re, np_im, block_len)
    span = fused_span(b, group, xcor_len)
    h_ext = _haystack_extension(hs_re, hs_im, xcor_len, span)
    ws1, ws2 = stein_synthesis_weights(freqs, sample_rate, b, block_len)
    if interpret:
        v1, i1, v2, i2 = _coarse_rank_xla(
            ws1, ws2, lmat, h_ext, b, group, xcor_len,
            want_top2=True, sep=exclude_lag)
    else:
        v1, i1, v2, i2 = fused_stein_rank(
            ws1, ws2, lmat, h_ext, b, group, xcor_len,
            want_top2=True, sep=exclude_lag)
    # (K, P) x4 -> per-pair (K, 2) candidate slots.
    vals_j = jnp.stack([v1, v2], axis=-1).transpose(1, 0, 2)
    lags_j = jnp.stack([i1, i2], axis=-1).transpose(1, 0, 2)
    lat = jax.vmap(lambda vj, lj: _lattice_from_bin_candidates(
        vj, lj, num_peaks, exclude_freq, exclude_lag,
        lag_period=xcor_len))(vals_j, lags_j)
    # Circular haystack extension for the re-score windows: period M
    # (the haystack zero-padded to the FFT length) tiled past the wrap.
    m = xcor_len
    base_re = jnp.pad(hs_re, ((0, 0), (0, m - hs_re.shape[-1])))
    base_im = jnp.pad(hs_im, ((0, 0), (0, m - hs_im.shape[-1])))
    n = ns_re.shape[-1]
    wlen = n + 2 * guard
    circ = jnp.stack(
        [jnp.concatenate([base_re, base_re[:, :wlen]], axis=-1),
         jnp.concatenate([base_im, base_im[:, :wlen]], axis=-1)], axis=1)

    def close(nr, ni, cp, vj, lj, lat_p):
        vals_e, bins_e, lags_e = _rescore_entries_circular(
            (nr, ni), cp, freqs, vj, lj, lat_p, sample_rate, m, guard,
            rescore_win, exclude_lag, exclude_freq, backend)
        # Two coarse cells can re-score onto the same exact peak (e.g.
        # a doppler sidelobe beyond the bin exclusion) — re-dedup and
        # re-sort on the exact values, circularly (a wrap-around skirt
        # collapses onto its mainlobe instead of claiming a slot).
        return merge_peaks(CafPeak(vals_e, bins_e, lags_e), num_peaks,
                           exclude_freq, exclude_lag,
                           lag_period=xcor_len)

    return jax.vmap(close)(ns_re, ns_im, circ, vals_j, lags_j, lat)


_batched_stein_peaks_jit = functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "num_peaks",
                     "exclude_freq", "exclude_lag", "guard",
                     "rescore_win", "interpret"))(_batched_stein_peaks_core)


def _stein_model_floor(needles: np.ndarray, haystacks: np.ndarray,
                       valid_len=None) -> np.ndarray:
    """(P,) per-pair model noise floor: ``sum|n|^2 * mean|h|^2``.

    A noise-only xcor cell is a complex-Gaussian sum with that second
    moment (the same exponential-cell model as
    :meth:`caf_cookoff_tpu.models.streaming.StreamingCAF.noise_floor`)
    — the fused kernel reduces bins to (max, argmax), so there are no
    cells to measure.  ``valid_len`` (scalar, or per-pair sequence for
    batches padded to one length) restricts each haystack mean to the
    REAL capture samples: averaging zero padding in would bias the
    floor low and inflate every SNR by the padding ratio.
    """
    needles = np.asarray(needles)
    haystacks = np.asarray(haystacks)
    n_energy = np.sum(np.abs(needles) ** 2, axis=-1, dtype=np.float64)
    if valid_len is None:
        h_mean = np.mean(np.abs(haystacks) ** 2, axis=-1,
                         dtype=np.float64)
    else:
        lens = np.broadcast_to(
            np.asarray(valid_len, np.int64), (haystacks.shape[0],))
        h_mean = np.array([
            np.mean(np.abs(haystacks[i, :lens[i]]) ** 2,
                    dtype=np.float64)
            for i in range(haystacks.shape[0])])
    return n_energy * h_mean


def batched_stein_peaks(needles, haystacks, freqs_hz, sample_rate,
                        num_peaks: int, *, block_len: int = 64,
                        exclude_freq: Optional[int] = None,
                        exclude_lag: Optional[int] = None,
                        backend: Optional[str] = None,
                        min_snr_db=None, with_snr: bool = False):
    """Top-``num_peaks`` emitters PER PAIR through the fused batch
    engine: ``(freqs (P, k), lags (P, k), values (P, k)[, snr_db])``,
    strongest first, empty slots ``-inf``.

    The multi-emitter sibling of :func:`batched_stein_peak` — config
    2's batch shape with config 4's lattice semantics, at fused-kernel
    speed (the kernel's ``want_top2`` epilogue carries two separated
    same-bin candidates per bin; see the module-level exactness
    contract).  Lags are CIRCULAR xcor indices like
    :func:`batched_stein_peak` (unwrap with :func:`caf_cookoff_tpu.
    ops.peak.unwrap_lag`).  ``min_snr_db`` / ``with_snr`` apply the
    detection threshold against the per-pair model floor
    (:func:`_stein_model_floor`).  Wide-span grids that need banding
    are not supported here — use :func:`caf_cookoff_tpu.models.
    filterbank.caf_surface` + :func:`caf_cookoff_tpu.ops.peak.
    find_peaks`, or the overlap-save lattice engines.
    """
    from caf_cookoff_tpu.models.overlap_save import detection_rows
    from caf_cookoff_tpu.ops.peak import resolve_exclusions

    backend = backend or default_backend()
    needles = np.asarray(needles)
    haystacks = np.asarray(haystacks)
    if needles.ndim != 2 or haystacks.shape != needles.shape:
        raise ValueError(
            f"need matching (P, N) batches, got {needles.shape} vs "
            f"{haystacks.shape}")
    ns_re, ns_im = splitfft.split_array(needles)
    hs_re, hs_im = splitfft.split_array(haystacks)
    freqs = as_grid(freqs_hz, dtype=ns_re.dtype)
    n = ns_re.shape[-1]
    m = xcor_length(n)
    try:
        d = _pow2_block_len(sample_rate, freqs, block_len)
    except SpanError as e:
        raise EligibilityError(
            f"{e} — the multi-emitter fused engine does not band wide "
            "spans; use find_peaks on caf_surface or the overlap-save "
            "lattice engines for this grid") from e
    auto = resolve_exclusions(needles[0], freqs, sample_rate, None, None)
    exclude_freq = auto[0] if exclude_freq is None else int(exclude_freq)
    exclude_lag = auto[1] if exclude_lag is None else int(exclude_lag)
    # The circular extension (period m) imposes no window-fit limit —
    # pass m, not n, or the guard collapses to 1 and the re-score
    # cannot correct a bf16 flat-top argmax more than 1 sample off.
    guard, rescore_win = _rescore_guards(n, auto[1], m)
    interpret = jax.default_backend() == "cpu"
    pk = _batched_stein_peaks_jit(
        jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
        jnp.asarray(hs_im), jnp.asarray(freqs), float(sample_rate), m, d,
        backend, int(num_peaks), exclude_freq, exclude_lag, guard,
        rescore_win, interpret)
    if min_snr_db is None and not with_snr:
        return (freqs[np.asarray(pk.freq_idx)], np.asarray(pk.lag_idx),
                np.asarray(pk.value))
    return detection_rows(freqs, pk, _stein_model_floor(needles, haystacks),
                          len(freqs) * m, min_snr_db, with_snr)


@functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "windows",
                     "total_lags", "needle_len", "num_peaks",
                     "exclude_freq", "exclude_lag", "guard",
                     "rescore_win", "interpret"))
def _batched_stein_os_peaks_jit(ns_re, ns_im, hs_re, hs_im, freqs,
                                sample_rate, xcor_len, block_len, backend,
                                windows: int, total_lags: int,
                                needle_len: int, num_peaks: int,
                                exclude_freq: int, exclude_lag: int,
                                guard: int, rescore_win: int,
                                interpret: bool) -> CafPeak:
    """Windowed multi-emitter coarse scan + per-entry exact re-score.

    One fused-kernel program per (pair, window) with the top-2 per-bin
    epilogue; per-window NMS lattices fold across windows (hierarchical
    — same 'sidelobe-level slots may differ from a flat fold' caveat as
    every hierarchical lattice merge in the framework), then each
    surviving entry re-scores exactly on a guard-extended capture
    slice.  Fields (P_pairs, num_peaks); lags are absolute capture
    offsets.
    """
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    p = ns_re.shape[0]
    n = needle_len
    pad = (-ns_re.shape[-1]) % SUPER
    np_re = jnp.pad(ns_re, ((0, 0), (0, pad)))
    np_im = jnp.pad(ns_im, ((0, 0), (0, pad)))
    b = np_re.shape[-1] // block_len
    v = xcor_len
    lmat, group = _needle_operator(np_re, np_im, block_len)
    span = fused_span(b, group, v)
    h_ext = _os_window_extensions(hs_re, hs_im, v, windows, span)
    ws1, ws2 = stein_synthesis_weights(freqs, sample_rate, b, block_len)
    per_w = np.clip(total_lags - np.arange(windows) * v, 0, v)
    num_valid = jnp.asarray(np.tile(per_w, p), jnp.int32)
    if interpret:
        lmat_rep = jnp.repeat(lmat, windows, axis=0)
        v1, i1, v2, i2 = _coarse_rank_xla(
            ws1, ws2, lmat_rep, h_ext, b, group, v, num_valid=num_valid,
            want_top2=True, sep=exclude_lag)
    else:
        v1, i1, v2, i2 = fused_stein_rank(
            ws1, ws2, lmat, h_ext, b, group, v, windows=windows,
            num_valid=num_valid, want_top2=True, sep=exclude_lag)
    k = freqs.shape[0]
    # (K, P*W) x4 -> (P, W, K, 2) candidates with GLOBAL lags.
    woff = jnp.arange(windows, dtype=jnp.int32) * v
    vals_j = jnp.stack([v1, v2], axis=-1).reshape(k, p, windows, 2)
    lags_j = (jnp.stack([i1, i2], axis=-1).reshape(k, p, windows, 2)
              + woff[None, None, :, None])
    vals_j = jnp.where(lags_j < total_lags, vals_j, -1.0)
    vals_j = vals_j.transpose(1, 2, 0, 3)            # (P, W, K, 2)
    lags_j = lags_j.transpose(1, 2, 0, 3)

    def window_lattices(vw, lw):                     # (W, K, 2) each
        return jax.vmap(lambda vj, lj: _lattice_from_bin_candidates(
            vj, lj, num_peaks, exclude_freq, exclude_lag))(vw, lw)

    wlat = jax.vmap(window_lattices)(vals_j, lags_j)  # (P, W, k) fields
    flat = CafPeak(*(f.reshape(p, -1) for f in wlat))
    lat = jax.vmap(lambda c: merge_peaks(c, num_peaks, exclude_freq,
                                         exclude_lag))(flat)

    # Per-pair candidate slots as (K, W*2) for the re-score's
    # lag-restricted bin ranking.
    vflat = vals_j.transpose(0, 2, 1, 3).reshape(p, k, -1)
    lflat = lags_j.transpose(0, 2, 1, 3).reshape(p, k, -1)

    def close(nr, ni, hr, hi, vj, lj, lat_p):
        vals_e, bins_e, lags_e = _rescore_entries_windowed(
            (nr, ni), (hr, hi), freqs, vj, lj, lat_p, sample_rate,
            xcor_len, n, total_lags, guard, rescore_win, exclude_lag,
            exclude_freq, backend)
        # Re-dedup + re-sort on the exact values (two coarse cells can
        # re-score onto one exact peak).
        return merge_peaks(CafPeak(vals_e, bins_e, lags_e), num_peaks,
                           exclude_freq, exclude_lag)

    return jax.vmap(close)(ns_re, ns_im, hs_re, hs_im, vflat, lflat, lat)


@functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "windows",
                     "total_lags", "needle_len", "num_bins", "num_peaks",
                     "exclude_freq", "exclude_lag", "guard",
                     "rescore_win", "interpret"))
def _banded_stein_os_peaks_jit(ns_re, ns_im, hs_re, hs_im, freqs_pad,
                               centers, rel, sample_rate, xcor_len,
                               block_len, backend, windows: int,
                               total_lags: int, needle_len: int,
                               num_bins: int, num_peaks: int,
                               exclude_freq: int, exclude_lag: int,
                               guard: int, rescore_win: int,
                               interpret: bool) -> CafPeak:
    """Banded long-capture multi-emitter scan: (pair, band, window)
    fused programs with the top-2 per-bin epilogue, lattices on the
    ascending ``freqs_pad`` global-bin lattice (bin = band*Kb + j; pad
    rows masked), per-entry exact re-score on ABSOLUTE frequencies with
    the unshifted needles — the ``windows x share_h`` composition of
    :func:`_batched_stein_os_peaks_jit` (see its hierarchical-merge
    caveat) for grids the single-band envelope cannot take."""
    from caf_cookoff_tpu.ops.pallas_stein import (
        fused_span,
        fused_stein_rank,
        stein_synthesis_weights,
    )

    p = ns_re.shape[0]
    s = centers.shape[0]
    v = xcor_len
    n = needle_len
    sr, si = _shift_to_centers(ns_re, ns_im, centers, sample_rate)
    b = sr.shape[-1] // block_len
    lmat, sup = _needle_operator(sr, si, block_len)
    span = fused_span(b, sup, v)
    h_ext = _os_window_extensions(hs_re, hs_im, v, windows, span)
    ws1, ws2 = stein_synthesis_weights(rel, sample_rate, b, block_len)
    per_w = np.clip(total_lags - np.arange(windows) * v, 0, v)
    num_valid = jnp.asarray(np.tile(per_w, p * s), jnp.int32)
    if interpret:
        lmat_rep = jnp.repeat(lmat, windows, axis=0)
        ln = h_ext.shape[-1]
        h_rep = jnp.broadcast_to(
            h_ext.reshape(p, 1, windows, 2, ln),
            (p, s, windows, 2, ln)).reshape(p * s * windows, 2, ln)
        v1, i1, v2, i2 = _coarse_rank_xla(
            ws1, ws2, lmat_rep, h_rep, b, sup, v, num_valid=num_valid,
            want_top2=True, sep=exclude_lag)
    else:
        v1, i1, v2, i2 = fused_stein_rank(
            ws1, ws2, lmat, h_ext, b, sup, v, windows=windows,
            share_h=s, num_valid=num_valid, want_top2=True,
            sep=exclude_lag)
    kb = rel.shape[0]
    woff = jnp.arange(windows, dtype=jnp.int32) * v
    vals_j = jnp.stack([v1, v2], axis=-1).reshape(kb, p, s, windows, 2)
    lags_j = (jnp.stack([i1, i2], axis=-1).reshape(kb, p, s, windows, 2)
              + woff[None, None, None, :, None])
    vals_j = jnp.where(lags_j < total_lags, vals_j, -1.0)
    vals_j = vals_j.transpose(1, 2, 3, 0, 4)        # (P, S, W, Kb, 2)
    lags_j = lags_j.transpose(1, 2, 3, 0, 4)
    offs = jnp.arange(s, dtype=jnp.int32) * kb

    def band_lattices(vb, lb, off):                 # (W, Kb, 2), scalar
        return jax.vmap(lambda vj, lj: _lattice_from_bin_candidates(
            vj, lj, num_peaks, exclude_freq, exclude_lag,
            bin_offset=off, num_bins=num_bins))(vb, lb)

    wlat = jax.vmap(lambda vp, lp: jax.vmap(band_lattices)(
        vp, lp, offs))(vals_j, lags_j)              # (P, S, W, k) fields
    flat = CafPeak(*(f.reshape(p, -1) for f in wlat))
    lat = jax.vmap(lambda c: merge_peaks(c, num_peaks, exclude_freq,
                                         exclude_lag))(flat)
    # Candidate slots on the global lattice: (P, S*Kb, W*2); pad rows
    # go negative so the re-score's bin ranking excludes them.
    vflat = vals_j.transpose(0, 1, 3, 2, 4).reshape(p, s * kb, -1)
    lflat = lags_j.transpose(0, 1, 3, 2, 4).reshape(p, s * kb, -1)
    rows = jnp.arange(s * kb)
    vflat = jnp.where(rows[None, :, None] < num_bins, vflat, -1.0)

    def close(nr, ni, hr, hi, vj, lj, lat_p):
        vals_e, bins_e, lags_e = _rescore_entries_windowed(
            (nr, ni), (hr, hi), freqs_pad, vj, lj, lat_p, sample_rate,
            xcor_len, n, total_lags, guard, rescore_win, exclude_lag,
            exclude_freq, backend)
        return merge_peaks(CafPeak(vals_e, bins_e, lags_e), num_peaks,
                           exclude_freq, exclude_lag)

    return jax.vmap(close)(ns_re, ns_im, hs_re, hs_im, vflat, lflat, lat)


def batched_stein_os_peaks(needles, haystacks, freqs_hz, sample_rate,
                           num_peaks: int,
                           num_lags: Optional[int] = None, *,
                           block_len: int = 64,
                           exclude_freq: Optional[int] = None,
                           exclude_lag: Optional[int] = None,
                           backend: Optional[str] = None,
                           min_snr_db=None, with_snr: bool = False,
                           capture_lens=None):
    """Top-``num_peaks`` emitters PER PAIR of long captures at fused
    speed — BASELINE config 4's "streaming multi-emitter" workload
    through :func:`caf_cookoff_tpu.ops.pallas_stein.fused_stein_rank`.

    The multi-emitter sibling of :func:`batched_stein_os_peak`:
    ``(freqs (P, k), lags (P, k), values (P, k)[, snr_db (P, k)])``,
    strongest first per pair, lags absolute capture offsets, empty and
    sub-threshold slots ``-inf``.  Exclusion windows default to the
    first needle's resolution cell; ``min_snr_db`` / ``with_snr``
    threshold against the per-pair model floor
    (:func:`_stein_model_floor` — the fused kernel emits per-bin
    maxima, not cells, so the floor is modeled, not measured; the XLA
    twin :func:`caf_cookoff_tpu.parallel.sharded.
    batched_overlap_save_peaks` measures it).  See the module-level
    same-bin exactness contract.  Uniform grids route through the
    BANDED windowed engine whenever the band plan's modeled cost wins
    (same routing as :func:`batched_stein_os_peak`); non-uniform
    wide-span grids that cannot band raise and should use the XLA
    lattice engines.
    """
    from caf_cookoff_tpu.models.overlap_save import detection_rows
    from caf_cookoff_tpu.models.stein import _band_routing
    from caf_cookoff_tpu.ops.peak import resolve_exclusions

    backend = backend or default_backend()
    needles = np.asarray(needles)
    haystacks = np.asarray(haystacks)
    if needles.ndim != 2 or haystacks.ndim != 2 \
            or needles.shape[0] != haystacks.shape[0]:
        raise ValueError(
            f"need (P, N) needles and (P, L) haystacks, got "
            f"{needles.shape} vs {haystacks.shape}")
    n = needles.shape[-1]
    if haystacks.shape[-1] <= n:
        raise ValueError("use batched_stein_peaks for equal-length pairs")
    ns_re, ns_im = splitfft.split_array(needles)
    hs_re, hs_im = splitfft.split_array(haystacks)
    freqs = as_grid(freqs_hz, dtype=ns_re.dtype)
    try:
        d = _pow2_block_len(sample_rate, freqs, block_len)
    except SpanError:
        d = None
    use_banded, d, freqs_pad_r, centers_r, rel_r = _band_routing(
        sample_rate, freqs, d)
    if d is None:
        try:
            _pow2_block_len(sample_rate, freqs, block_len)   # re-raise
        except SpanError as e:
            raise EligibilityError(
                f"{e} — this grid neither fits the single-band envelope "
                "nor bands cleanly; use batched_overlap_save_peaks (XLA "
                "lattice) for it") from e
    m = xcor_length(n)
    total_lags = num_lags or haystacks.shape[-1] - n + 1
    windows = -(-total_lags // m)
    auto = resolve_exclusions(needles[0], freqs, sample_rate, None, None)
    exclude_freq = auto[0] if exclude_freq is None else int(exclude_freq)
    exclude_lag = auto[1] if exclude_lag is None else int(exclude_lag)
    guard, rescore_win = _rescore_guards(n, auto[1], haystacks.shape[-1])
    interpret = jax.default_backend() == "cpu"
    if use_banded:
        pk = _banded_stein_os_peaks_jit(
            jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
            jnp.asarray(hs_im), jnp.asarray(freqs_pad_r),
            jnp.asarray(centers_r), jnp.asarray(rel_r),
            float(sample_rate), m, d, backend, windows,
            total_lags, n, len(freqs), int(num_peaks), exclude_freq,
            exclude_lag, guard, rescore_win, interpret)
        out_freqs = freqs_pad_r
    else:
        pk = _batched_stein_os_peaks_jit(
            jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
            jnp.asarray(hs_im), jnp.asarray(freqs), float(sample_rate),
            m, d, backend, windows, total_lags, n, int(num_peaks),
            exclude_freq, exclude_lag, guard, rescore_win, interpret)
        out_freqs = freqs
    if min_snr_db is None and not with_snr:
        return (out_freqs[np.asarray(pk.freq_idx)],
                np.asarray(pk.lag_idx), np.asarray(pk.value))
    return detection_rows(
        out_freqs, pk,
        _stein_model_floor(needles, haystacks, valid_len=capture_lens),
        len(freqs) * total_lags, min_snr_db, with_snr)
