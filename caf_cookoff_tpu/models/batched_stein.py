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
from caf_cookoff_tpu.ops.peak import CafPeak
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


def _coarse_rank_xla(ws1, ws2, lmat, h_ext, b: int, sup: int,
                     num_lags: int, num_valid=None):
    """Pure-XLA twin of ops/pallas_stein.fused_stein_rank — the CPU
    (and numerical-reference) path: same math, same per-block staircase
    layout, materialized in HBM instead of VMEM.  ``num_valid`` is the
    kernel's per-program lag bound ((P,) int32 — see the shadowing
    note there)."""
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
    from caf_cookoff_tpu.models.stein import _plan_bands

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
    plan = _plan_bands(sample_rate, freqs)
    use_banded = False
    if plan is not None:
        if d is None:
            use_banded = True
        else:
            cost_plain = 1.0 + len(freqs) / d
            cost_band = (plan["bands"]
                         + plan["bands"] * plan["kb"] / plan["block_len"])
            use_banded = cost_band < 0.9 * cost_plain
    if d is None and not use_banded:
        _pow2_block_len(sample_rate, freqs, block_len)   # re-raise
    m = xcor_length(n)
    total_lags = num_lags or haystacks.shape[-1] - n + 1
    windows = -(-total_lags // m)
    interpret = jax.default_backend() == "cpu"
    if use_banded:
        peak = _banded_stein_os_jit(
            jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
            jnp.asarray(hs_im), jnp.asarray(plan["freqs_pad"]),
            jnp.asarray(plan["centers"]), jnp.asarray(plan["rel"]),
            float(sample_rate), m, plan["block_len"], backend, windows,
            total_lags, n, len(freqs), interpret)
        return (plan["freqs_pad"][np.asarray(peak.freq_idx)],
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
