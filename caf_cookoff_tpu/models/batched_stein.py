"""Batched Stein engine — one fused program for a (B, N) batch of pairs.

BASELINE config 2's workload (64 pairs x 400x8192 on one chip).  The
round-1 path walked ``lax.map`` over per-pair Stein programs — zero
batch amortization (0.060 ms/surface vs 0.054 single-surface).  This
engine restructures the whole batch around two MXU-shaped stages:

* **Stage A — segment correlations as ONE grouped convolution.**  For
  needle blocks of length D, ``G[b, tau] = sum_d conj(n[bD+d]) *
  h[bD+d+tau]`` is a D-tap cross-correlation — and at D = 64 direct
  evaluation (D MACs/lag) beats any FFT factorization
  (~(n1+n2) MACs/lag at M = 8192), so the FFTs of the single-pair
  engine (``models/stein.py``) disappear entirely.  All P pairs x B
  blocks x two complex components become a single
  ``lax.conv_general_dilated`` with ``feature_group_count = P``:
  P groups x (2 in-channels = h planes) x (2B out-channels = G planes),
  kernels built from the conjugated needle blocks.  Blocks are grouped
  into 128-sample super-blocks so every extraction offset downstream is
  128-lane-aligned.

* **Stage B — fused synthesis + rank kernel** (``ops/pallas_stein.
  batched_synth_rank``): per pair, staircase-extract the G tile, run
  the two stacked synthesis matmuls on the MXU, and fold the
  |.|^2 / per-bin-max epilogue in VMEM.  The (K, P*M) synthesized
  surface (~1.7 GB at config-2 shape) never exists in HBM.

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

from caf_cookoff_tpu.config import default_backend, is_pow2, xcor_length
from caf_cookoff_tpu.models.filterbank import _surface_rows_split
from caf_cookoff_tpu.models.stein import _REFINE_BINS, _auto_block_len
from caf_cookoff_tpu.ops import splitfft
from caf_cookoff_tpu.ops.peak import CafPeak

SUPER = 128  # super-block width: the TPU lane tile


def _pow2_block_len(sample_rate: float, freqs_hz: np.ndarray,
                    requested: int) -> int:
    """Largest power-of-two block length within the sinc-envelope limit
    (:func:`caf_cookoff_tpu.models.stein._auto_block_len`), capped at
    ``SUPER`` so super-blocks tile the 128-lane axis."""
    d = min(_auto_block_len(sample_rate, freqs_hz, requested), SUPER)
    while not is_pow2(d):
        d &= d - 1                       # clear lowest set bit
    if d < 8:
        raise ValueError("block length below 8 after pow2 rounding")
    return d


def _conv_segment_correlations(ns_re, ns_im, hs_re, hs_im, d: int, m: int):
    """(P, 2B, L) staircase-layout segment correlations via one conv.

    Row layout: rows [0, B) are Re(G), rows [B, 2B) are Im(G); the block
    ``b`` row holds ``G[b, tau]`` at column ``(b // group)*SUPER + tau``
    (group = SUPER // D blocks per super-block), so every downstream
    extraction offset is lane-tile-aligned.  ``needles`` must already be
    padded to whole super-blocks; haystacks keep their native length.
    """
    p, n_pad = ns_re.shape
    b = n_pad // d
    group = SUPER // d
    n_super = b // group
    span = (n_super - 1) * SUPER + m
    lhs_len = span + SUPER - 1

    # Circular haystack extension: the M-point FFT correlation of the
    # single-pair engine indexes h mod M (zeros in [N, M)); column c of
    # the conv reads samples [c, c + SUPER), so extend one full period.
    n_h = hs_re.shape[-1]
    if lhs_len > 2 * m:
        raise ValueError(f"staircase span {lhs_len} exceeds 2M={2 * m}")

    def circ(hp):
        base = jnp.concatenate(
            [hp, jnp.zeros((p, m - n_h), hp.dtype)], axis=-1)
        return jnp.concatenate([base, base], axis=-1)[:, :lhs_len]

    lhs = jnp.stack([circ(hs_re), circ(hs_im)], axis=1)   # (P, 2, L+127)
    lhs = lhs.reshape(1, 2 * p, lhs_len)

    # Super-grouped SUPER-tap kernels: block b occupies taps
    # [(b % group)*D, (b % group + 1)*D).
    def grouped(x):
        blocks = x.reshape(p, n_super, group, d)
        eye = jnp.eye(group, dtype=x.dtype)
        # out[p, s, q, g, :] nonzero only where q == g
        t = blocks[:, :, :, None, :] * eye[None, None, :, :, None]
        return t.reshape(p, b, SUPER)

    tr = grouped(ns_re)                      # Re(conj n) = nr
    ti = grouped(-ns_im)                     # Im(conj n) = -ni
    # G = sum cn*h: Gr taps (hr: tr, hi: -ti); Gi taps (hr: ti, hi: tr).
    top = jnp.stack([tr, -ti], axis=2)       # (P, B, 2, SUPER) -> Gr rows
    bot = jnp.stack([ti, tr], axis=2)        # -> Gi rows
    rhs = jnp.concatenate([top, bot], axis=1).reshape(2 * b * p, 2, SUPER)

    out = jax.lax.conv_general_dilated(
        lhs, rhs, window_strides=(1,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=p,
        precision=jax.lax.Precision.DEFAULT)
    return out.reshape(p, 2 * b, span), group


@functools.partial(
    jax.jit,
    static_argnames=("xcor_len", "block_len", "backend", "refine",
                     "interpret"))
def _batched_stein_peak_jit(ns_re, ns_im, hs_re, hs_im, freqs_hz,
                            sample_rate, xcor_len, block_len, backend,
                            refine: bool, interpret: bool):
    from caf_cookoff_tpu.ops.pallas_stein import (
        batched_synth_rank,
        stein_synthesis_weights,
    )

    b = ns_re.shape[-1] // block_len
    co, group = _conv_segment_correlations(ns_re, ns_im, hs_re, hs_im,
                                           block_len, xcor_len)
    ws1, ws2 = stein_synthesis_weights(freqs_hz, sample_rate, b, block_len)
    vals, idxs = batched_synth_rank(ws1, ws2, co.astype(jnp.bfloat16),
                                    b, group, xcor_len,
                                    interpret=interpret)     # (K, P) each
    vals_t = vals.T                                          # (P, K)
    if not refine:
        best = jnp.argmax(vals_t, axis=1)                    # (P,)
        take = lambda a: jnp.take_along_axis(
            a.T, best[:, None], axis=1)[:, 0]
        return CafPeak(value=take(vals),
                       freq_idx=best.astype(jnp.int32),
                       lag_idx=take(idxs).astype(jnp.int32))

    k = freqs_hz.shape[0]
    r = min(_REFINE_BINS, k)
    _, cand = jax.lax.top_k(vals_t, r)                       # (P, r)

    def rescore(nr, ni, hr, hi, fsel):
        exact = splitfft.mag2(_surface_rows_split(
            (nr, ni), (hr, hi), fsel, sample_rate, xcor_len, backend))
        rowmax = jnp.max(exact, axis=-1)                     # (r,)
        return rowmax, jnp.argmax(exact, axis=-1).astype(jnp.int32)

    rowmax, lags = jax.vmap(rescore)(
        ns_re, ns_im, hs_re, hs_im, freqs_hz[cand])          # (P, r) each

    def pick(rm, cd, lg):
        best = jnp.lexsort((cd.astype(jnp.int32), -rm))[0]
        return CafPeak(value=rm[best],
                       freq_idx=cd[best].astype(jnp.int32),
                       lag_idx=lg[best])

    return jax.vmap(pick)(rowmax, cand, lags)


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
    freqs = np.asarray(freqs_hz, dtype=ns_re.dtype)
    d = _pow2_block_len(sample_rate, freqs, block_len)
    n = ns_re.shape[-1]
    m = xcor_length(n)
    from caf_cookoff_tpu.ops.pallas_stein import TILE_M

    if m % TILE_M:
        raise ValueError(f"xcor length {m} not a multiple of {TILE_M}")
    # Pad the NEEDLE to whole super-blocks (appended zero blocks add
    # nothing to any correlation); the haystack and M are untouched, so
    # lag semantics match the single-pair engine exactly.
    pad = (-n) % SUPER
    if pad:
        ns_re = np.pad(ns_re, ((0, 0), (0, pad)))
        ns_im = np.pad(ns_im, ((0, 0), (0, pad)))
    interpret = jax.default_backend() == "cpu"
    peak = _batched_stein_peak_jit(
        jnp.asarray(ns_re), jnp.asarray(ns_im), jnp.asarray(hs_re),
        jnp.asarray(hs_im), jnp.asarray(freqs), float(sample_rate), m, d,
        backend, refine, interpret)
    return (freqs[np.asarray(peak.freq_idx)], np.asarray(peak.lag_idx),
            np.asarray(peak.value))
