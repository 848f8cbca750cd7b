"""Fused Stein synthesis + per-bin rank kernel.

The XLA Stein path materializes the synthesized rows ``R = W @ G``
((2K, M) float32, ~26 MB at the reference shape) just to take |.|^2 and
a per-bin max — an HBM round-trip that rivals the matmul time.  This
kernel fuses the synthesis matmul with the magnitude/argmax epilogue:
per M-tile it computes both row planes on the MXU, squares on the VPU,
and folds a running (per-bin max, argmax) accumulator in VMEM; only the
(K,) peak values and lag indices ever reach HBM.

Split-complex synthesis with single-side stacking (so each LHS tiles
contiguously):

    Rr = [Wr | -Wi] @ [Gr; Gi]        ws1 (K, 2B) @ gs (2B, M)
    Ri = [Wi |  Wr] @ [Gr; Gi]        ws2 (K, 2B) @ gs (2B, M)

Used by the Stein peak path on TPU (coarse ranking stage — bf16 dots;
exactness comes from the usual top-k re-score)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG_IDX = np.int32(2**30)

# M-tile width: 512 lanes x (K-padded) rows keeps the working set ~3 MB.
TILE_M = 512
ROW_PAD = 128  # K padded to a multiple of this (f32 sublane-friendly)


def _synth_rank_kernel(ws1_ref, ws2_ref, gs_ref, vals_ref, idxs_ref):
    j = pl.program_id(0)
    gs = gs_ref[:]                                  # (2B, TILE_M)
    rr = jnp.dot(ws1_ref[:].astype(jnp.bfloat16), gs.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    ri = jnp.dot(ws2_ref[:].astype(jnp.bfloat16), gs.astype(jnp.bfloat16),
                 preferred_element_type=jnp.float32)
    mag2 = rr * rr + ri * ri                        # (K, TILE_M)
    k, tm = mag2.shape
    colmax = jnp.max(mag2, axis=1, keepdims=True)   # (K, 1)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (k, tm), 1)
    colarg = jnp.min(jnp.where(mag2 >= colmax, col_iota, _BIG_IDX),
                     axis=1, keepdims=True) + j * tm

    @pl.when(j == 0)
    def _():
        vals_ref[:] = colmax
        idxs_ref[:] = colarg

    @pl.when(j > 0)
    def _():
        prev = vals_ref[:]
        take = colmax > prev
        vals_ref[:] = jnp.where(take, colmax, prev)
        idxs_ref[:] = jnp.where(take, colarg, idxs_ref[:])


@functools.partial(jax.jit, static_argnames=("interpret",))
def synth_rank(ws1, ws2, g_re, g_im, interpret: bool = False):
    """Per-bin (max |R|^2, arg lag) of ``R = W @ [Gr; Gi]``.

    ``ws1``/``ws2``: (K, 2B) stacked synthesis weights; ``g_re``/``g_im``:
    (B, M) segment-correlation planes.  Returns ((K,), (K,)) —
    unnormalized values (global 1/M^2 scale is argmax-irrelevant).
    """
    k, b2 = ws1.shape
    m = g_re.shape[-1]
    if m % TILE_M:
        raise ValueError(f"lag axis {m} not a multiple of {TILE_M}")
    pad = (-k) % ROW_PAD
    if pad:
        ws1 = jnp.pad(ws1, ((0, pad), (0, 0)))
        ws2 = jnp.pad(ws2, ((0, pad), (0, 0)))
    kp = k + pad
    gs = jnp.concatenate([g_re, g_im], axis=0)      # (2B, M)

    full = lambda shape: pl.BlockSpec(
        shape, lambda j: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    vals, idxs = pl.pallas_call(
        _synth_rank_kernel,
        grid=(m // TILE_M,),
        in_specs=[
            full((kp, b2)), full((kp, b2)),
            pl.BlockSpec((b2, TILE_M), lambda j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((kp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, 1), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kp, 1), jnp.float32),
            jax.ShapeDtypeStruct((kp, 1), jnp.int32),
        ),
        interpret=interpret,
    )(ws1, ws2, gs)
    return vals[:k, 0], idxs[:k, 0]


def _batched_synth_rank_kernel(ws1_ref, ws2_ref, co_ref, vals_ref,
                               idxs_ref, gs_ref, vacc_ref, iacc_ref, *,
                               num_blocks: int, group: int, tile: int,
                               num_chunks: int, num_lags: int):
    """One program = one pair: staircase-extract + synthesize + rank.

    ``co_ref`` holds the pair's segment-correlation planes in
    super-block-aligned layout: row ``b`` (< B: real; >= B: imag) of a
    needle block inside super-block ``s = b // group`` carries
    ``G[b, tau]`` at column ``s*128 + tau`` — the extraction offsets are
    all 128-lane-aligned, so the per-chunk gather is ``2*n_super``
    cheap aligned copies into the ``gs`` scratch, after which synthesis
    is two dense MXU matmuls whose |.|^2 + per-bin max epilogue never
    leaves VMEM.
    """
    b = num_blocks
    n_super = b // group
    for c in range(num_chunks):
        coff = c * tile
        for s in range(n_super):
            r0 = s * group
            src = s * 128 + coff
            gs_ref[r0:r0 + group, :] = co_ref[0, r0:r0 + group,
                                              src:src + tile]
            gs_ref[b + r0:b + r0 + group, :] = co_ref[
                0, b + r0:b + r0 + group, src:src + tile]
        gs = gs_ref[:]
        rr = jnp.dot(ws1_ref[:], gs, preferred_element_type=jnp.float32)
        ri = jnp.dot(ws2_ref[:], gs, preferred_element_type=jnp.float32)
        mag2 = rr * rr + ri * ri                        # (Kp, tile)
        kp = mag2.shape[0]
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (kp, tile), 1) + coff
        mag2 = jnp.where(col_iota < num_lags, mag2, -1.0)
        colmax = jnp.max(mag2, axis=1, keepdims=True)   # (Kp, 1)
        colarg = jnp.min(jnp.where(mag2 >= colmax, col_iota, _BIG_IDX),
                         axis=1, keepdims=True)
        if c == 0:
            vacc_ref[:] = colmax
            iacc_ref[:] = colarg
        else:
            prev = vacc_ref[:]
            take = colmax > prev
            vacc_ref[:] = jnp.where(take, colmax, prev)
            iacc_ref[:] = jnp.where(take, colarg, iacc_ref[:])
    # The (Kp, P) outputs are one shared revisited block; each program
    # lands its pair's column via a lane-masked read-modify-write
    # (lane-1 output blocks and unaligned lane-dynamic stores are both
    # unlowerable; a full-width select is cheap VPU work).
    pid = pl.program_id(0)
    kp, p = vals_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (kp, p), 1)
    mine = lane == pid
    vals_ref[:] = jnp.where(mine, vacc_ref[:], vals_ref[:])
    idxs_ref[:] = jnp.where(mine, iacc_ref[:], idxs_ref[:])


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "group", "num_lags", "interpret"))
def batched_synth_rank(ws1, ws2, conv_out, num_blocks: int, group: int,
                       num_lags: int, interpret: bool = False):
    """Per-(pair, bin) (max |R|^2, arg lag) over a batch of pairs.

    ``conv_out``: (P, 2B, L) bf16 segment correlations in staircase
    layout (see :func:`_batched_synth_rank_kernel`); ``ws1``/``ws2``:
    (K, 2B) stacked synthesis weights shared by every pair.  Returns
    ((K, P) values, (K, P) lag indices).  The (K, P*M) synthesized
    surface exists only tile-by-tile in VMEM — at the config-2 shape
    that is ~1.7 GB of HBM traffic the XLA path cannot avoid.
    """
    k, b2 = ws1.shape
    p, rows, span = conv_out.shape
    if rows != b2:
        raise ValueError(f"conv rows {rows} != stacked blocks {b2}")
    pad = (-k) % ROW_PAD
    if pad:
        ws1 = jnp.pad(ws1, ((0, pad), (0, 0)))
        ws2 = jnp.pad(ws2, ((0, pad), (0, 0)))
    kp = k + pad
    m_pad = -(-num_lags // TILE_M) * TILE_M
    num_chunks = m_pad // TILE_M
    kernel = functools.partial(
        _batched_synth_rank_kernel, num_blocks=b2 // 2,
        group=group, tile=TILE_M, num_chunks=num_chunks,
        num_lags=num_lags)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            full((kp, b2)), full((kp, b2)),
            pl.BlockSpec((1, rows, span), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((kp, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kp, p), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((kp, p), jnp.float32),
            jax.ShapeDtypeStruct((kp, p), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((b2, TILE_M), conv_out.dtype),
            pltpu.VMEM((kp, 1), jnp.float32),
            pltpu.VMEM((kp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(ws1.astype(conv_out.dtype), ws2.astype(conv_out.dtype), conv_out)
    return vals[:k], idxs[:k]


def stein_synthesis_weights(freqs_hz, sample_rate, num_blocks: int,
                            block_len: int):
    """(ws1, ws2) = ([Wr | -Wi], [Wi | Wr]) for the fused kernel."""
    centers = jnp.asarray(
        np.arange(num_blocks) * block_len + (block_len - 1) / 2.0,
        jnp.float32)
    w = ((-2.0 * jnp.pi) / jnp.float32(sample_rate)) * jnp.outer(
        jnp.asarray(freqs_hz, jnp.float32), centers)
    wr, wi = jnp.cos(w), jnp.sin(w)
    return (jnp.concatenate([wr, -wi], axis=1),
            jnp.concatenate([wi, wr], axis=1))
