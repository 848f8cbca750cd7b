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
