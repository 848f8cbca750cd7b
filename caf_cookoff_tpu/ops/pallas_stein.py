"""Fully fused Stein pipeline kernel (stage A + synthesis + rank).

The XLA Stein path materializes the segment correlations ``G`` and the
synthesized rows ``R = W @ G`` ((2K, M) float32, ~26 MB at the
reference shape) in HBM; :func:`fused_stein_rank` keeps EVERYTHING
pair-sized in VMEM.  Per pair (one grid program):

1. **Stage A** — segment correlations as a direct MXU dot: Hankel rows
   (shifted copies of the ~100 KB haystack extension) are built in
   scratch slab-wise and contracted against the stacked needle-tap
   operator, (2B, 2*D) x (2*D, span) — no FFTs at all (direct
   D-tap correlation beats any transform at D <= 128).
2. **Per-block staircase un-shear** into a lane-contiguous G buffer
   (one row copy per block; Mosaic handles the 64-aligned offsets).
3. **Synthesis + rank** — per lag tile, the two stacked split-complex
   matmuls

       Rr = [Wr | -Wi] @ [Gr; Gi]        ws1 (K, 2B) @ gs (2B, tile)
       Ri = [Wi |  Wr] @ [Gr; Gi]        ws2 (K, 2B) @ gs (2B, tile)

   with the |.|^2 / per-bin-max epilogue folded in VMEM; only (K,)
   values (and optionally lag indices) reach HBM.

Layout note (round-2 optimization): the original design grouped blocks
into 128-sample super-blocks so every staircase offset was lane-tile
aligned — at the cost of zero-padding each operator row to 128 taps
(HALF the stage-A MACs multiplied structural zeros at D = 64) and a
16-row slab build over the padded width.  The per-block staircase
(block ``b``'s correlations land at column ``b*D + tau``) drops the
zeros entirely: stage A is a dense depth-2D dot, the Hankel scratch
halves, and the un-shear becomes one row copy per block — measured
cheap (sub-microsecond granularity deltas) since same-sublane row
copies need no sublane rotation.

Exactness comes from the engines' top-k re-score (rank-then-score);
the kernel itself runs at bf16 MXU rate.  Measured v5e standings are
in README.md's round-2 tables."""

from __future__ import annotations

import functools
import os

# Experiment knob (timing only — output is garbage): skip the in-kernel
# Hankel build to isolate its cost from the MXU dots.
_SKIP_HANKEL = bool(os.environ.get("CAF_TPU_SKIP_HANKEL"))
# Experiment knob (output identical): stage B as ONE concatenated
# [ws1; ws2] @ gs dot per lag tile instead of two half-height dots —
# fewer, taller MXU ops.  See ARCHITECTURE §10 for the measurement.
_STAGEB_CAT = bool(os.environ.get("CAF_TPU_STAGEB_CAT"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from caf_cookoff_tpu.errors import VmemBudgetError

_BIG_IDX = np.int32(2**30)

ROW_PAD = 16    # K padded to a multiple of this (bf16 sublane tile; the
                # old 128 wasted 28% of stage B at the K=400 grid)
SUPER = 128     # lane tile: h_ext padding + stage-A chunk quantum
FUSED_TILE = 512  # stage-B lag tile (512 lanes x K-padded rows ~2 MB;
                  # 1024/2048 measured identical on the headline shape,
                  # so the loop trip count is not a cost)
_SEED_ROWS = 16  # bf16 sublane tile: Hankel rows are built 16 at a time


def _fused_stein_kernel(*refs, num_blocks: int,
                        sup: int, tile: int, num_chunks: int,
                        num_lags: int, span: int, a_chunks: int,
                        want_idxs: bool, dyn_valid: bool,
                        want_top2: bool = False, sep: int = 0):
    """One program = one pair, the ENTIRE Stein pipeline in VMEM.

    Stage A builds the Hankel operator rows (shifted copies of the
    ~100 KB haystack extension — the only HBM read that scales with M)
    in scratch and computes ALL segment correlations with one stacked
    (2B, 2*D) x (2*D, span) MXU dot per column chunk.  The Hankel
    build is slab-wise: ``sr`` seed rows (consecutive single-sample
    shifts), then every further ``sr``-row slab is a lane-shifted copy
    of the seed.  The per-block staircase is then un-sheared ONCE into
    a contiguous G buffer (row ``b`` reads columns ``b*D + tau``), and
    stage B is contiguous synthesis + |.|^2/per-bin-max over G tiles.
    Nothing pair-sized ever touches HBM: the XLA grouped-conv stage A
    this replaces measured 53.6 ms for 64 pairs.
    ``want_idxs=False`` (the rank-then-score path, where the refine
    stage re-derives the lag) skips the per-bin argmax pass.
    ``dyn_valid`` adds a per-program lag bound (SMEM scalar): the
    per-bin (max, argmax) contract means out-of-range lags CANNOT be
    masked after the kernel — a strong correlation past the bound
    would shadow the same bin's in-range peak and the whole bin would
    then be dropped — so the bound must cut inside the scan itself.
    """
    vals2_ref = idxs2_ref = None
    if want_top2:
        # Top-2-separated mode: the elementwise accumulator cannot hold
        # two same-bin lags (two tiles' maxima landing on one lane
        # position collapse), so each tile reduces to its per-bin
        # (max, argmax) plus a >=sep-separated second, and the 2
        # running + 2 tile candidates merge greedily — exact for two
        # emitters anywhere in the window with |lag1-lag2| > sep.
        if dyn_valid:
            (ws1_ref, ws2_ref, l_ref, h_ref, nl_ref, vals_ref, idxs_ref,
             vals2_ref, idxs2_ref, co_ref, hank_ref, seed_ref, g_ref,
             vtop_ref, ltop_ref) = refs
        else:
            (ws1_ref, ws2_ref, l_ref, h_ref, vals_ref, idxs_ref,
             vals2_ref, idxs2_ref, co_ref, hank_ref, seed_ref, g_ref,
             vtop_ref, ltop_ref) = refs
        vacc_ref = iacc_ref = None
    elif dyn_valid:
        (ws1_ref, ws2_ref, l_ref, h_ref, nl_ref, vals_ref, idxs_ref,
         co_ref, hank_ref, seed_ref, g_ref, vacc_ref, iacc_ref) = refs
    else:
        (ws1_ref, ws2_ref, l_ref, h_ref, vals_ref, idxs_ref,
         co_ref, hank_ref, seed_ref, g_ref, vacc_ref, iacc_ref) = refs
    cdtype = co_ref.dtype
    a_w = span // a_chunks
    sr = min(_SEED_ROWS, sup)
    # Valid seed width: slab k reads seed cols [sr*k, sr*k + a_w), max
    # start sr*(sup//sr - 1) = sup - sr — so the last seed row's read
    # ends exactly at h_ext's final needed sample (span + sup - 2).
    wv = a_w + sup - sr
    def build(a, buf):
        c0 = a * a_w
        for plane in range(2):
            base = plane * sup
            for r in range(sr):
                seed_ref[buf, r, :wv] = h_ref[0, plane,
                                              c0 + r:c0 + r + wv
                                              ].astype(cdtype)
            for k in range(sup // sr):
                hank_ref[buf, base + sr * k:base + sr * (k + 1), :] = \
                    seed_ref[buf, :, sr * k:sr * k + a_w]

    # Double-buffered build: chunk a+1's Hankel rows are VPU work with
    # no dependency on chunk a's MXU dot, so building into the other
    # buffer before the dot lets the VLIW scheduler overlap them
    # (single-buffered, build -> dot -> build serializes on hank_ref).
    if not _SKIP_HANKEL:
        build(0, 0)
    for a in range(a_chunks):
        if not _SKIP_HANKEL and a + 1 < a_chunks:
            build(a + 1, (a + 1) % 2)
        z = jnp.dot(l_ref[0], hank_ref[a % 2],
                    preferred_element_type=jnp.float32)
        co_ref[:, a * a_w:(a + 1) * a_w] = z.astype(cdtype)

    b = num_blocks
    m_pad = num_chunks * tile
    for blk in range(b):
        src = blk * sup
        g_ref[blk:blk + 1, :] = co_ref[blk:blk + 1, src:src + m_pad]
        g_ref[b + blk:b + blk + 1, :] = co_ref[b + blk:b + blk + 1,
                                               src:src + m_pad]
    # Lane reductions (jnp.max/min over axis 1) cost several VPU passes
    # each; doing one per lag tile made the epilogue the kernel's
    # largest cost.  Instead accumulate a running ELEMENTWISE max (and,
    # when lags are wanted, the earliest winning tile id) in a
    # (kp, tile) scratch — one or three cheap passes per tile — and
    # reduce across lanes exactly once at the end.  Tie-break is
    # unchanged: per lane position the strict ``>`` keeps the earliest
    # tile, and any lag in an earlier tile precedes every lag in a
    # later one, so "min encoded lag among the maxima" is still the
    # global minimum lag.
    wcat = (jnp.concatenate([ws1_ref[:], ws2_ref[:]], axis=0)
            if _STAGEB_CAT else None)
    for c in range(num_chunks):
        coff = c * tile
        gs = g_ref[:, coff:coff + tile]
        if _STAGEB_CAT:
            z = jnp.dot(wcat, gs, preferred_element_type=jnp.float32)
            half = z.shape[0] // 2
            rr, ri = z[:half], z[half:]
        else:
            rr = jnp.dot(ws1_ref[:], gs,
                         preferred_element_type=jnp.float32)
            ri = jnp.dot(ws2_ref[:], gs,
                         preferred_element_type=jnp.float32)
        mag2 = rr * rr + ri * ri
        kp = mag2.shape[0]
        if dyn_valid:
            col_iota = jax.lax.broadcasted_iota(
                jnp.int32, (kp, tile), 1) + coff
            mag2 = jnp.where(col_iota < nl_ref[pl.program_id(0)],
                             mag2, -1.0)
        elif coff + tile > num_lags:            # only the tail tile masks
            col_iota = jax.lax.broadcasted_iota(
                jnp.int32, (kp, tile), 1) + coff
            mag2 = jnp.where(col_iota < num_lags, mag2, -1.0)
        if want_top2:
            lag_t = jax.lax.broadcasted_iota(
                jnp.int32, (kp, tile), 1) + coff
            m1 = jnp.max(mag2, axis=1, keepdims=True)
            a1 = jnp.min(jnp.where(mag2 >= m1, lag_t, _BIG_IDX),
                         axis=1, keepdims=True)
            masked = jnp.where(jnp.abs(lag_t - a1) <= sep, -1.0, mag2)
            m2 = jnp.max(masked, axis=1, keepdims=True)
            a2 = jnp.min(jnp.where(masked >= m2, lag_t, _BIG_IDX),
                         axis=1, keepdims=True)
            if c == 0:
                vtop_ref[:] = jnp.concatenate([m1, m2], axis=1)
                ltop_ref[:] = jnp.concatenate([a1, a2], axis=1)
            else:
                # Greedy top-2-separated of {carry1, carry2, m1, m2}.
                v4 = jnp.concatenate([vtop_ref[:], m1, m2], axis=1)
                l4 = jnp.concatenate([ltop_ref[:], a1, a2], axis=1)
                v1 = jnp.max(v4, axis=1, keepdims=True)
                l1 = jnp.min(jnp.where(v4 >= v1, l4, _BIG_IDX),
                             axis=1, keepdims=True)
                vm = jnp.where(jnp.abs(l4 - l1) <= sep, -1.0, v4)
                v2 = jnp.max(vm, axis=1, keepdims=True)
                l2 = jnp.min(jnp.where(vm >= v2, l4, _BIG_IDX),
                             axis=1, keepdims=True)
                vtop_ref[:] = jnp.concatenate([v1, v2], axis=1)
                ltop_ref[:] = jnp.concatenate([l1, l2], axis=1)
            continue
        if c == 0:
            vacc_ref[:] = mag2
            if want_idxs:
                iacc_ref[:] = jnp.zeros_like(iacc_ref)
        elif want_idxs:
            prev = vacc_ref[:]
            take = mag2 > prev
            vacc_ref[:] = jnp.where(take, mag2, prev)
            iacc_ref[:] = jnp.where(take, jnp.int32(c), iacc_ref[:])
        else:
            vacc_ref[:] = jnp.maximum(mag2, vacc_ref[:])
    pid = pl.program_id(0)
    kp, p = vals_ref.shape
    lane = jax.lax.broadcasted_iota(jnp.int32, (kp, p), 1)
    mine = lane == pid
    if want_top2:
        vt = vtop_ref[:]
        lt = ltop_ref[:]
        lt = jnp.where(lt == _BIG_IDX, 0, lt)    # sentinel lag -> 0
        vals_ref[:] = jnp.where(mine, vt[:, 0:1], vals_ref[:])
        idxs_ref[:] = jnp.where(mine, lt[:, 0:1], idxs_ref[:])
        vals2_ref[:] = jnp.where(mine, vt[:, 1:2], vals2_ref[:])
        idxs2_ref[:] = jnp.where(mine, lt[:, 1:2], idxs2_ref[:])
        return
    macc = vacc_ref[:]
    colmax = jnp.max(macc, axis=1, keepdims=True)
    if want_idxs:
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (kp, tile), 1)
        lag = iacc_ref[:] * tile + lane_i
        colarg = jnp.min(jnp.where(macc >= colmax, lag, _BIG_IDX),
                         axis=1, keepdims=True)
    else:
        colarg = jnp.zeros((kp, 1), jnp.int32)
    vals_ref[:] = jnp.where(mine, colmax, vals_ref[:])
    idxs_ref[:] = jnp.where(mine, colarg, idxs_ref[:])


def fused_span(num_blocks: int, sup: int, num_lags: int,
               a_chunks: int = 4) -> int:
    """Column span of the per-block staircase layout (block ``b`` at
    column ``b*sup``), padded so stage-A chunks stay lane-aligned:
    callers size the haystack extension to ``span + SUPER - 1``
    samples (the kernel reads at most ``span + sup - 1``)."""
    m_pad = -(-num_lags // FUSED_TILE) * FUSED_TILE
    span = (num_blocks - 1) * sup + m_pad
    quantum = a_chunks * SUPER
    return -(-span // quantum) * quantum


def _vmem_demand(b2: int, span: int, sup: int, sr: int, m_pad: int,
                 kp: int, p: int, a_chunks: int, want_idxs: bool) -> int:
    """Scoped-VMEM budget for one ``fused_stein_rank`` program (bytes).

    Sums the bf16 scratch buffers (co staircase + Hankel chunk + seed +
    G), the resident ws1/ws2 operands, the double-buffered per-program
    operand blocks (lmat row, haystack extension), and the whole-output
    blocks, then adds 8 MB + 20% headroom for Mosaic's spills.
    """
    scratch = 2 * (b2 * span                           # co staircase
                   + 2 * 2 * sup * (span // a_chunks)  # Hankel x2 bufs
                   + 2 * sr * (span // a_chunks + sup)  # seed x2 bufs
                   + b2 * m_pad)                       # G (synthesis input)
    resident = 2 * 2 * kp * b2                      # ws1 + ws2 (bf16)
    blocks = 2 * (2 * b2 * 2 * sup                  # lmat row (bf16)
                  + 4 * 2 * (span + SUPER - 1))     # h_ext (f32)
    acc = kp * FUSED_TILE * (8 if want_idxs else 4)  # max (+tile-id) accums
    outs = kp * p * 8 + acc                          # vals+idxs outputs
    # Mosaic's register-allocator stack slots for the epilogue scale
    # with the accumulators, not just hold them: measured on v5e at
    # kp=928 (53.6 MB total) and kp=2754 (148.3 MB total, rejected by
    # the chip), the spill slots run ~12x the accumulator footprint —
    # the per-chunk where(take) triples appear to keep several unrolled
    # copies live.  Model it so tall-row shapes (the rate engine's
    # (rate, bin) synthesis rows) raise the budget or fail HERE with an
    # actionable message instead of the compiler's scoped-OOM.
    spill = 12 * acc
    est = scratch + resident + blocks + outs + spill
    # The 48 MB floor predates the (kp, tile) accumulators (every
    # pre-accumulator shape fit under it) — they ride on top of it.
    limit = max(48 * 1024 * 1024 + acc, est + est // 5 + (8 << 20))
    if limit > 100 * 1024 * 1024:
        # Borderline clamp: the spill model over-estimates some tall
        # shapes (measured: kp=2048 want_top2, modeled ~112 MB, RAN
        # under a 100 MB cap) — grant those the full 100 MB and let
        # Mosaic allocate; only estimates far past the chip's budget
        # fail here with the actionable message (kp=2754 single-max
        # measured 148 MB actual — genuinely impossible).
        if est <= 110 * 1024 * 1024:
            return 100 * 1024 * 1024
        raise VmemBudgetError(
            f"fused Stein kernel needs ~{est / 2**20:.0f} MB of VMEM "
            f"(block_len={sup}, span={span}, {b2 // 2} blocks) — past "
            "the chip's budget; use a larger block_len (fewer, wider "
            "blocks) or the scan/matmul path for this shape")
    return limit


@functools.partial(
    jax.jit,
    static_argnames=("num_blocks", "sup", "num_lags", "interpret",
                     "a_chunks", "want_idxs", "windows", "share_h",
                     "want_top2", "sep"))
def fused_stein_rank(ws1, ws2, lmat, h_ext, num_blocks: int, sup: int,
                     num_lags: int, interpret: bool = False,
                     a_chunks: int = 4, want_idxs: bool = True,
                     windows: int = 1, share_h: int = 1,
                     num_valid=None, want_top2: bool = False,
                     sep: int = 0):
    """Per-(pair, bin) (max |R|^2, arg lag) — fully fused batch engine.

    ``lmat``: (P, 2B, 2*sup) dense needle-tap operator (Gr rows then
    Gi rows; see models/batched_stein.py), ``sup`` = block length;
    ``h_ext``: (P*windows, 2, span+127) haystack extensions; ``ws1``/
    ``ws2``: (K, 2B) synthesis weights.  Returns ((K, P*windows)
    values, (K, P*windows) lag indices — zeros when
    ``want_idxs=False``, the rank-then-score path where the refine
    stage re-derives lags and the argmax pass is dead weight).

    ``windows > 1`` is the long-capture mode: each pair contributes
    ``windows`` consecutive overlap-save lag windows as separate grid
    programs, all sharing the pair's needle operator (program ``i``
    reads ``lmat[i // windows]``); lag indices are window-local.
    ``share_h > 1`` is the dual (banded mode): ``share_h`` consecutive
    programs (one per band) share one haystack slice with distinct
    needle operators — no HBM duplication of the capture per band.
    The two COMPOSE (banded long captures): programs run band-major,
    ``i = ((pair*S + band)*W + w)`` with ``S = share_h``, ``W =
    windows``; ``lmat`` has one entry per (pair, band) and ``h_ext``
    one slice per (pair, window), so program ``i`` reads
    ``lmat[i // W]`` and ``h_ext[(i // (S*W))*W + i % W]`` (which
    degenerates to the two single-mode maps when the other factor
    is 1).

    ``num_valid`` (optional, traced (P_eff,) int32) bounds the scanned
    lag range PER PROGRAM — required whenever real samples exist past
    a program's lag range (an explicit total-lag cap cutting into the
    final overlap-save window, or a zero-padded short streaming
    chunk): the per-bin (max, argmax) cannot be masked afterwards
    without dropping the bin's in-range peak along with the
    out-of-range shadow.

    ``want_top2=True`` (requires ``sep``, the minimum lag separation in
    samples) returns per-bin top-TWO lag candidates: ``(vals, idxs,
    vals2, idxs2)``, where slot 2 carries the strongest lag at least
    ``sep`` samples from slot 1's (value ``-1.0`` when no second
    candidate exists) — the same-doppler-bin multi-emitter mode the
    streaming lattice uses.

    Guarantee: EXACT for two emitters anywhere in the window with
    ``|lag1 - lag2| > 2 * sep``.  Proof sketch: the global max p1
    always survives (every tile's top enters the merge).  The true
    second p2 is its own tile's top unless that tile's top m is a
    stronger candidate — m > p2 at >= sep from p1 would contradict p2
    being the best valid second, so m must be p1's mainlobe skirt
    within ``sep`` of p1; p2 masked by m then implies
    ``|p2 - p1| <= |p2 - m| + |m - p1| <= 2 * sep``.  Pairs separated
    by (sep, 2*sep] — under one exclusion cell of guard — can
    therefore lose the weaker to a tile-boundary skirt; that regime
    (and a third same-bin emitter in one window) needs the XLA
    streaming lattice path.
    """
    k, b2 = ws1.shape
    p_eff = max(h_ext.shape[0] * share_h, lmat.shape[0] * windows)
    if lmat.shape[0] * windows != h_ext.shape[0] * share_h:
        raise ValueError(
            f"{lmat.shape[0]} operators x {windows} windows != "
            f"{h_ext.shape[0]} h_ext slices x {share_h} bands")
    if lmat.shape[2] != 2 * sup:
        raise ValueError(
            f"operator width {lmat.shape[2]} != 2*block_len {2 * sup}")
    pad = (-k) % ROW_PAD
    if pad:
        ws1 = jnp.pad(ws1, ((0, pad), (0, 0)))
        ws2 = jnp.pad(ws2, ((0, pad), (0, 0)))
    kp = k + pad
    span = fused_span(num_blocks, sup, num_lags, a_chunks)
    if h_ext.shape[1:] != (2, span + SUPER - 1):
        raise ValueError(f"h_ext shape {h_ext.shape} != "
                         f"(*, 2, {span + SUPER - 1})")
    m_pad = -(-num_lags // FUSED_TILE) * FUSED_TILE
    dyn_valid = num_valid is not None
    if want_top2:
        want_idxs = True
    kernel = functools.partial(
        _fused_stein_kernel, num_blocks=num_blocks, sup=sup,
        tile=FUSED_TILE, num_chunks=m_pad // FUSED_TILE,
        num_lags=num_lags, span=span, a_chunks=a_chunks,
        want_idxs=want_idxs, dyn_valid=dyn_valid,
        want_top2=want_top2, sep=int(sep))
    cdtype = jnp.bfloat16
    p = p_eff
    sr = min(_SEED_ROWS, sup)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    in_specs = [
        full((kp, b2)), full((kp, b2)),
        pl.BlockSpec((1, b2, 2 * sup),
                     lambda i: (i // windows, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, span + SUPER - 1),
                     lambda i: ((i // (share_h * windows)) * windows
                                + i % windows, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [ws1.astype(cdtype), ws2.astype(cdtype),
                lmat.astype(cdtype), h_ext]
    if dyn_valid:
        num_valid = jnp.asarray(num_valid, jnp.int32)
        if num_valid.shape != (p_eff,):
            raise ValueError(
                f"num_valid shape {num_valid.shape} != ({p_eff},)")
        # Whole-array SMEM block (Mosaic restricts partial blocks to
        # tiling-aligned shapes, which a (1,)-slice of a general
        # program count violates); the kernel indexes by program id.
        in_specs.append(pl.BlockSpec((p_eff,), lambda i: (0,),
                                     memory_space=pltpu.SMEM))
        operands.append(num_valid)
    out_spec = pl.BlockSpec((kp, p), lambda i: (0, 0),
                            memory_space=pltpu.VMEM)
    out_dtypes = [jnp.float32, jnp.int32] * (2 if want_top2 else 1)
    n_outs = len(out_dtypes)
    if want_top2:
        # (kp, 2) running (top1, top2) value/lag carries replace the
        # elementwise accumulators.
        acc_scratch = [pltpu.VMEM((kp, 2), jnp.float32),
                       pltpu.VMEM((kp, 2), jnp.int32)]
    else:
        acc_scratch = [
            pltpu.VMEM((kp, FUSED_TILE), jnp.float32),
            pltpu.VMEM((kp, FUSED_TILE if want_idxs else 1), jnp.int32)]
    outs = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=in_specs,
        out_specs=tuple(out_spec for _ in range(n_outs)),
        out_shape=tuple(jax.ShapeDtypeStruct((kp, p), dt)
                        for dt in out_dtypes),
        scratch_shapes=[
            pltpu.VMEM((b2, span), cdtype),
            pltpu.VMEM((2, 2 * sup, span // a_chunks), cdtype),
            pltpu.VMEM((2, sr, span // a_chunks + sup), cdtype),
            pltpu.VMEM((b2, m_pad), cdtype),
        ] + acc_scratch,
        # The default scoped-VMEM budget (16 MB) is far under what the
        # co/G scratch needs, and small block lengths double the
        # block-count rows (b2 = 2N/sup) — so size the limit from the
        # actual demand: resident scratch + pipelined operand blocks +
        # outputs, plus headroom for Mosaic's unrolled-loop temporaries
        # (measured ~7 MB at the 42 MB point), floored at the 48 MB that
        # every previously-shipped shape fit in.  ``_vmem_demand``
        # raises past 100 MB (of the chip's 128 MB) with a usable
        # message instead of the compiler's scoped-OOM.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_demand(
                b2, span, sup, sr, m_pad, kp, p, a_chunks, want_idxs)),
        interpret=interpret,
    )(*operands)
    if want_top2:
        vals, idxs, vals2, idxs2 = outs
        return vals[:k], idxs[:k], vals2[:k], idxs2[:k]
    vals, idxs = outs
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


def stein_rate_synthesis_weights(freqs_hz, rates_hz_per_s, sample_rate,
                                 num_blocks: int, block_len: int):
    """(ws1, ws2) with the RATE axis folded into synthesis rows.

    The dechirp quadratic phase ``pi*r*(t/fs)^2`` is block-center
    constant to the same tolerance as the doppler phase (its
    within-block drift is a frequency of ``r * t_b / fs`` Hz — callers
    must fold ``|r|_max * T`` into the block-length envelope), so a
    trial rate is just a different phase at each block center:

        w[i*K + k, b] = -(2*pi*f_k*t_b + pi*r_i*t_b^2),  t_b in seconds

    (rate-major rows).  Stage A (the segment correlations) is shared by
    EVERY (rate, doppler) pair — the rate axis costs synthesis rows,
    not transforms, which is what de-serializes the round-4 scan
    (``models/rate._rate_os_peak_jit``: R x full block scans).
    """
    tb = jnp.asarray(
        np.arange(num_blocks) * block_len + (block_len - 1) / 2.0,
        jnp.float32) / jnp.asarray(sample_rate, jnp.float32)
    f = jnp.asarray(freqs_hz, jnp.float32)
    r = jnp.asarray(rates_hz_per_s, jnp.float32)
    w = -(2.0 * jnp.pi) * (f[None, :, None] * tb[None, None, :]) \
        - jnp.pi * (r[:, None, None] * (tb * tb)[None, None, :])
    w = w.reshape(-1, tb.shape[0])              # (R*K, B) rate-major
    wr, wi = jnp.cos(w), jnp.sin(w)
    return (jnp.concatenate([wr, -wi], axis=1),
            jnp.concatenate([wi, wr], axis=1))
