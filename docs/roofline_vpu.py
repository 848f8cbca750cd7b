#!/usr/bin/env python3
"""VPU roofline for the fused kernel's |R|^2/max epilogue.

ARCHITECTURE §7 establishes the single-pair fused Stein kernel is
VPU-bound: ~14 us of |R|^2 + running-max epilogue vs ~11 us of MXU per
headline surface, and further tile-size/copy levers measured flat.
This script measures what that epilogue's op mix CAN run at on this
chip — a microkernel with the identical per-tile sequence
(mul, fma, elementwise max over (K_pad, FUSED_TILE) f32 blocks,
one lane reduction at the end) on VMEM-resident data with no MXU work
and no per-iteration HBM traffic — and prints the production epilogue's
fraction of that measured ceiling.

Method: one Pallas program fills a (K_pad, M) f32 scratch from iota
(once), then loops the epilogue REPEAT times over its 16 lag tiles;
the program is chained via lax.scan exactly like bench.py and the
1-iteration chain time is subtracted.  Ops counted: 3 VPU ops/element
(mul, fma, max) x K_pad x M x REPEAT.

Output: one JSON line {vpu_ops_per_s, epilogue_floor_us, ...} and a
human summary on stderr.  The committed numbers feed ARCHITECTURE
"VPU roofline" and README.
"""

import functools
import json
import sys
import time

import numpy as np

KP = 416          # the headline kernel's padded bin count (400 -> 416)
M = 8192          # headline lag count
TILE = 512        # FUSED_TILE
REPEAT = 64       # epilogue sweeps per program (amortizes the fill)
ITERS = 32        # chained programs per measurement
OPS_PER_ELEM = 3  # mul (rr*rr), fma (+ri*ri), max


def main() -> None:
    sys.path.insert(0, ".")
    from bench import _require_device

    _require_device()

    import jax
    import jax.numpy as jnp
    from jax import lax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    device = jax.devices()[0]
    on_tpu = device.platform != "cpu"
    print(f"device: {device.platform} ({device.device_kind})",
          file=sys.stderr)

    def kern(seed_ref, out_ref, x_ref, y_ref, vacc_ref):
        # One-time fill from iota + the seed scalar (keeps the data
        # run-dependent so nothing constant-folds).  Tile-sized iotas:
        # Mosaic rejects a full-width (KP, M) f32 iota.
        s = seed_ref[0]
        nchunks = M // TILE
        rowt = jax.lax.broadcasted_iota(
            jnp.int32, (KP, TILE), 0).astype(jnp.float32)
        colt = jax.lax.broadcasted_iota(
            jnp.int32, (KP, TILE), 1).astype(jnp.float32)
        for c in range(nchunks):
            sl = slice(c * TILE, (c + 1) * TILE)
            x_ref[:, sl] = rowt * 1e-3 + (colt + c * TILE) * 1e-6 + s
            y_ref[:, sl] = (colt + c * TILE) * 1e-3 - rowt * 1e-6 + s
        for r in range(REPEAT):
            for c in range(nchunks):
                rr = x_ref[:, c * TILE:(c + 1) * TILE]
                ri = y_ref[:, c * TILE:(c + 1) * TILE]
                mag2 = rr * rr + ri * ri
                if r == 0 and c == 0:
                    vacc_ref[:] = mag2
                else:
                    vacc_ref[:] = jnp.maximum(mag2, vacc_ref[:])
        out_ref[:] = jnp.max(vacc_ref[:], axis=1, keepdims=True)

    @jax.jit
    def epilogue(seed):
        return pl.pallas_call(
            kern,
            out_shape=jax.ShapeDtypeStruct((KP, 1), jnp.float32),
            scratch_shapes=[pltpu.VMEM((KP, M), jnp.float32),
                            pltpu.VMEM((KP, M), jnp.float32),
                            pltpu.VMEM((KP, TILE), jnp.float32)],
            interpret=not on_tpu,
        )(seed)

    @functools.partial(jax.jit, static_argnames=("k",))
    def chain(seed, k):
        def step(carry, _):
            out = epilogue(carry)
            return carry + out[0, :] * 1e-30, None

        c, _ = lax.scan(step, seed, None, length=k)
        return c

    seed = jnp.zeros((1,), jnp.float32)

    def timed(k):
        float(jnp.sum(chain(seed, k)))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            float(jnp.sum(chain(seed, k)))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    iters = ITERS if on_tpu else 1
    per_program_ms = (timed(1 + iters) - timed(1)) / iters
    elems = KP * M
    total_ops = elems * OPS_PER_ELEM * REPEAT
    # The fill (2x ~4 cheap ops/elem, once) rides inside the program;
    # subtract its share by charging it as 8/(3*REPEAT) of the loop.
    fill_share = 8.0 / (OPS_PER_ELEM * REPEAT)
    loop_ms = per_program_ms / (1.0 + fill_share)
    ops_per_s = total_ops / (loop_ms * 1e-3)
    floor_us = elems * OPS_PER_ELEM / ops_per_s * 1e6
    print(f"program {per_program_ms:.3f} ms for {REPEAT} epilogue "
          f"sweeps -> {ops_per_s / 1e12:.3f} T f32-VPU-ops/s; one "
          f"headline epilogue floor = {floor_us:.1f} us",
          file=sys.stderr)
    print(json.dumps({
        "metric": "vpu_epilogue_roofline",
        "vpu_tops_f32": round(ops_per_s / 1e12, 3),
        "epilogue_floor_us": round(floor_us, 2),
        "shape": f"{KP}x{M} f32, tile {TILE}, {OPS_PER_ELEM} ops/elem",
        "device": str(device.device_kind),
    }))


if __name__ == "__main__":
    main()
