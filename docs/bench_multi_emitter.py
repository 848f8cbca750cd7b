#!/usr/bin/env python3
"""Config-4-shape multi-emitter bench: fused lattice engine vs the XLA
lattice scan (VERDICT r4 item 1's measured-speedup artifact).

Workload: 16 pairs x 1024 bins x 32768 lags (BASELINE config 4,
"streaming multi-emitter"), num_peaks=3, two emitters injected per
pair.  Times the jitted cores of

* ``batched_stein_os_peaks``'s banded fused path
  (``_banded_stein_os_peaks_jit`` — this grid routes banded), and
* the XLA lattice scan (``overlap_save._os_peaks_batch_jit``, the
  round-4 fallback the fused path replaces),

with the chained-scan methodology of ``bench_configs.py`` (pairing a
chain(1) against a chain(1+iters), best-of-reps).  Both are
correctness-gated first (every pair's two emitters recovered).  Writes
``docs/multi_emitter_bench.json``.

Usage: python docs/bench_multi_emitter.py [--reps N] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

FS = 48_000.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (correctness path only; timings "
                    "meaningless)")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import bench_configs
    from caf_cookoff_tpu.models.batched_stein import (
        _banded_stein_os_peaks_jit,
        _rescore_guards,
        batched_stein_os_peaks,
    )
    from caf_cookoff_tpu.models.overlap_save import (
        _os_peaks_batch_jit,
        batched_overlap_save_peaks_local,
    )
    from caf_cookoff_tpu.models.stein import _plan_bands
    from caf_cookoff_tpu.ops.peak import resolve_exclusions
    from caf_cookoff_tpu.ops.splitfft import split_array

    bench_configs.REPS = args.reps
    pairs, n, lags, k, num_peaks = 16, 4096, 32768, 1024, 3
    rng = np.random.default_rng(2)
    needles = (rng.standard_normal((pairs, n))
               + 1j * rng.standard_normal((pairs, n))
               ).astype(np.complex64)
    hays = (1e-4 * (rng.standard_normal((pairs, lags + n))
                    + 1j * rng.standard_normal((pairs, lags + n))
                    )).astype(np.complex64)
    freqs_np = np.linspace(-500, 500, k,
                           endpoint=False).astype(np.float32)
    t = np.arange(n)
    emitters = []
    for b in range(pairs):
        rows = []
        for j, (lag, f_idx, amp) in enumerate((
                (777 + b * 1813, 61 * (b + 1), 1.0),
                (17000 + b * 911, 997 - 53 * b, 0.7))):
            f_hz = float(freqs_np[f_idx])
            hays[b, lag:lag + n] += (amp * needles[b] * np.exp(
                2j * np.pi * f_hz * t / FS)
            ).astype(np.complex64)[: lags + n - lag]
            rows.append((f_hz, lag))
        emitters.append(rows)

    # Correctness gates: both engines recover every pair's two emitters.
    fr, lg, vv = batched_stein_os_peaks(needles, hays, freqs_np, FS,
                                        num_peaks, num_lags=lags)
    for b in range(pairs):
        got = {(float(f), int(l))
               for f, l, v in zip(fr[b], lg[b], vv[b])
               if np.isfinite(float(v))}
        assert set(emitters[b]) <= got, (b, got, emitters[b])
    fr2, lg2, vv2 = batched_overlap_save_peaks_local(
        needles, hays, freqs_np, FS, num_peaks, num_lags=lags)
    for b in range(pairs):
        got = {(float(f), int(l))
               for f, l, v in zip(fr2[b], lg2[b], vv2[b])
               if np.isfinite(float(v))}
        assert set(emitters[b]) <= got, ("xla", b, got, emitters[b])
    print("correctness gates passed (fused + xla)", file=sys.stderr)

    ns = tuple(map(jnp.asarray, split_array(needles)))
    hs = tuple(map(jnp.asarray, split_array(hays)))
    m = 2 * n
    windows = -(-lags // m)
    interpret = jax.default_backend() == "cpu"
    plan = _plan_bands(FS, freqs_np)
    auto = resolve_exclusions(needles[0], freqs_np, FS, None, None)
    guard, rescore_win = _rescore_guards(n, auto[1], hays.shape[-1])
    freqs_pad = jnp.asarray(plan["freqs_pad"])
    centers = jnp.asarray(plan["centers"])
    rel = jnp.asarray(plan["rel"])

    def step_fused(carry):
        pk = _banded_stein_os_peaks_jit.__wrapped__(
            ns[0] + carry, ns[1], hs[0], hs[1], freqs_pad, centers, rel,
            FS, m, plan["block_len"], "matmul", windows, lags, n, k,
            num_peaks, auto[0], auto[1], guard, rescore_win, interpret)
        return jnp.sum(pk.value) * 1e-30

    freqs_j = jnp.asarray(freqs_np)

    def step_xla(carry):
        pk = _os_peaks_batch_jit.__wrapped__(
            ns[0] + carry, ns[1], hs[0], hs[1], freqs_j, FS, lags, n,
            "matmul", num_peaks, auto[0], auto[1])
        return jnp.sum(pk.value) * 1e-30

    iters = 2 if interpret else 8
    out = {"shape": f"{pairs}x{k}x{lags}", "num_peaks": num_peaks,
           "backend": jax.default_backend(),
           "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    for name, step in (("fused_ms_per_pair", step_fused),
                       ("xla_lattice_ms_per_pair", step_xla)):
        stats = bench_configs._chain(step, lambda: jnp.float32(0),
                                     iters=iters)
        out[name] = (None if stats["value"] is None
                     else round(stats["value"] / pairs, 4))
        out[name + "_median"] = round(stats["median_ms"] / pairs, 4)
        out[name + "_load_ms"] = round(stats["load_ms"], 2)
        print(name, out[name], file=sys.stderr)
    if out["fused_ms_per_pair"] and out["xla_lattice_ms_per_pair"]:
        out["speedup"] = round(out["xla_lattice_ms_per_pair"]
                               / out["fused_ms_per_pair"], 2)
    path = os.path.join(os.path.dirname(__file__),
                        "multi_emitter_bench.json")
    if not args.cpu:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
