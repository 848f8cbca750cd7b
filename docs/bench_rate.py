#!/usr/bin/env python3
"""Rate-axis bench: segmented (synthesis-row) rate search vs the
round-4 serial scan (VERDICT r4 item 2's measured-speedup artifact).

Workload: BASELINE config-3 shape with a rate grid — 1 pair, 2000 bins
(+-500 Hz @ 0.5 Hz), 65536 lags, R=9 trial rates (-200..200 @ 50).
Times the jitted cores of

* ``stein_rate_os_peak``'s banded segmented path
  (``rate._stein_rate_os_peak_jit`` — stage A shared by every
  (rate, doppler) pair, rates as synthesis rows), and
* the serial dechirp-bank scan (``rate._rate_os_peak_jit`` — R x
  spectra banks + R x full block scans, the round-4 engine),

chained-scan methodology, correctness-gated (both recover the injected
swept emitter at the matched trial rate).  Writes
``docs/rate_bench.json``.

Usage: python docs/bench_rate.py [--reps N] [--cpu]
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
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    import bench_configs
    from caf_cookoff_tpu.config import xcor_length
    from caf_cookoff_tpu.models.rate import (
        _RATE_ROWS_BUDGET,
        _stein_rate_os_peak_jit,
        _rate_os_peak_jit,
        rate_overlap_save_peak,
        stein_rate_os_peak,
    )
    from caf_cookoff_tpu.models.stein import _plan_bands
    from caf_cookoff_tpu.ops.splitfft import split_array

    bench_configs.REPS = args.reps
    n, lags, k = 4096, 65536, 2000
    rates_np = np.arange(-200.0, 201.0, 50.0, dtype=np.float32)  # R=9
    rng = np.random.default_rng(3)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(lags + n)
                   + 1j * rng.standard_normal(lags + n))
           ).astype(np.complex64)
    freqs_np = np.linspace(-500, 500, k,
                           endpoint=False).astype(np.float32)
    t = np.arange(n)
    true_f, true_r, true_lag = float(freqs_np[1234]), 150.0, 30_000
    ph = 2 * np.pi * true_f * t / FS + np.pi * true_r * (t / FS) ** 2
    hay[true_lag:true_lag + n] += 3 * (needle * np.exp(1j * ph)
                                       ).astype(np.complex64)

    # Correctness gates (both engines, matched trial rate 150).
    got = stein_rate_os_peak(needle, hay, freqs_np, rates_np, FS,
                             num_lags=lags)
    assert got[:3] == (true_r, true_f, true_lag), ("stein", got)
    got2 = rate_overlap_save_peak(needle, hay, freqs_np, rates_np, FS,
                                  num_lags=lags)
    assert got2[:3] == (true_r, true_f, true_lag), ("serial", got2)
    print("correctness gates passed (segmented + serial)",
          file=sys.stderr)

    n_planes = tuple(map(jnp.asarray, split_array(needle)))
    h_planes = tuple(map(jnp.asarray, split_array(hay)))
    rates = jnp.asarray(rates_np)
    freqs = jnp.asarray(freqs_np)
    interpret = jax.default_backend() == "cpu"
    m = xcor_length(n)
    windows = -(-lags // m)
    r_max = float(np.max(np.abs(rates_np)))
    margin = r_max * (n / FS)
    d_quad = int(FS / np.sqrt(2.0 * r_max))
    plan = _plan_bands(FS, freqs_np, margin_hz=margin, d_cap=d_quad)
    assert plan is not None
    rate_chunk = max(1, _RATE_ROWS_BUDGET // plan["kb"])
    guard = min(64, n // 4)
    freqs_pad = jnp.asarray(plan["freqs_pad"])
    centers = jnp.asarray(plan["centers"])
    rel = jnp.asarray(plan["rel"])

    def step_segmented(carry):
        out = _stein_rate_os_peak_jit.__wrapped__(
            n_planes[0] + carry, n_planes[1], h_planes[0], h_planes[1],
            freqs_pad, centers, rel, rates, FS, lags, n,
            plan["block_len"], "matmul", windows, k, rate_chunk, guard,
            interpret)
        return out[1] * 1e-30

    def step_serial(carry):
        out = _rate_os_peak_jit.__wrapped__(
            n_planes[0] + carry, n_planes[1], h_planes[0], h_planes[1],
            freqs, rates, FS, lags, n, "matmul")
        return out[1] * 1e-30

    out = {"shape": f"1x{k}x{lags} R={len(rates_np)}",
           "bands": plan["bands"], "block_len": plan["block_len"],
           "backend": jax.default_backend(),
           "timestamp": time.strftime("%Y-%m-%d %H:%M:%S")}
    iters = 1 if interpret else 8
    for name, step in (("segmented_ms", step_segmented),
                       ("serial_scan_ms", step_serial)):
        stats = bench_configs._chain(step, lambda: jnp.float32(0),
                                     iters=iters)
        out[name] = (None if stats["value"] is None
                     else round(stats["value"], 2))
        out[name + "_median"] = round(stats["median_ms"], 2)
        out[name + "_load_ms"] = round(stats["load_ms"], 2)
        print(name, out[name], file=sys.stderr)
    if out["segmented_ms"] and out["serial_scan_ms"]:
        out["speedup"] = round(out["serial_scan_ms"]
                               / out["segmented_ms"], 2)
    path = os.path.join(os.path.dirname(__file__), "rate_bench.json")
    if not args.cpu:
        with open(path, "w") as f:
            json.dump(out, f, indent=1)
        print(f"wrote {path}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
