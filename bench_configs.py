#!/usr/bin/env python3
"""Scaling-configuration benchmarks (BASELINE.json configs 1-4).

The headline driver benchmark is ``bench.py`` (config 1's shape); this
script exercises the larger shapes on whatever hardware is present and
prints one JSON line per config:

  1. reference 400x8192 single surface (the bench.py workload)
  2. batch of 64 pairs, 400x8192, one chip (vmapped)
  3. wideband 2000x65536 overlap-save surface peak (one chip here;
     time-shardable over a mesh)
  4. streaming multi-emitter slice: 16 pairs x 1024 bins x 32768 lags

Config 5 (pod-scale, N>=2 hosts) has no hardware here; its compute path
is validated by ``__graft_entry__.dryrun_multichip`` on a virtual mesh.

Chain-timing methodology as in bench.py; batch/stream configs report
per-*unit* numbers (per pair-surface) for comparability.
"""

import functools
import json
import sys
import time

import numpy as np

FS = 48_000.0


def _chain(step_fn, make_carry0, iters, reps=4):
    import jax
    import jax.numpy as jnp
    from jax import lax

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(n):
        def body(carry, _):
            return step_fn(carry), None

        carry, _ = lax.scan(body, make_carry0(), None, length=n)
        return carry

    def timed(n):
        jax.block_until_ready(chain(n))
        float(jnp.sum(chain(n)))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(jnp.sum(chain(n)))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    return (timed(1 + iters) - timed(1)) / iters


def _rand_pair(n, lag, f_hz, seed):
    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)
    hay = np.zeros(n, dtype=np.complex64)
    hay[lag:] = needle[: n - lag]
    hay *= np.exp(2j * np.pi * f_hz * np.arange(n) / FS).astype(np.complex64)
    return needle, hay


def config2_batch64():
    """64 pairs x 400x8192 on one chip: the fused batched Stein engine
    (grouped-conv stage A + batched Pallas synthesis/rank + vmapped
    top-k re-score) — real batch amortization, unlike the round-1
    ``lax.map``-over-pairs path (0.060 ms/surface)."""
    import jax
    import jax.numpy as jnp

    from caf_cookoff_tpu.config import BENCH_GRID
    from caf_cookoff_tpu.models.batched_stein import (
        _batched_stein_peak_jit,
        batched_stein_peak,
    )
    from caf_cookoff_tpu.models.stein import stein_caf_peak
    from caf_cookoff_tpu.ops.splitfft import split_array

    b, n = 64, 4096
    needles = np.stack([_rand_pair(n, 50 + i, 10.0 * i - 300, i)[0]
                        for i in range(b)])
    hays = np.stack([_rand_pair(n, 50 + i, 10.0 * i - 300, i)[1]
                     for i in range(b)])
    freqs_np = BENCH_GRID.frequencies(np.float32)
    # Correctness gate before timing: every pair's batched peak must
    # match its single-pair Stein answer (and the injected truth).
    fr, lg, _ = batched_stein_peak(needles, hays, freqs_np, FS)
    for i in range(0, b, 13):
        want = stein_caf_peak(needles[i], hays[i], freqs_np, FS)[:2]
        assert (float(fr[i]), int(lg[i])) == want, (i, fr[i], lg[i], want)
    ns_re, ns_im = map(jnp.asarray, split_array(needles))
    hs_re, hs_im = map(jnp.asarray, split_array(hays))
    freqs = jnp.asarray(freqs_np)
    interpret = jax.default_backend() == "cpu"

    def step(carry):
        pk = _batched_stein_peak_jit.__wrapped__(
            ns_re + carry, ns_im, hs_re, hs_im, freqs, FS, 2 * n, 64,
            "matmul", True, interpret)
        return jnp.sum(pk.value) * 1e-30

    ms = _chain(step, lambda: jnp.float32(0), iters=8)
    return {"metric": "config2_batch64_400x8192_ms_per_surface",
            "value": round(ms / b, 4), "unit": "ms",
            "batch_total_ms": round(ms, 3)}


def config3_wideband():
    """2000 bins x 65536 lags: banded windowed-OS fused engine, one chip.

    Doppler span +-500 Hz at a 0.5 Hz pitch: the plain Stein envelope
    caps blocks at fs/(4*f_max)=24 samples, but banding the grid (6
    bands x 375 bins, needle shifted to each band center) lifts the
    block length to 128, cutting the dominant synthesis MACs ~4x vs
    the round-2 scan engine (1.96 ms measured; see git history).  Each
    (band, lag-window) is one fused-kernel program."""
    import jax
    import jax.numpy as jnp

    from caf_cookoff_tpu.models.batched_stein import (
        _banded_stein_os_jit,
        batched_stein_os_peak,
    )
    from caf_cookoff_tpu.models.stein import _plan_bands
    from caf_cookoff_tpu.ops.splitfft import split_array
    from caf_cookoff_tpu.ops.xcor import xcor_length

    n, lags, k = 4096, 65536, 2000
    needle, _ = _rand_pair(n, 7, 0.0, 0)
    rng = np.random.default_rng(1)
    hay = (rng.standard_normal(lags + n)
           + 1j * rng.standard_normal(lags + n)).astype(np.complex64)
    freqs_np = np.linspace(-500, 500, k, endpoint=False).astype(np.float32)
    true_f, true_lag = float(freqs_np[1234]), 30_000
    t = np.arange(n)
    hay[true_lag:true_lag + n] += 3 * (needle * np.exp(
        2j * np.pi * true_f * t / FS)).astype(np.complex64)
    # Correctness gate: the public API (which routes this grid through
    # the banded engine) must recover the injected emitter.
    fr, lg, _ = batched_stein_os_peak(needle[None], hay[None], freqs_np,
                                      FS, num_lags=lags)
    assert (float(fr[0]), int(lg[0])) == (true_f, true_lag), (fr, lg)
    n_re, n_im = split_array(needle[None])
    h_re, h_im = map(jnp.asarray, split_array(hay[None]))
    n_re, n_im = jnp.asarray(n_re), jnp.asarray(n_im)
    plan = _plan_bands(FS, freqs_np)
    freqs_pad = jnp.asarray(plan["freqs_pad"])
    centers = jnp.asarray(plan["centers"])
    rel = jnp.asarray(plan["rel"])
    m = xcor_length(n)
    windows = -(-lags // m)
    interpret = jax.default_backend() == "cpu"

    def step(carry):
        pk = _banded_stein_os_jit.__wrapped__(
            n_re + carry, n_im, h_re, h_im, freqs_pad, centers, rel, FS,
            m, plan["block_len"], "matmul", windows, lags, n, k, interpret)
        return jnp.sum(pk.value) * 1e-30

    ms = _chain(step, lambda: jnp.float32(0), iters=3)
    return {"metric": "config3_wideband_2000x65536_ms", "value": round(ms, 2),
            "unit": "ms"}


def config4_stream16():
    """16 pairs x 1024 bins x 32768 lags: the windowed fused engine
    (batched_stein_os_peak) — every (pair, lag-window) is one fused
    kernel program, vs the round-1 lax.map-of-scans (1.03 ms/pair)."""
    import jax
    import jax.numpy as jnp

    from caf_cookoff_tpu.models.batched_stein import (
        _banded_stein_os_jit,
        batched_stein_os_peak,
    )
    from caf_cookoff_tpu.models.stein import _plan_bands
    from caf_cookoff_tpu.ops.splitfft import split_array

    pairs, n, lags, k = 16, 4096, 32768, 1024
    rng = np.random.default_rng(2)
    needles = (rng.standard_normal((pairs, n))
               + 1j * rng.standard_normal((pairs, n))).astype(np.complex64)
    hays = (1e-4 * (rng.standard_normal((pairs, lags + n))
                    + 1j * rng.standard_normal((pairs, lags + n))
                    )).astype(np.complex64)
    freqs_np = np.linspace(-500, 500, k, endpoint=False).astype(np.float32)
    t = np.arange(n)
    emitters = []
    for b in range(pairs):
        lag = 777 + b * 2011
        f_hz = float(freqs_np[61 * (b + 1)])
        hays[b, lag:lag + n] += (needles[b] * np.exp(
            2j * np.pi * f_hz * t / FS)).astype(np.complex64)[: lags + n - lag]
        emitters.append((f_hz, lag))
    # Correctness gate: every pair recovers its injected emitter —
    # num_lags pinned so the gated and timed programs use the SAME
    # window count (the default L-n+1 would be lags+1 -> one extra).
    fr, lg, _ = batched_stein_os_peak(needles, hays, freqs_np, FS,
                                      num_lags=lags)
    for b in range(pairs):
        assert (float(fr[b]), int(lg[b])) == emitters[b], (
            b, fr[b], lg[b], emitters[b])
    ns = tuple(map(jnp.asarray, split_array(needles)))
    hs = tuple(map(jnp.asarray, split_array(hays)))
    m = 2 * n
    windows = -(-lags // m)
    interpret = jax.default_backend() == "cpu"
    # This grid (1024 bins over +-500 Hz) routes banded: 6 bands x 192
    # bins at block 128 vs the plain envelope's block 16 — time the
    # same program the gate above exercised.
    plan = _plan_bands(FS, freqs_np)
    freqs_pad = jnp.asarray(plan["freqs_pad"])
    centers = jnp.asarray(plan["centers"])
    rel = jnp.asarray(plan["rel"])

    def step(carry):
        pk = _banded_stein_os_jit.__wrapped__(
            ns[0] + carry, ns[1], hs[0], hs[1], freqs_pad, centers, rel,
            FS, m, plan["block_len"], "matmul", windows, lags, n, k,
            interpret)
        return jnp.sum(pk.value) * 1e-30

    ms = _chain(step, lambda: jnp.float32(0), iters=4)
    return {"metric": "config4_stream16_1024x32768_ms_per_pair",
            "value": round(ms / pairs, 3), "unit": "ms",
            "slice_total_ms": round(ms, 2)}


def main() -> None:
    from bench import _require_device
    _require_device()   # a dead tunnel hangs jax.devices() forever

    import jax

    device = jax.devices()[0]
    print(f"device: {device.platform} ({device.device_kind})",
          file=sys.stderr)
    which = sys.argv[1:] or ["2", "3", "4"]
    runners = {"2": config2_batch64, "3": config3_wideband,
               "4": config4_stream16}
    for w in which:
        result = runners[w]()
        result["device"] = str(device.device_kind)
        print(json.dumps(result))


if __name__ == "__main__":
    main()
