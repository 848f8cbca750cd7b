#!/usr/bin/env python3
"""Timing experiment: cost of the fused kernel's in-kernel Hankel build.

Chain-times the headline fused surface+peak step exactly like bench.py;
run once normally and once with CAF_TPU_SKIP_HANKEL=1 (garbage output,
identical MXU schedule) — the delta is the Hankel build's share.
"""

import functools
import pathlib
import sys
import time

import numpy as np

_ROOT = pathlib.Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_ROOT))

FS = 48_000.0
ITERS = 400
REPS = 6


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax import lax

    from caf_cookoff_tpu.config import BENCH_GRID, xcor_length
    from caf_cookoff_tpu.models.stein import _stein_peak_jit
    from caf_cookoff_tpu.ops import splitfft
    from caf_cookoff_tpu.utils.generate import ensure_fixtures
    from caf_cookoff_tpu.utils.io import load_c64

    device = jax.devices()[0]
    data_dir = _ROOT / "data"
    needle_path, haystack_path = ensure_fixtures(data_dir)[0]
    needle_np = load_c64(needle_path)
    haystack_np = load_c64(haystack_path, count=len(needle_np))
    freqs_np = BENCH_GRID.frequencies(np.float32)
    fft_len = xcor_length(len(needle_np))

    n_re, n_im = (jax.device_put(p, device)
                  for p in splitfft.split_array(needle_np))
    h_re, h_im = (jax.device_put(p, device)
                  for p in splitfft.split_array(haystack_np))
    freqs = jax.device_put(freqs_np, device)

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(n_re, n_im, h_re, h_im, freqs, iters):
        def step(carry, _):
            pk = _stein_peak_jit.__wrapped__(
                n_re + carry, n_im, h_re, h_im, freqs, FS, fft_len, 64,
                "matmul", True, True)
            return pk.value * 1e-30, None

        carry, _ = lax.scan(step, jnp.float32(0), None, length=iters)
        return carry

    def timed_ms(iters: int) -> float:
        float(chain(n_re, n_im, h_re, h_im, freqs, iters))
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(chain(n_re, n_im, h_re, h_im, freqs, iters))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    ms = float("inf")
    for _ in range(3):
        ms = min(ms, (timed_ms(1 + ITERS) - timed_ms(1)) / ITERS)
    import os
    tag = "SKIP" if os.environ.get("CAF_TPU_SKIP_HANKEL") else "FULL"
    print(f"{tag} per-surface {ms * 1e3:.1f} us", flush=True)


if __name__ == "__main__":
    main()
