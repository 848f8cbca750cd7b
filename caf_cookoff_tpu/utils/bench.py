"""Benchmark harness — the README-style strategy table.

The reference publishes hand-collected tables of ms/surface per
language x FFT backend x parallel strategy (``README.md:22-41``) with a
3-round timing loop in Python (``caf_python/caf.py:137-148``), nightly
``Bencher`` in Rust and ``go test -bench`` in Go.  Here one harness
covers every backend and reports the same workload (400x8192 by
default), with chain-timing on TPU where single-dispatch wall time is
meaningless (see bench.py's methodology note).
"""

from __future__ import annotations

import functools
import pathlib
import time
from typing import Dict, List, Sequence

import numpy as np

from caf_cookoff_tpu.config import BENCH_GRID, FreqGrid, xcor_length


def _chain_time_ms(n_re, n_im, h_re, h_im, freqs, sample_rate, xcor_len,
                   backend: str, iters: int, reps: int) -> float:
    """Per-surface ms from a dependency-serialized scan chain."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    from caf_cookoff_tpu.models.filterbank import _surface_rows_split
    from caf_cookoff_tpu.ops import splitfft
    from caf_cookoff_tpu.ops.peak import find_peak_2d

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(n_re, n_im, h_re, h_im, freqs, n):
        def step(carry, _):
            rows = _surface_rows_split((n_re + carry, n_im), (h_re, h_im),
                                       freqs, sample_rate, xcor_len, backend)
            pk = find_peak_2d(splitfft.mag2(rows))
            # 1e-30 (not 0.0) so XLA cannot fold the dependency away.
            return pk.value * 1e-30, None

        carry, _ = lax.scan(step, jnp.float32(0), None, length=n)
        return carry

    def timed(n: int) -> float:
        float(chain(n_re, n_im, h_re, h_im, freqs, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(n_re, n_im, h_re, h_im, freqs, n))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    return (timed(1 + iters) - timed(1)) / iters


def apply_shift_microbench(num_samples: int = 8192, iters: int = 20_000,
                           reps: int = 4) -> Dict:
    """The README's ``apply_shift`` micro-comparison (``README.md:114-157``:
    rust 120 us, go 137 us, numba 158 us, plain python 10,300 us for one
    8192-sample frequency translation).  Chain-timed on this device."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    re = jnp.asarray(rng.standard_normal(num_samples).astype(np.float32))
    im = jnp.asarray(rng.standard_normal(num_samples).astype(np.float32))
    n_idx = jnp.arange(num_samples, dtype=jnp.float32)

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(re, im, n):
        def step(carry, _):
            phase = (carry + jnp.float32(2 * np.pi * 100.0 / 48e3)) * n_idx
            c, s = jnp.cos(phase), jnp.sin(phase)
            out_re = re * c - im * s
            out_im = re * s + im * c
            return jnp.sum(out_re) * 1e-30 + jnp.sum(out_im) * 0, None

        carry, _ = lax.scan(step, jnp.float32(0), None, length=n)
        return carry

    def timed(n):
        float(chain(re, im, n))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(re, im, n))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    us = (timed(1 + iters) - timed(1)) / iters * 1e3
    device = __import__("jax").devices()[0]
    return {
        "strategy": f"apply_shift+{device.platform}",
        "us_per_call": round(us, 3),
        "samples": num_samples,
        "reference_best_us": 120.0,  # rust, README.md:117
        "device": str(device.device_kind),
    }


def run_benchmarks(grid: FreqGrid = BENCH_GRID,
                   sample_rate: float = 48e3,
                   rounds: int = 3,
                   backends: Sequence[str] = ("xla", "matmul"),
                   data_dir: str = "data",
                   iters: int = 200) -> List[Dict]:
    """Time the filterbank engine per backend on the chirp_0 workload."""
    import jax

    from caf_cookoff_tpu.ops.splitfft import split_array
    from caf_cookoff_tpu.utils.generate import ensure_fixtures
    from caf_cookoff_tpu.utils.io import load_c64

    needle_path, haystack_path = ensure_fixtures(
        pathlib.Path(data_dir))[0]
    needle = load_c64(needle_path)
    haystack = load_c64(haystack_path, count=len(needle))
    freqs_np = grid.frequencies(np.float32)

    device = jax.devices()[0]
    n_re, n_im = (jax.device_put(p, device) for p in split_array(needle))
    h_re, h_im = (jax.device_put(p, device) for p in split_array(haystack))
    freqs = jax.device_put(freqs_np, device)
    xcor_len = xcor_length(len(needle))

    results = []
    for backend in backends:
        row = {
            "strategy": f"filterbank+{backend}+{device.platform}",
            "surface": f"{len(freqs_np)}x{xcor_len}",
            "device": str(device.device_kind),
        }
        try:
            row["ms"] = round(
                _chain_time_ms(n_re, n_im, h_re, h_im, freqs, sample_rate,
                               xcor_len, backend, iters, max(rounds, 2)), 4)
        except Exception as exc:  # e.g. complex FFT HLO on axon TPU
            row["ms"] = float("nan")
            row["error"] = f"{type(exc).__name__}: {str(exc)[:120]}"
        results.append(row)
    return results
