#!/usr/bin/env python3
"""Headline benchmark: the reference's 400x8192 filterbank CAF workload.

Workload identical to every reference main (``caf_rust/src/main.rs:17-22``,
``caf_go/main.go:22``, ``caf_python/caf.py:133-134``): 4096-sample complex
needle, 400 doppler bins (-100..+100 Hz step 0.5), fs = 48 kHz, 8192-point
zero-padded cross-correlation -> magnitude-squared surface -> 2-D argmax
peak (surface + ``find_peak``, the full reference pipeline).

Configuration measured: the Stein time-segmented engine with exact
top-k refinement ('stein' backend, models/stein.py) — segment
correlations shared across all doppler bins plus one MXU synthesis
matmul — which recovers every golden fixture peak bin-exactly
(validated on this chip and in tests/test_golden.py).

Baseline to beat: 28 ms/surface — the reference's best published parallel
number (RustFFT + threadpool on a Ryzen9-3900X, ``README.md:36,38``).
``vs_baseline`` is the speedup factor (baseline_ms / our_ms).

Timing methodology: host<->device round-trips through the TPU tunnel cost
~30 ms with several-ms jitter and async dispatch defeats single-call
timing, so the measured region is a ``lax.scan`` chain of ITERS
dependency-serialized surface+peak steps inside ONE jitted program (the
carry feeds the next step's input, scaled by 1e-30 so XLA cannot fold
the dependency away), with the 1-iteration chain time subtracted:

    per_surface_ms = (T(1 + ITERS) - T(1)) / ITERS

ITERS=400 puts the subtraction noise (~+-8 ms) at ~+-20 us/surface.

Prints exactly ONE JSON line on stdout; diagnostics go to stderr.
"""

import functools
import json
import pathlib
import sys
import time

import numpy as np

BASELINE_MS = 28.0
FS = 48_000.0
ITERS = 400
REPS = 6


def _require_device(timeout_s: float = 600.0) -> None:
    """Fail fast (exit 1, stderr message) when the accelerator tunnel
    is down: in-process ``jax.devices()`` then hangs INDEFINITELY
    (observed with the axon tunnel), which would wedge the bench with
    no artifact at all.  The probe runs in a subprocess so the main
    process stays killable; a healthy-but-slow compile day still
    passes (the probe only initializes the backend, ~seconds)."""
    import subprocess

    probe = "import jax; jax.devices()"
    try:
        r = subprocess.run([sys.executable, "-c", probe],
                           capture_output=True, text=True,
                           timeout=timeout_s)
    except subprocess.TimeoutExpired:
        print(f"bench: accelerator unreachable (device init exceeded "
              f"{timeout_s:.0f} s — tunnel down?); no measurement",
              file=sys.stderr)
        raise SystemExit(1)
    if r.returncode != 0:
        err = (r.stderr.strip().splitlines() or ["unknown error"])[-1]
        print(f"bench: accelerator init failed: {err[:200]}",
              file=sys.stderr)
        raise SystemExit(1)


def main() -> None:
    _require_device()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from caf_cookoff_tpu.config import BENCH_GRID, xcor_length
    from caf_cookoff_tpu.models.filterbank import caf_peak
    from caf_cookoff_tpu.models.stein import _stein_peak_jit
    from caf_cookoff_tpu.ops import splitfft
    from caf_cookoff_tpu.utils.generate import ensure_fixtures
    from caf_cookoff_tpu.utils.io import load_c64

    device = jax.devices()[0]
    on_tpu = device.platform != "cpu"
    print(f"backend: {device.platform} ({device.device_kind})",
          file=sys.stderr)

    data_dir = pathlib.Path(__file__).resolve().parent / "data"
    needle_path, haystack_path = ensure_fixtures(data_dir)[0]
    needle_np = load_c64(needle_path)
    haystack_np = load_c64(haystack_path, count=len(needle_np))
    freqs_np = BENCH_GRID.frequencies(np.float32)
    needle_len = len(needle_np)
    fft_len = xcor_length(needle_len)

    # Split-complex planes resident in HBM (TPU runtimes reject complex
    # buffers); one-time setup, like the reference benches' pre-timer
    # data load.
    n_re, n_im = (jax.device_put(p, device)
                  for p in splitfft.split_array(needle_np))
    h_re, h_im = (jax.device_put(p, device)
                  for p in splitfft.split_array(haystack_np))
    freqs = jax.device_put(freqs_np, device)
    backend = "matmul" if on_tpu else "xla"

    @functools.partial(jax.jit, static_argnames=("iters",))
    def chain(n_re, n_im, h_re, h_im, freqs, iters):
        def step(carry, _):
            # fused=True on TPU: the fully fused Pallas kernel (42.7 vs
            # 58.6 us for the XLA coarse path, measured on v5e).
            pk = _stein_peak_jit.__wrapped__(
                n_re + carry, n_im, h_re, h_im, freqs, FS, fft_len, 64,
                backend, True, on_tpu)
            return pk.value * 1e-30, None

        carry, _ = lax.scan(step, jnp.float32(0), None, length=iters)
        return carry

    def timed_ms(iters: int) -> float:
        float(chain(n_re, n_im, h_re, h_im, freqs, iters))  # compile+warm
        best = float("inf")
        for _ in range(REPS):
            t0 = time.perf_counter()
            float(chain(n_re, n_im, h_re, h_im, freqs, iters))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    iters = ITERS if on_tpu else 10  # CPU interpret mode is slow
    # The tunnel's execution rate fluctuates run to run (measured
    # 0.022-0.088 ms/surface across quiet/loaded sessions); run several
    # full measurement cycles — each is ~0.5 s, so this costs nothing
    # next to the compile — and report the MEDIAN cycle with its spread
    # so the artifact itself can distinguish tunnel load from a real
    # regression (a loaded run shows a high load_ms chain(1) proxy and
    # a wide spread; a regression shifts the median with both quiet).
    #
    # Load qualification (round 5): the run classifies ITSELF instead
    # of leaving that to human archaeology across BENCH_rNN artifacts.
    # A quiet tunnel shows a tight cycle cluster (spread within
    # QUIET_REL of the median); under load the bench EXTENDS — more
    # 5-cycle batches, up to MAX_CYCLES — hoping to catch a quiet
    # window, then tags the artifact "loaded" and reports
    # ``quiet_est_ms`` (median of the 3 least-contended cycles, the
    # best available estimate of the uncontended rate) so a
    # round-over-round delta is machine-classifiable as environment
    # vs regression.  QUIET_REF_MS is the recorded quiet-tunnel
    # reference for this workload (round-2 artifact + round-4 quiet
    # sessions: 0.0225-0.0316 ms).
    QUIET_REL = 0.10
    QUIET_REF_MS = 0.0316
    MAX_CYCLES = 20
    batch = 5 if on_tpu else 1
    cand_ms, loads = [], []

    def run_batch():
        for _ in range(batch):
            tb = timed_ms(1)
            tf = timed_ms(1 + iters)
            cand_ms.append((tf - tb) / iters)
            loads.append(tb)

    def stats():
        order = sorted(range(len(cand_ms)), key=lambda i: cand_ms[i])
        med = cand_ms[order[len(cand_ms) // 2]]
        return med, cand_ms[order[0]], cand_ms[order[-1]] - cand_ms[order[0]]

    def is_quiet(ms, spread_ms):
        # Quiet = tight cluster AND near the recorded quiet rate.  A
        # tight cluster ALONE is not enough: sustained tunnel load
        # measures stably slow (observed: spread 4% of median at 1.3x
        # the quiet reference), so stability must be paired with the
        # absolute check.
        return (spread_ms <= QUIET_REL * ms
                and ms <= QUIET_REF_MS * 1.15)

    run_batch()
    ms, best_ms, spread_ms = stats()
    while (on_tpu and not is_quiet(ms, spread_ms)
           and len(cand_ms) < MAX_CYCLES):
        print(f"bench: median {ms:.4f} ms / spread {spread_ms:.4f} not "
              f"quiet-qualified (ref {QUIET_REF_MS}) — extending "
              f"({len(cand_ms)} cycles so far)", file=sys.stderr)
        run_batch()
        ms, best_ms, spread_ms = stats()
    cycles = len(cand_ms)
    load_ms = min(loads)                      # chain(1) = dispatch floor
    quiet = not on_tpu or is_quiet(ms, spread_ms)
    quiet_est_ms = float(np.median(sorted(cand_ms)[:3]))

    # Sanity: the golden chirp_0 answer must hold on whatever chip ran.
    freq, lag, _ = caf_peak(needle_np, haystack_np, freqs_np, FS,
                            backend="stein")
    assert abs(freq - 69.25) <= 0.5, freq  # nearest 0.5 Hz bin to +69.25
    assert lag == 202, lag

    from caf_cookoff_tpu.utils.bench import _mfu, flops_model

    mfu = _mfu("stein", flops_model("stein", len(freqs_np), needle_len,
                                    fft_len), ms, device)
    mfu_note = (f"  {mfu['tflops']} TFLOP/s = {mfu['mfu_pct']}% of bf16 "
                f"peak" if mfu else "")
    print(f"chain(1) {load_ms:.1f} ms  per-surface median {ms:.4f} ms "
          f"(best {best_ms:.4f}, spread {spread_ms:.4f}, {cycles} cycles "
          f"x {REPS} reps, {'quiet' if quiet else 'loaded'})  "
          f"surfaces/s/chip {1e3 / ms:.0f}  "
          f"[stein-refine, golden-exact]{mfu_note}", file=sys.stderr)

    # Self-describing, LOAD-QUALIFIED artifact: value is the median
    # cycle; ``load_class`` is the run's own verdict on its
    # measurement conditions, ``quiet_est_ms`` the least-contended
    # estimate and ``quiet_ref_ms`` the recorded quiet baseline — a
    # round-over-round delta classifies as environment (loaded, quiet
    # estimate near the reference) vs regression (quiet run, median
    # shifted) without rerunning or human archaeology.
    print(json.dumps({
        "metric": "caf_surface_peak_400x8192_ms",
        "value": round(ms, 4),
        "unit": "ms",
        "vs_baseline": round(BASELINE_MS / ms, 2),
        "best_ms": round(best_ms, 4),
        "spread_ms": round(spread_ms, 4),
        "load_ms": round(load_ms, 2),
        "cycles": cycles,
        "reps": REPS,
        "load_class": "quiet" if quiet else "loaded",
        "quiet_est_ms": round(quiet_est_ms, 4),
        "quiet_ref_ms": QUIET_REF_MS,
        **({"mfu_pct": mfu["mfu_pct"]} if mfu else {}),
    }))


if __name__ == "__main__":
    main()
