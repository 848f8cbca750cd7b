#!/usr/bin/env python3
"""Scaling-efficiency benchmark over an N-device mesh.

BASELINE.json's north star asks for "surfaces/s efficiency measured at
1 chip, 1 host and N>=2 hosts" with a >=0.8 target at N>=2.  This is
that harness: it times the three sharded engines at every power-of-two
device count available and reports per-N ms plus scaling efficiency.
The reference has no analog — its only scaling story is thread count on
one CPU (``README.md:22-41``'s serial-vs-parallel columns); this is the
mesh-axis generalization of that table.

Engines and scaling modes:

* ``doppler`` — STRONG scaling: the reference 400x8192 chirp_0 workload
  (one pair, fixed), doppler bins sharded over N devices
  (``parallel.sharded_caf_peak``; pmax/pmin peak lattice, zero other
  collectives).  efficiency(N) = T(1) / (N * T(N)).
* ``pair``   — WEAK scaling: a constant number of pairs PER DEVICE
  (data-parallel ``batched_caf_peak``), total batch grows with N.
  efficiency(N) = T(1) / T(N)  (per-device work is constant).
* ``time``   — STRONG scaling: one long-capture pair, lag axis chunked
  over N devices with ppermute halo exchange
  (``parallel.sharded_overlap_save_peak``) — the only engine whose
  scaling cost includes real neighbor traffic.

Every mesh point is correctness-gated before it is timed: the public
wrapper must recover the golden chirp_0 answer (doppler) or the
injected emitter truths (pair, time) at that exact mesh, so a wrong
sharding can never post a time.

Where the numbers are meaningful: on a real multi-chip slice, the
efficiencies are the BASELINE deliverable.  On this rig (one v5e chip
behind a tunnel) only N=1 is measurable on TPU; ``--virtual N`` runs
the same harness on N virtual CPU XLA devices, which validates the
harness, the shardings, and the collectives end-to-end — but virtual
devices share one host's cores (XLA already multi-threads the N=1
baseline), so virtual "efficiency" is a lower bound that under-reports
what ICI-connected chips would do.  The artifact records which regime
produced it in ``platform``.

Chain-timing methodology as in ``bench.py`` (dependency-serialized
``lax.scan``, 1-chain time subtracted); one JSON line per engine.
"""

import argparse
import functools
import json
import os
import sys
import time

import numpy as np

FS = 48_000.0


def _chain_ms(step_fn, iters: int, reps: int) -> float:
    """Best-of-``reps`` chained step time in ms (compile excluded)."""
    import jax
    import jax.numpy as jnp
    from jax import lax

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(n):
        def body(carry, _):
            return step_fn(carry), None

        carry, _ = lax.scan(body, jnp.float32(0), None, length=n)
        return carry

    def timed(n):
        float(chain(n))  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(chain(n))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    return (timed(1 + iters) - timed(1)) / iters


def _device_counts(n: int):
    """Power-of-two device counts up to n (plus n itself if not pow2)."""
    counts = []
    c = 1
    while c <= n:
        counts.append(c)
        c *= 2
    if counts[-1] != n:
        counts.append(n)
    return counts


def _emitter_pair(n: int, length: int, lag: int, f_hz: float, seed: int):
    """(needle, haystack) with one emitter at exactly (f_hz, lag)."""
    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(length)
                   + 1j * rng.standard_normal(length))).astype(np.complex64)
    t = np.arange(n)
    shifted = (needle * np.exp(2j * np.pi * f_hz * t / FS)).astype(
        np.complex64)
    hay[lag:lag + n] += shifted[: length - lag]
    return needle, hay


def engine_doppler(devices, counts, iters, reps, backend):
    """Strong scaling of the reference workload over the doppler axis."""
    import jax.numpy as jnp

    from caf_cookoff_tpu.config import BENCH_GRID, xcor_length
    from caf_cookoff_tpu.parallel.mesh import make_mesh
    from caf_cookoff_tpu.parallel.sharded import (
        _sharded_peak_jit,
        pad_axis_to,
        sharded_caf_peak,
    )
    from caf_cookoff_tpu.utils.generate import ensure_fixtures
    from caf_cookoff_tpu.utils.io import load_c64
    from caf_cookoff_tpu.ops.splitfft import split_array

    import pathlib
    data_dir = pathlib.Path(__file__).resolve().parent / "data"
    needle_path, haystack_path = ensure_fixtures(data_dir)[0]
    needle = load_c64(needle_path)
    haystack = load_c64(haystack_path, count=len(needle))
    freqs_np = BENCH_GRID.frequencies(np.float32)
    fft_len = xcor_length(len(needle))
    n_re, n_im = map(jnp.asarray, split_array(needle))
    h_re, h_im = map(jnp.asarray, split_array(haystack))

    ms = []
    for n_dev in counts:
        mesh = make_mesh(doppler=n_dev, devices=devices[:n_dev])
        # Gate: the golden chirp_0 answer at THIS mesh before timing.
        freq, lag, _ = sharded_caf_peak(needle, haystack, freqs_np, FS,
                                        mesh, backend=backend)
        assert abs(freq - 69.25) <= 0.5 and lag == 202, (n_dev, freq, lag)
        freqs_p = jnp.asarray(pad_axis_to(freqs_np, n_dev))

        def step(carry, mesh=mesh, freqs_p=freqs_p):
            pk = _sharded_peak_jit.__wrapped__(
                n_re + carry, n_im, h_re, h_im, freqs_p, FS, mesh,
                fft_len, backend)
            return pk.value * 1e-30

        ms.append(_chain_ms(step, iters, reps))
    return "doppler_strong_400x8192", ms, "strong", 1


def engine_pair(devices, counts, iters, reps, backend, per_device,
                fused=False):
    """Weak scaling: ``per_device`` pairs per device, batch grows with N.

    ``fused=True`` (the TPU default) runs the production batch engine —
    the fused Pallas Stein kernel sharded over ``pair``
    (``parallel.sharded_batched_stein_peak``, 0.0163 ms/surface at
    batch 64 on one v5e); ``fused=False`` runs the general XLA
    filterbank engine (``batched_caf_peak``), which is what the
    CPU/virtual validation path times (the Pallas interpreter is too
    slow to bench).  Scaling behavior of the ``pair`` axis — pure data
    parallelism, zero collectives — is the same for both.
    """
    import jax.numpy as jnp

    from caf_cookoff_tpu.config import BENCH_GRID, xcor_length
    from caf_cookoff_tpu.parallel.mesh import make_mesh
    from caf_cookoff_tpu.parallel.sharded import (
        _batched_peak_jit,
        _sharded_batched_stein_jit,
        batched_caf_peak,
        pad_axis_to,
        sharded_batched_stein_peak,
    )
    from caf_cookoff_tpu.ops.splitfft import split_array

    n = 4096
    freqs_np = BENCH_GRID.frequencies(np.float32)
    b_max = per_device * counts[-1]
    # Truth indices wrap within the grid so any device count works
    # (at 8+ devices a linear 40+7*i ramp would walk off the 400-bin
    # grid); lags stay distinct per pair, and each pair has its own
    # needle (seed=i), so repeated frequencies across pairs are fine.
    truths = [(float(freqs_np[40 + (7 * i) % (len(freqs_np) - 40)]),
               50 + 3 * i) for i in range(b_max)]
    assert truths[-1][1] + n <= 2 * n, "lag ramp exceeded haystack"
    pairs = [_emitter_pair(n, n, lag, f, seed=i)
             for i, (f, lag) in enumerate(truths)]
    needles_all = np.stack([p[0] for p in pairs])
    hays_all = np.stack([p[1] for p in pairs])
    fft_len = xcor_length(n)

    ms = []
    for n_dev in counts:
        b = per_device * n_dev
        needles, hays = needles_all[:b], hays_all[:b]
        mesh = make_mesh(pair=n_dev, devices=devices[:n_dev])
        # Gate: every injected emitter recovered at THIS mesh by the
        # same engine that gets timed.
        gate = (sharded_batched_stein_peak if fused else
                functools.partial(batched_caf_peak, backend=backend))
        fr, lg, _ = gate(needles, hays, freqs_np, FS, mesh)
        for i in range(b):
            assert (float(fr[i]), int(lg[i])) == truths[i], (
                n_dev, i, fr[i], lg[i], truths[i])
        ns_re, ns_im = map(jnp.asarray, split_array(needles))
        hs_re, hs_im = map(jnp.asarray, split_array(hays))

        if fused:
            from caf_cookoff_tpu.models.batched_stein import (
                SUPER,
                _pow2_block_len,
            )
            d = _pow2_block_len(FS, freqs_np, 64)
            pad = (-n) % SUPER
            if pad:
                ns_re = jnp.pad(ns_re, ((0, 0), (0, pad)))
                ns_im = jnp.pad(ns_im, ((0, 0), (0, pad)))
            freqs = jnp.asarray(freqs_np)
            interpret = mesh.devices.flat[0].platform == "cpu"

            def step(carry, mesh=mesh, ns_re=ns_re, ns_im=ns_im,
                     hs_re=hs_re, hs_im=hs_im, freqs=freqs, d=d,
                     interpret=interpret):
                pk = _sharded_batched_stein_jit.__wrapped__(
                    ns_re + carry, ns_im, hs_re, hs_im, freqs, FS, mesh,
                    fft_len, d, backend, interpret)
                return jnp.sum(pk.value) * 1e-30
        else:
            freqs_p = jnp.asarray(pad_axis_to(freqs_np, 1))

            def step(carry, mesh=mesh, ns_re=ns_re, ns_im=ns_im,
                     hs_re=hs_re, hs_im=hs_im, freqs_p=freqs_p):
                pk = _batched_peak_jit.__wrapped__(
                    ns_re + carry, ns_im, hs_re, hs_im, freqs_p, FS,
                    mesh, fft_len, backend)
                return jnp.sum(pk.value) * 1e-30

        ms.append(_chain_ms(step, iters, reps))
    label = ("pair_weak_fused_" if fused else
             "pair_weak_") + f"{per_device}perdev_400x8192"
    return label, ms, "weak", per_device


def engine_time(devices, counts, iters, reps, backend, n, total_lags,
                num_bins):
    """Strong scaling of one long capture over the time (lag) axis."""
    import jax.numpy as jnp

    from caf_cookoff_tpu.parallel.mesh import make_mesh
    from caf_cookoff_tpu.parallel.sharded import (
        _os_sharded_peak_jit,
        pad_axis_to,
        sharded_overlap_save_peak,
    )
    from caf_cookoff_tpu.ops.splitfft import split_array

    freqs_np = np.linspace(-100, 100, num_bins,
                           endpoint=False).astype(np.float32)
    true_f, true_lag = float(freqs_np[num_bins // 3]), total_lags - 1
    needle, hay = _emitter_pair(n, total_lags + n - 1, true_lag, true_f,
                                seed=3)
    n_re, n_im = map(jnp.asarray, split_array(needle))

    ms = []
    for n_dev in counts:
        mesh = make_mesh(time=n_dev, devices=devices[:n_dev])
        # Gate: tail-lag emitter recovered at THIS mesh (the hard case —
        # the final lag lives entirely in the last chunk's halo).
        freq, lag, _ = sharded_overlap_save_peak(
            needle, hay, freqs_np, FS, mesh, num_lags=total_lags,
            backend=backend)
        assert (freq, lag) == (true_f, true_lag), (n_dev, freq, lag)
        # Host-side prep replicating sharded_overlap_save_peak's layout.
        needed = min(len(hay), total_lags + n - 1)
        chunk = max(-(-needed // n_dev), n - 1)
        hay_p = np.pad(hay, (0, n_dev * chunk - len(hay))) \
            if n_dev * chunk > len(hay) else hay[: n_dev * chunk]
        h_re, h_im = map(jnp.asarray, split_array(hay_p))
        freqs_p = jnp.asarray(pad_axis_to(freqs_np, 1))

        def step(carry, mesh=mesh, h_re=h_re, h_im=h_im, chunk=chunk,
                 freqs_p=freqs_p):
            pk = _os_sharded_peak_jit.__wrapped__(
                n_re + carry, n_im, h_re, h_im, freqs_p, FS, mesh, n,
                chunk, total_lags, backend)
            return pk.value * 1e-30

        ms.append(_chain_ms(step, iters, reps))
    return f"time_strong_{num_bins}x{total_lags}", ms, "strong", 1


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--virtual", type=int, default=0, metavar="N",
                    help="run on N virtual CPU XLA devices (harness / "
                         "sharding validation; see module docstring)")
    ap.add_argument("--engines", default="doppler,pair,time")
    ap.add_argument("--iters", type=int, default=0,
                    help="chain length (default: platform-dependent)")
    ap.add_argument("--out", default=None,
                    help="also write the full JSON document here")
    args = ap.parse_args()

    if args.virtual:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.virtual}"
        ).strip()
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        from bench import _require_device
        _require_device()
        import jax

    devices = jax.devices()
    on_tpu = devices[0].platform != "cpu"
    platform = (f"{devices[0].platform} ({devices[0].device_kind})"
                + ("" if on_tpu else
                   f", {len(devices)} virtual devices" if args.virtual
                   else ""))
    print(f"devices: {len(devices)} x {platform}", file=sys.stderr)

    counts = _device_counts(len(devices))
    backend = "matmul" if on_tpu else "xla"
    iters = args.iters or (50 if on_tpu else 3)
    reps = 4 if on_tpu else 2
    # CPU shapes are scaled down so the virtual-mesh validation run
    # stays in seconds; TPU shapes are the real workloads.
    time_shape = (4096, 262_144, 400) if on_tpu else (1024, 32_768, 64)
    per_device = 8 if on_tpu else 2

    runners = {
        "doppler": lambda: engine_doppler(devices, counts, iters, reps,
                                          backend),
        "pair": lambda: engine_pair(devices, counts, iters, reps, backend,
                                    per_device, fused=on_tpu),
        "time": lambda: engine_time(devices, counts, iters, reps, backend,
                                    *time_shape),
    }

    doc = {"platform": platform, "devices": len(devices),
           "backend": backend, "engines": {}}
    for name in args.engines.split(","):
        label, ms, mode, units_per_dev = runners[name.strip()]()
        t1 = ms[0]
        # Chain-time subtraction can legitimately return <=0 ms under
        # host load; efficiency is then meaningless — emit null rather
        # than a negative ratio or a ZeroDivisionError.
        eff = {}
        for nd, m in zip(counts, ms):
            if nd <= 1:
                continue
            if m <= 0 or t1 <= 0:
                print(f"warning: non-positive chain time at N={nd} "
                      f"(t1={t1:.3f} ms, tN={m:.3f} ms) — efficiency "
                      "recorded as null; re-run on a quieter host",
                      file=sys.stderr)
                eff[str(nd)] = None
            else:
                eff[str(nd)] = round(
                    t1 / (m * (nd if mode == "strong" else 1)), 3)
        line = {"metric": f"scaling_{label}", "mode": mode,
                "devices": counts, "ms": [round(m, 3) for m in ms],
                "efficiency": eff, "platform": platform}
        doc["engines"][name.strip()] = line
        print(json.dumps(line))

    if args.out:
        with open(args.out, "w") as f:
            json.dump(doc, f, indent=1)
            f.write("\n")
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
