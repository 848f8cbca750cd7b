#!/usr/bin/env python3
"""Regenerate the docs figures (reference ``docs/s0s1-time.png`` and
``docs/s0s1-caf.png`` analogs, ``README.md:14-15``): the chirp_0 pair's
time series and its delay x doppler CAF surface."""

import pathlib
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from caf_cookoff_tpu.config import FreqGrid  # noqa: E402
from caf_cookoff_tpu.models.filterbank import caf_surface  # noqa: E402
from caf_cookoff_tpu.utils.generate import ensure_fixtures  # noqa: E402
from caf_cookoff_tpu.utils.io import load_c64, parse_ground_truth  # noqa: E402

FS = 48e3


def main() -> None:
    out_dir = REPO / "docs"
    needle_path, haystack_path = ensure_fixtures(REPO / "data")[0]
    needle = load_c64(needle_path)
    haystack = load_c64(haystack_path)
    truth = parse_ground_truth(haystack_path)

    # --- time-series figure (s0s1-time.png analog) ---
    fig, axes = plt.subplots(2, 1, figsize=(9, 5), sharex=True)
    t = np.arange(len(haystack)) / FS * 1e3
    axes[0].plot(t[: len(needle)], needle.real, lw=0.4)
    axes[0].set_ylabel("s0 (needle) I")
    axes[1].plot(t, haystack.real, lw=0.4, color="tab:orange")
    axes[1].set_ylabel("s1 (haystack) I")
    axes[1].set_xlabel("time (ms)")
    axes[0].set_title(
        f"chirp_0: haystack = needle delayed {truth.lag_samples} samp, "
        f"shifted {truth.freq_hz:+.2f} Hz")
    fig.tight_layout()
    fig.savefig(out_dir / "s0s1-time.png", dpi=110)

    # --- CAF surface figure (s0s1-caf.png analog) ---
    grid = FreqGrid(-100.0, 100.0, 0.25)
    freqs = grid.frequencies(np.float32)
    surface = np.asarray(
        caf_surface(needle, haystack[: len(needle)], freqs, FS))
    zoom = surface[:, :512]  # positive-lag region of interest
    k, tau = np.unravel_index(zoom.argmax(), zoom.shape)
    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(10 * np.log10(zoom + 1e-20), aspect="auto", origin="lower",
              extent=(0, zoom.shape[1], freqs[0], freqs[-1]),
              cmap="viridis")
    ax.plot(tau + 0.5, freqs[k], "rx", markersize=12)
    ax.set_xlabel("lag (samples)")
    ax.set_ylabel("doppler (Hz)")
    ax.set_title(f"CAF surface — peak {freqs[k]:+.2f} Hz @ {tau} samples")
    fig.tight_layout()
    fig.savefig(out_dir / "s0s1-caf.png", dpi=110)
    print(f"wrote {out_dir}/s0s1-time.png, {out_dir}/s0s1-caf.png")


if __name__ == "__main__":
    main()
