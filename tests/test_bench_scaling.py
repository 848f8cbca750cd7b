"""The scaling-efficiency harness (bench_scaling.py) on the virtual mesh.

BASELINE's north star asks for surfaces/s efficiency at 1 and N>=2
devices; the harness must gate every mesh point on a correct answer
before timing it.  Here it runs end-to-end (small counts/iters) on the
8-virtual-device CPU mesh the whole suite uses.
"""

import sys
import pathlib

import jax
import numpy as np
import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench_scaling  # noqa: E402


def test_device_counts():
    assert bench_scaling._device_counts(1) == [1]
    assert bench_scaling._device_counts(8) == [1, 2, 4, 8]
    assert bench_scaling._device_counts(6) == [1, 2, 4, 6]


def test_emitter_pair_truth_roundtrip():
    needle, hay = bench_scaling._emitter_pair(256, 1024, 300, 12.0, seed=0)
    assert needle.dtype == np.complex64 and hay.shape == (1024,)
    # The emitter segment dominates the noise floor.
    assert np.abs(hay[300:556]).mean() > 50 * np.abs(hay[:256]).mean()


def test_engine_doppler_gated_timing():
    devices = jax.devices()
    label, ms, mode, _ = bench_scaling.engine_doppler(
        devices, [1, 2], iters=1, reps=1, backend="xla")
    assert label == "doppler_strong_400x8192" and mode == "strong"
    assert len(ms) == 2 and all(m > 0 for m in ms)


def test_engine_time_gated_timing():
    devices = jax.devices()
    label, ms, mode, _ = bench_scaling.engine_time(
        devices, [1, 2], iters=1, reps=1, backend="xla",
        n=512, total_lags=4096, num_bins=16)
    assert mode == "strong" and len(ms) == 2 and all(m > 0 for m in ms)


def test_engine_pair_gate_catches_wrong_truth(monkeypatch):
    """The correctness gate is live: corrupt the truth table and the
    engine must refuse to time (assert), not post a number."""
    devices = jax.devices()
    orig = bench_scaling._emitter_pair

    def corrupted(n, length, lag, f_hz, seed):
        return orig(n, length, lag + 5, f_hz, seed)

    monkeypatch.setattr(bench_scaling, "_emitter_pair", corrupted)
    with pytest.raises(AssertionError):
        bench_scaling.engine_pair(devices, [1], iters=1, reps=1,
                                  backend="xla", per_device=1)
