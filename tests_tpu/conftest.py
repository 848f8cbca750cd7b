"""On-chip test lane setup — the COMPILED counterpart of tests/.

tests/ forces CPU (8 virtual devices) so the suite runs anywhere; this
lane deliberately does NOT: it runs on whatever accelerator
``jax.devices()`` resolves (the axon TPU tunnel here) with every kernel
compiled, the analog of ``cargo test`` running the real backends
(``caf_rust/tests/test.rs:14-316``).  The whole lane skips cleanly on
CPU-only machines.

Run via ``make test-tpu``.  Compiles dominate wall time (~1-2 min per
distinct (grid, backend) program through the tunnel); the golden grids
collapse to 4 distinct bin counts so the lane stays bounded.
"""

import os
import pathlib
import subprocess
import sys

import pytest

from caf_cookoff_tpu.utils.generate import ensure_fixtures
from caf_cookoff_tpu.utils.io import load_c64, parse_ground_truth

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]
DATA_DIR = REPO_ROOT / "data"


def _accelerator_backend():
    """Default-backend name via a timeout-guarded SUBPROCESS probe.

    In-process ``jax.default_backend()`` hangs indefinitely when the
    device tunnel is down (observed with axon) — the lane must SKIP
    cleanly in that state, not wedge the whole pytest run at
    collection.  Returns None when init fails or times out
    (``CAF_TPU_PROBE_TIMEOUT`` seconds, default 300 — backend init
    only, so even slow compile-service days pass well inside it)."""
    timeout_s = float(os.environ.get("CAF_TPU_PROBE_TIMEOUT", "300"))
    try:
        r = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.default_backend())"],
            capture_output=True, text=True, timeout=timeout_s)
    except subprocess.TimeoutExpired:
        return None
    out = r.stdout.strip().splitlines()
    return out[-1] if r.returncode == 0 and out else None


def pytest_collection_modifyitems(config, items):
    backend = _accelerator_backend()
    if backend != "cpu" and backend is not None:
        return
    reason = ("no accelerator: the on-chip lane needs a TPU "
              "(tests/ covers CPU)" if backend == "cpu" else
              "accelerator unreachable (device init failed or timed "
              "out — tunnel down?)")
    skip = pytest.mark.skip(reason=reason)
    for item in items:
        item.add_marker(skip)


@pytest.fixture(scope="session")
def fixture_pairs():
    return ensure_fixtures(DATA_DIR)


@pytest.fixture(scope="session")
def chirp(fixture_pairs):
    def _load(idx: int):
        needle_path, haystack_path = fixture_pairs[idx]
        needle = load_c64(needle_path)
        haystack = load_c64(haystack_path, count=len(needle))
        return needle, haystack, parse_ground_truth(haystack_path)

    return _load
