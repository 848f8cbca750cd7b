"""Signal and surface I/O.

File formats match the reference exactly:

* ``.c64`` — interleaved little-endian float32 I/Q (the fixture format;
  ``caf_rust/src/utils.rs:10-35``, ``caf_go/caf.go:31-51``,
  ``caf_python/caf.py:129-130``);
* ``.f32`` — raw little-endian float32 (``caf_go/caf.go:53-73``);
* surface dump — raw little-endian float64 rows (``caf_go/caf.go:14-29``,
  written to ``/tmp/derp`` by ``caf_go/main.go:37``);
* complex128 binary — numpy-compatible interleaved float64 I/Q
  (``caf_rust/src/utils.rs:39-63``).

Ground truth is encoded in fixture filenames
(``utils/generate.py:68`` → ``chirp_{i}_T{+lag}samp_F{+off}Hz.c64``).
"""

from __future__ import annotations

import os
import re
from typing import NamedTuple, Optional, Union

import numpy as np

PathLike = Union[str, os.PathLike]

_GROUND_TRUTH_RE = re.compile(
    r"chirp_(?P<idx>\d+)_T(?P<lag>[+-]\d+)samp_F(?P<freq>[+-]?\d+(?:\.\d+)?)Hz")


class GroundTruth(NamedTuple):
    index: int
    lag_samples: int
    freq_hz: float


def parse_ground_truth(path: PathLike) -> GroundTruth:
    """Recover the injected (lag, frequency offset) from a fixture filename."""
    name = os.path.basename(os.fspath(path))
    match = _GROUND_TRUTH_RE.search(name)
    if match is None:
        raise ValueError(f"no ground truth encoded in filename: {name!r}")
    return GroundTruth(index=int(match.group("idx")),
                       lag_samples=int(match.group("lag")),
                       freq_hz=float(match.group("freq")))


def load_c64(path: PathLike, count: Optional[int] = None) -> np.ndarray:
    """Read interleaved little-endian f32 I/Q as complex64."""
    data = np.fromfile(os.fspath(path), dtype="<c8",
                       count=-1 if count is None else count)
    return data.astype(np.complex64, copy=False)


def load_f32(path: PathLike, count: Optional[int] = None) -> np.ndarray:
    """Read raw little-endian float32 samples."""
    return np.fromfile(os.fspath(path), dtype="<f4",
                       count=-1 if count is None else count)


def c64_to_c128(samples: np.ndarray) -> np.ndarray:
    """Upcast complex64 -> complex128 (``caf_go/caf.go:85-93`` /
    ``caf_rust/src/utils.rs:10-35`` both compute in double precision)."""
    return np.asarray(samples).astype(np.complex128)


def f32_to_c128(samples: np.ndarray) -> np.ndarray:
    """Real float32 -> complex128 with zero imaginary part
    (``caf_go/caf.go:75-83``)."""
    return np.asarray(samples, dtype=np.float64).astype(np.complex128)


def write_c64(path: PathLike, samples: np.ndarray) -> None:
    """Write complex samples as interleaved little-endian f32 I/Q."""
    np.asarray(samples).astype("<c8").tofile(os.fspath(path))


def write_c128(path: PathLike, samples: np.ndarray) -> None:
    """Write complex samples as interleaved little-endian f64 I/Q.

    Numpy-compatible complex128, matching the Rust ``write_file_binary``
    trait impl (``caf_rust/src/utils.rs:39-63``).
    """
    np.asarray(samples).astype("<c16").tofile(os.fspath(path))


def dump_surf(path: PathLike, surface: np.ndarray) -> None:
    """Dump a real surface as raw little-endian float64 rows.

    Byte-compatible with the Go ``dump_surf`` (``caf_go/caf.go:14-29``).
    """
    np.asarray(surface).astype("<f8").tofile(os.fspath(path))


def load_surf(path: PathLike, num_rows: int) -> np.ndarray:
    """Read back a raw f64 surface dump, reshaped to (num_rows, -1)."""
    flat = np.fromfile(os.fspath(path), dtype="<f8")
    return flat.reshape(num_rows, -1)


def save_npy(path: PathLike, array: np.ndarray) -> None:
    """Save any array in .npy format (the richer, self-describing option)."""
    np.save(os.fspath(path), np.asarray(array))
