"""SigMF I/O and observability tests."""

import json

import numpy as np
import pytest

from caf_cookoff_tpu.utils import sigmf
from caf_cookoff_tpu.utils.profiling import (
    Stopwatch,
    peak_to_floor_db,
    report_run,
)


def _rand_c64(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)


def test_sigmf_roundtrip(tmp_path):
    x = _rand_c64(1000)
    base = tmp_path / "cap"
    data_path, meta_path = sigmf.write_sigmf(
        base, x, 48e3, description="test capture")
    rec = sigmf.read_sigmf(base)
    np.testing.assert_array_equal(rec.samples, x)
    assert rec.sample_rate == 48e3
    assert rec.datatype == "cf32_le"
    assert rec.global_meta["core:description"] == "test capture"
    assert rec.captures == [{"core:sample_start": 0}]
    # Reading via either file path also works.
    np.testing.assert_array_equal(sigmf.read_sigmf(meta_path).samples, x)
    np.testing.assert_array_equal(sigmf.read_sigmf(data_path).samples, x)


def test_sigmf_cf64(tmp_path):
    x = _rand_c64(64).astype(np.complex128)
    sigmf.write_sigmf(tmp_path / "c", x, 1e6)
    rec = sigmf.read_sigmf(tmp_path / "c")
    assert rec.datatype == "cf64_le"
    np.testing.assert_array_equal(rec.samples, x)


def test_sigmf_c64_files_are_sigmf_data(tmp_path, fixture_pairs):
    """A reference .c64 fixture is byte-identical to a cf32_le SigMF
    data file: wrapping one must not change the samples."""
    from caf_cookoff_tpu.utils.io import load_c64

    needle = load_c64(fixture_pairs[0][0])
    sigmf.write_sigmf(tmp_path / "needle", needle, 48e3)
    raw = (tmp_path / "needle.sigmf-data").read_bytes()
    with open(fixture_pairs[0][0], "rb") as f:
        assert raw == f.read()


def test_annotate_detection(tmp_path):
    x = _rand_c64(500)
    _, meta_path = sigmf.write_sigmf(tmp_path / "cap", x, 48e3)
    ann = sigmf.caf_annotation(lag_samples=202, needle_len=100,
                               freq_offset_hz=69.25, peak_value=902.9,
                               needle_id="chirp_0")
    sigmf.annotate_detection(meta_path, ann)
    sigmf.annotate_detection(
        meta_path, sigmf.caf_annotation(5, 100, -10.0, 1.0))
    meta = json.loads((tmp_path / "cap.sigmf-meta").read_text())
    starts = [a["core:sample_start"] for a in meta["annotations"]]
    assert starts == sorted(starts) == [5, 202]
    assert meta["annotations"][1]["caf:needle"] == "chirp_0"


def test_sigmf_unsupported_datatype(tmp_path):
    _, meta_path = sigmf.write_sigmf(tmp_path / "c", _rand_c64(8), 1.0)
    meta = json.loads((tmp_path / "c.sigmf-meta").read_text())
    meta["global"]["core:datatype"] = "ci16_le"
    (tmp_path / "c.sigmf-meta").write_text(json.dumps(meta))
    with pytest.raises(ValueError, match="unsupported"):
        sigmf.read_sigmf(tmp_path / "c")


def test_report_run(chirp):
    from caf_cookoff_tpu.models.filterbank import caf_surface

    needle, haystack, truth = chirp(0)
    freqs = np.arange(-100, 100, 0.25, dtype=np.float32)
    surface = np.asarray(caf_surface(needle, haystack, freqs, 48e3))
    rep = report_run(surface, freqs, 48e3, elapsed_ms=0.5, backend="xla")
    assert (rep.freq_hz, rep.lag_samples) == (69.25, 202)
    assert rep.peak_to_floor_db > 20  # enormous injected SNR
    assert rep.surfaces_per_second == pytest.approx(2000.0)
    text = rep.result_lines()
    assert "Frequency offset: 69.250 Hz" in text
    assert "Time offset: 202 samples" in text
    record = json.loads(rep.to_json())
    assert record["lag_samples"] == 202


def test_stopwatch():
    with Stopwatch() as sw:
        pass
    assert sw.ms is not None and sw.ms >= 0


def test_peak_to_floor():
    surf = np.ones((4, 8))
    surf[2, 3] = 1000.0
    assert peak_to_floor_db(surf, 1000.0) == pytest.approx(30.0)
