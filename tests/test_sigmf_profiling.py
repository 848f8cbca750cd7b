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


def test_multi_capture_segments(tmp_path):
    """captures[*].core:sample_start partitions the data stream; segment
    loading and annotation rebasing honor it (round-1 missing #4)."""
    rng = np.random.default_rng(1)
    seg0 = rng.standard_normal(1000).astype(np.complex64)
    seg1 = rng.standard_normal(2000).astype(np.complex64)
    seg2 = rng.standard_normal(500).astype(np.complex64)
    samples = np.concatenate([seg0, seg1, seg2])
    captures = [{"core:sample_start": 0},
                {"core:sample_start": 1000, "core:frequency": 1e6},
                {"core:sample_start": 3000}]
    _, meta = sigmf.write_sigmf(str(tmp_path / "mc"), samples, 48e3,
                                captures=captures)
    rec = sigmf.read_sigmf(meta)
    assert rec.segment_bounds() == [(0, 1000), (1000, 2000), (3000, 500)]
    np.testing.assert_array_equal(rec.segment(1), seg1)
    with pytest.raises(IndexError):
        rec.segment(3)
    # segment-relative annotation rebases to absolute data-file index
    sigmf.annotate_detection(meta, sigmf.caf_annotation(150, 64, 10.0, 1.0),
                             segment=1)
    ann = sigmf.read_sigmf(meta).annotations
    assert ann[0]["core:sample_start"] == 1150


def test_multi_capture_run_cli(tmp_path, fixture_pairs, capsys):
    """A multi-capture recording round-trips through `run --segment`:
    the golden emitter sits in segment 1, lags are segment-relative,
    and the annotation lands at the absolute stream index."""
    from caf_cookoff_tpu.cli import main
    from caf_cookoff_tpu.utils.io import load_c64

    needle_path, haystack_path = fixture_pairs[0]
    needle = load_c64(needle_path)
    hay = load_c64(haystack_path, count=len(needle))
    pad = np.zeros(1024, np.complex64)
    samples = np.concatenate([pad, hay])       # segment 0 = noise pad
    captures = [{"core:sample_start": 0}, {"core:sample_start": 1024}]
    _, meta = sigmf.write_sigmf(str(tmp_path / "cap"), samples, 48e3,
                                captures=captures)
    rc = main(["run", str(needle_path), meta, "--segment", "1",
               "--freq-step", "0.25", "--annotate"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Time offset: 202 samples" in out   # segment-relative golden
    ann = sigmf.read_sigmf(meta).annotations
    assert ann[0]["core:sample_start"] == 1024 + 202  # absolute


def test_follow_sigmf_tails_growing_file(tmp_path):
    """follow_sigmf yields samples appended after the follower starts
    (the grc/capture.grc live-capture analog)."""
    import threading
    import time as _time

    rng = np.random.default_rng(2)
    first = rng.standard_normal(512).astype(np.complex64)
    more = rng.standard_normal(700).astype(np.complex64)
    data, meta = sigmf.write_sigmf(str(tmp_path / "live"), first, 48e3)

    def append_later():
        _time.sleep(0.3)
        with open(data, "ab") as f:
            more.tofile(f)

    t = threading.Thread(target=append_later)
    t.start()
    got = []
    for chunk in sigmf.follow_sigmf(meta, chunk=256, poll_s=0.05,
                                    idle_timeout_s=1.0):
        got.append(chunk)
    t.join()
    np.testing.assert_array_equal(np.concatenate(got),
                                  np.concatenate([first, more]))
