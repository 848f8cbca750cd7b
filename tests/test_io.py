"""I/O and fixture-generator tests."""

import os

import numpy as np
import pytest

from caf_cookoff_tpu.utils.generate import synthesize_fixtures
from caf_cookoff_tpu.utils.io import (
    dump_surf,
    load_c64,
    load_f32,
    load_surf,
    parse_ground_truth,
    write_c128,
    write_c64,
)

# The exact fixture names the reference generator (seed 0) produces, as
# hardcoded in caf_rust/tests/test.rs — RNG-parity canary.
REFERENCE_FIXTURE_NAMES = [
    "chirp_0_T+202samp_F+69.25Hz.c64",
    "chirp_1_T+78samp_F+35.99Hz.c64",
    "chirp_2_T+169samp_F+32.16Hz.c64",
    "chirp_3_T+151samp_F-76.22Hz.c64",
    "chirp_4_T+70samp_F+82.89Hz.c64",
    "chirp_5_T+177samp_F-92.72Hz.c64",
    "chirp_6_T+15samp_F-49.69Hz.c64",
    "chirp_7_T+84samp_F+68.26Hz.c64",
    "chirp_8_T+80samp_F-46.28Hz.c64",
    "chirp_9_T+176samp_F+61.49Hz.c64",
]


def test_generator_reproduces_reference_fixture_names(fixture_pairs):
    got = [os.path.basename(h) for _, h in fixture_pairs]
    assert got == REFERENCE_FIXTURE_NAMES


def test_generator_deterministic(tmp_path):
    a = synthesize_fixtures(tmp_path / "a", count=2)
    b = synthesize_fixtures(tmp_path / "b", count=2)
    for (na, ha), (nb, hb) in zip(a, b):
        assert open(na, "rb").read() == open(nb, "rb").read()
        assert open(ha, "rb").read() == open(hb, "rb").read()


def test_fixture_shapes(fixture_pairs):
    needle = load_c64(fixture_pairs[0][0])
    haystack = load_c64(fixture_pairs[0][1])
    truth = parse_ground_truth(fixture_pairs[0][1])
    assert needle.shape == (4096,) and needle.dtype == np.complex64
    # haystack = lag zeros + needle + 96 trailing zeros (generate.py:62)
    assert len(haystack) == 4096 + truth.lag_samples + 96


def test_parse_ground_truth():
    t = parse_ground_truth("/x/y/chirp_3_T+151samp_F-76.22Hz.c64")
    assert (t.index, t.lag_samples, t.freq_hz) == (3, 151, -76.22)
    with pytest.raises(ValueError):
        parse_ground_truth("noise.c64")


def test_c64_roundtrip(tmp_path):
    x = (np.random.default_rng(0).standard_normal(100)
         + 1j * np.random.default_rng(1).standard_normal(100)).astype(np.complex64)
    p = tmp_path / "x.c64"
    write_c64(p, x)
    np.testing.assert_array_equal(load_c64(p), x)
    # byte layout: interleaved little-endian f32 I/Q
    raw = load_f32(p)
    np.testing.assert_array_equal(raw[0::2] + 1j * raw[1::2], x)


def test_c128_roundtrip(tmp_path):
    x = np.arange(8, dtype=np.complex128) * (1 + 2j)
    p = tmp_path / "x.c128"
    write_c128(p, x)
    np.testing.assert_array_equal(np.fromfile(p, dtype="<c16"), x)


def test_surf_dump_roundtrip(tmp_path):
    surf = np.random.default_rng(2).random((4, 16))
    p = tmp_path / "surf.f64"
    dump_surf(p, surf)  # Go dump_surf byte format (caf_go/caf.go:14-29)
    np.testing.assert_array_equal(load_surf(p, 4), surf)
