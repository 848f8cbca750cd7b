"""Native C++ I/O layer tests (libcafio, the reference's compiled-codec
analog — ``caf_rust/src/utils.rs:10-63``, ``caf_go/caf.go:31-93``)."""

import numpy as np
import pytest

from caf_cookoff_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("libcafio not built and no toolchain")
    return native.get_lib()


def _rand_c64(n, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(
        np.complex64)


def test_load_roundtrip(lib, tmp_path):
    x = _rand_c64(4096 + 33)
    p = tmp_path / "sig.c64"
    x.tofile(p)
    assert native.file_samples(p) == len(x)
    re, im = native.load_c64_split(p)
    np.testing.assert_array_equal(re, x.real)
    np.testing.assert_array_equal(im, x.imag)


def test_load_count_offset(lib, tmp_path):
    x = _rand_c64(1000, seed=2)
    p = tmp_path / "sig.c64"
    x.tofile(p)
    re, im = native.load_c64_split(p, count=100, offset=37)
    np.testing.assert_array_equal(re, x.real[37:137])
    np.testing.assert_array_equal(im, x.imag[37:137])
    # Reads past EOF clamp, like np.fromfile.
    re, _ = native.load_c64_split(p, count=10_000, offset=990)
    assert len(re) == 10


def test_load_missing_file(lib):
    with pytest.raises(OSError):
        native.load_c64_split("/nonexistent/nope.c64")


def test_write_c64_matches_numpy(lib, tmp_path):
    x = _rand_c64(512, seed=3)
    p = tmp_path / "out.c64"
    native.write_c64_split(p, x.real.copy(), x.imag.copy())
    np.testing.assert_array_equal(np.fromfile(p, dtype="<c8"), x)


def test_deinterleave_threaded_path(lib):
    # Above the parallel threshold (1<<20 samples) — exercises the
    # multi-thread fan-out.
    x = _rand_c64((1 << 20) + 17, seed=4)
    re, im = native.deinterleave(x)
    np.testing.assert_array_equal(re, x.real)
    np.testing.assert_array_equal(im, x.imag)


def test_split_array_uses_native(lib):
    from caf_cookoff_tpu.ops.splitfft import split_array

    x = _rand_c64(2048, seed=5)
    re, im = split_array(x)
    assert re.dtype == np.float32 and im.dtype == np.float32
    np.testing.assert_array_equal(re, x.real)


def test_write_f64_go_parity(lib, tmp_path):
    surf = np.arange(800.0).reshape(20, 40)
    p = tmp_path / "derp"
    native.write_f64(p, surf)
    back = np.fromfile(p, dtype="<f8").reshape(20, 40)
    np.testing.assert_array_equal(back, surf)
