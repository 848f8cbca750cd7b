"""CLI smoke tests (the config/flag layer the reference never shipped —
``caf_rust/src/main.rs:1-2`` left CLAP as a TODO)."""

import numpy as np

from caf_cookoff_tpu.cli import main


def test_run_golden(fixture_pairs, capsys, tmp_path):
    needle, haystack = fixture_pairs[0]
    surf_path = str(tmp_path / "surf.npy")
    rc = main(["run", str(needle), str(haystack),
               "--freq-start", "-100", "--freq-stop", "100",
               "--freq-step", "0.25", "--dump-surface", surf_path])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Frequency offset: 69.250 Hz" in out
    assert "Time offset: 202 samples" in out
    surf = np.load(surf_path)
    assert surf.shape == (800, 8192)


def test_run_full_haystack(fixture_pairs, capsys):
    needle, haystack = fixture_pairs[0]
    rc = main(["run", str(needle), str(haystack), "--full-haystack",
               "--freq-step", "0.25"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Time offset: 202 samples" in out


def test_generate_parity(tmp_path, capsys):
    rc = main(["generate", "--out", str(tmp_path), "--count", "1"])
    assert rc == 0
    assert (tmp_path / "chirp_0_raw.c64").exists()
    # Ground truth of chirp_0 is pinned by the reference generator chain.
    assert (tmp_path / "chirp_0_T+202samp_F+69.25Hz.c64").exists()


def test_info(capsys):
    assert main(["info"]) == 0
    assert "devices" in capsys.readouterr().out


def test_dump_surface_go_parity(fixture_pairs, tmp_path, capsys):
    """Raw f64 dump must read back with load_surf (Go dump_surf format,
    caf_go/caf.go:14-29)."""
    from caf_cookoff_tpu.utils.io import load_surf

    needle, haystack = fixture_pairs[1]
    raw_path = str(tmp_path / "derp")
    rc = main(["run", str(needle), str(haystack), "--dump-surface", raw_path])
    assert rc == 0
    surf = load_surf(raw_path, num_rows=400)
    assert surf.shape == (400, 8192)
    assert surf.dtype == np.float64
