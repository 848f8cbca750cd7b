"""Sub-bin (FDOA, TDOA) zoom refinement (ops/refine.py).

The reference can only ever report grid points — its own test suite
codifies the snap (injected +35.99 Hz on a 1 Hz grid asserted as 36.0,
``caf_rust/tests/test.rs:162``).  These tests pin that the zoom
refinement recovers the *injected* truth on every golden fixture to
<=0.01 Hz and <=0.1 sample (typically 100x tighter), recovers genuine
fractional sample delays, batches, and is wired to ``caf-tpu run
--refine`` / ``batch --refine``.
"""

import numpy as np
import pytest

from caf_cookoff_tpu.models.filterbank import caf_peak
from caf_cookoff_tpu.ops.refine import refine_peak, refine_peaks
from caf_cookoff_tpu.utils.io import load_c64, parse_ground_truth

FS = 48_000.0


@pytest.fixture(scope="module")
def fixture_truths(fixture_pairs):
    out = []
    for n_path, h_path in fixture_pairs:
        needle = load_c64(n_path)
        hay = load_c64(h_path)
        out.append((needle, hay, parse_ground_truth(h_path)))
    return out


def test_refine_all_fixtures_beat_grid_snap(fixture_truths):
    """<=0.01 Hz / <=0.1 sample against the INJECTED truth, all 10."""
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    for needle, hay, gt in fixture_truths:
        f0, lag0, _ = caf_peak(needle, hay[: len(needle)], freqs, FS,
                               backend="xla")
        f_hat, tau_hat, value = refine_peak(
            needle, hay, f0, lag0, FS, coarse_step_hz=0.5, backend="xla")
        assert abs(f_hat - gt.freq_hz) <= 0.01, (gt, f_hat)
        assert abs(tau_hat - gt.lag_samples) <= 0.1, (gt, tau_hat)
        assert value > 0


def test_refine_chirp1_coarse_grid(fixture_truths):
    """The reference's own snapping example: +35.99 Hz on a 1 Hz grid
    can only be called 36.0 (``caf_rust/tests/test.rs:162``); the zoom
    recovers 35.99 from that same coarse answer."""
    needle, hay, gt = fixture_truths[1]
    assert gt.freq_hz == 35.99
    freqs = np.arange(30.0, 40.0, 1.0, dtype=np.float32)
    f0, lag0, _ = caf_peak(needle, hay[: len(needle)], freqs, FS,
                           backend="xla")
    assert f0 == 36.0                      # the snap the reference asserts
    f_hat, tau_hat, _ = refine_peak(needle, hay, f0, lag0, FS,
                                    coarse_step_hz=1.0, backend="xla")
    assert abs(f_hat - 35.99) <= 0.01
    assert abs(tau_hat - gt.lag_samples) <= 0.1


def _fractional_pair(n=4096, total=16384, lag_frac=1234.375,
                     f_hz=35.9871, seed=3):
    """Needle + capture with a genuine sub-sample delay (spectral
    phase-ramp shift of a band-limited needle)."""
    from scipy.signal import firwin, filtfilt

    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    needle = filtfilt(firwin(127, 0.4), 1.0, needle).astype(np.complex64)
    buf = np.zeros(total, np.complex128)
    buf[:n] = needle
    spec = np.fft.fft(buf)
    k = np.fft.fftfreq(total) * total
    buf = np.fft.ifft(spec * np.exp(-2j * np.pi * k * lag_frac / total))
    t = np.arange(total)
    hay = (buf * np.exp(2j * np.pi * f_hz * t / FS)).astype(np.complex64)
    hay += (1e-5 * (rng.standard_normal(total)
                    + 1j * rng.standard_normal(total))).astype(np.complex64)
    return needle, hay


@pytest.mark.parametrize("lag_true,f_true", [(1234.375, 35.9871),
                                             (777.8, -92.1234),
                                             (500.5, 0.013)])
def test_refine_fractional_delay(lag_true, f_true):
    needle, hay = _fractional_pair(lag_frac=lag_true, f_hz=f_true)
    f0 = round(f_true * 2) / 2
    lag0 = round(lag_true)
    f_hat, tau_hat, _ = refine_peak(needle, hay, f0, lag0, FS,
                                    coarse_step_hz=0.5, backend="xla")
    assert abs(f_hat - f_true) <= 5e-3
    assert abs(tau_hat - lag_true) <= 1e-3


@pytest.mark.parametrize("seed", range(5))
def test_refine_fuzz(seed):
    """Randomized (freq, fractional lag): recovery holds across the
    parameter space, not just the hand-picked cases."""
    rng = np.random.default_rng(200 + seed)
    f_true = float(rng.uniform(-95, 95))
    lag_true = float(rng.uniform(100, 10000)) + float(rng.uniform(0, 1))
    needle, hay = _fractional_pair(lag_frac=lag_true, f_hz=f_true,
                                   seed=300 + seed)
    f0 = round(f_true * 2) / 2
    f_hat, tau_hat, _ = refine_peak(needle, hay, f0, round(lag_true), FS,
                                    coarse_step_hz=0.5, backend="xla")
    # Tolerances = the documented contract (<=0.01 Hz / <=0.1 samples);
    # typical errors are 10-100x tighter but the f32 zoom floor has a
    # few-mHz tail at n=4096 (seed 3 measured 8.9e-3 Hz).
    assert abs(f_hat - f_true) <= 1e-2, (seed, f_hat, f_true)
    assert abs(tau_hat - lag_true) <= 1e-3, (seed, tau_hat, lag_true)


def test_refine_peaks_batched_matches_scalar(fixture_truths):
    """The vmapped batch program returns the per-pair answers."""
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    rows = fixture_truths[:4]
    n = len(rows[0][0])
    length = min(len(h) for _, h, _ in rows)
    needles = np.stack([r[0] for r in rows])
    hays = np.stack([r[1][:length] for r in rows])
    coarse = [caf_peak(r[0], r[1][:n], freqs, FS, backend="xla")
              for r in rows]
    f0s = [c[0] for c in coarse]
    lag0s = [c[1] for c in coarse]
    fr, lg, _ = refine_peaks(needles, hays, f0s, lag0s, FS,
                             coarse_step_hz=0.5, backend="xla")
    for i, (_, _, gt) in enumerate(rows):
        assert abs(fr[i] - gt.freq_hz) <= 0.01
        assert abs(lg[i] - gt.lag_samples) <= 0.1
        scalar = refine_peak(needles[i], hays[i], f0s[i], lag0s[i],
                             FS, coarse_step_hz=0.5, backend="xla")
        # vmapped and scalar programs lower differently (batched FFTs
        # and dots accumulate in different orders); each sits within
        # its own f32 zoom floor (~1e-3 Hz at n=4096).
        assert abs(fr[i] - scalar[0]) <= 5e-3
        assert abs(lg[i] - scalar[1]) <= 5e-3


def test_refine_short_capture_and_negative_lag():
    """Code-review regressions: a needle-length capture with lag 0 must
    not crash (window extraction used to dynamic_slice past the
    operand), and a NEGATIVE signed lag (capture leads the needle) must
    refine against the correctly-aligned window rather than a clamped,
    misaligned one."""
    rng = np.random.default_rng(11)
    n = 512
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t = np.arange(n)

    # Exactly needle-length capture, lag 0.
    hay0 = (needle * np.exp(2j * np.pi * 25.0 * t / FS)).astype(
        np.complex64)
    f_hat, tau_hat, _ = refine_peak(needle, hay0, 25.0, 0, FS,
                                    coarse_step_hz=0.5, backend="xla")
    assert abs(f_hat - 25.0) <= 0.01 and abs(tau_hat) <= 0.01

    # Negative lag: the capture starts 5 samples INTO the needle.
    lag_true = -5
    hay_neg = (needle[-lag_true:] * np.exp(
        2j * np.pi * 10.3 * t[-lag_true:] / FS)).astype(np.complex64)
    f_hat, tau_hat, _ = refine_peak(needle, hay_neg, 10.5, lag_true, FS,
                                    coarse_step_hz=0.5, backend="xla")
    assert abs(f_hat - 10.3) <= 0.02
    assert abs(tau_hat - lag_true) <= 0.05


def test_cli_refine_unwraps_circular_lag(tmp_path, capsys):
    """Truncated-mode coarse lags are RAW circular xcor indices; the
    CLI must un-wrap the wrap region (negative true lag) before
    refining — it used to feed the huge positive index straight in and
    print a noise fit."""
    from caf_cookoff_tpu.cli import main
    from caf_cookoff_tpu.config import xcor_length
    from caf_cookoff_tpu.models.filterbank import caf_peak
    from caf_cookoff_tpu.utils.io import write_c64

    rng = np.random.default_rng(13)
    n, lag_true, f_true = 1024, -7, 20.25
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t = np.arange(n + lag_true)
    hay = np.zeros(n, np.complex64)
    hay[: n + lag_true] = (needle[-lag_true:] * np.exp(
        2j * np.pi * f_true * t / FS)).astype(np.complex64)
    hay += (1e-4 * (rng.standard_normal(n)
                    + 1j * rng.standard_normal(n))).astype(np.complex64)
    freqs = np.arange(-100, 100, 0.25, dtype=np.float32)
    _, raw_lag, _ = caf_peak(needle, hay, freqs, FS, backend="xla")
    assert raw_lag == xcor_length(n) + lag_true     # the wrap index
    write_c64(str(tmp_path / "n.c64"), needle)
    write_c64(str(tmp_path / "h.c64"), hay)
    rc = main(["run", str(tmp_path / "n.c64"), str(tmp_path / "h.c64"),
               "--freq-step", "0.25", "--refine"])
    assert rc == 0
    line = [ln for ln in capsys.readouterr().out.splitlines()
            if ln.startswith("Refined estimate:")][0]
    f_ref = float(line.split()[2])
    t_ref = float(line.split()[4])
    assert abs(f_ref - f_true) <= 0.02
    assert abs(t_ref - lag_true) <= 0.05


def test_cli_batch_refine_reads_past_truncation(tmp_path, capsys):
    """batch --refine (non-full) must refine against the UNTRUNCATED
    captures: with a capture 2n long and lag past the guard, the
    truncated window loses the copy's tail and degrades the estimate."""
    import json

    from caf_cookoff_tpu.cli import main
    from caf_cookoff_tpu.utils.io import write_c64

    rng = np.random.default_rng(17)
    n, lag_true, f_true = 1024, 300, -41.37
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(2 * n)
                   + 1j * rng.standard_normal(2 * n))).astype(np.complex64)
    t = np.arange(n)
    hay[lag_true:lag_true + n] += (needle * np.exp(
        2j * np.pi * f_true * t / FS)).astype(np.complex64)
    write_c64(str(tmp_path / "n.c64"), needle)
    write_c64(str(tmp_path / "h.c64"), hay)
    rc = main(["batch", f"{tmp_path}/n.c64:{tmp_path}/h.c64",
               "--freq-step", "0.25", "--refine", "--json"])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out)[0]
    assert abs(rec["refined_freq_hz"] - f_true) <= 0.01
    assert abs(rec["refined_lag_samples"] - lag_true) <= 0.05


def test_refine_near_capture_edges():
    """Coarse lags at the very start/end of the capture stay in range.

    Frequency tolerance is the SHORT-window f32 floor, not the golden
    contract: at n=512 the |Z|^2 curvature per mHz falls below f32
    epsilon and the zoom saturates ~1e-4 of the (fs/n = 93 Hz) bin
    (see the note in ops/refine._refine_jit)."""
    rng = np.random.default_rng(11)
    n, total = 512, 4096
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t = np.arange(n)
    for lag in (0, total - n):
        hay = (1e-4 * (rng.standard_normal(total) + 1j
                       * rng.standard_normal(total))).astype(np.complex64)
        hay[lag:lag + n] += (needle * np.exp(
            2j * np.pi * 25.0 * t / FS)).astype(np.complex64)
        f_hat, tau_hat, _ = refine_peak(needle, hay, 25.0, lag, FS,
                                        coarse_step_hz=0.5, backend="xla")
        assert abs(f_hat - 25.0) <= 0.05
        assert abs(tau_hat - lag) <= 0.05


def test_cli_run_refine(fixture_pairs, capsys):
    from caf_cookoff_tpu.cli import main

    needle, haystack = fixture_pairs[1]           # chirp_1: +35.99 Hz
    rc = main(["run", str(needle), str(haystack), "--freq-start", "30",
               "--freq-stop", "40", "--freq-step", "1.0", "--refine"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Frequency offset: 36.000 Hz" in out    # the coarse snap
    line = [ln for ln in out.splitlines()
            if ln.startswith("Refined estimate:")]
    assert line
    f_ref = float(line[0].split()[2])
    assert abs(f_ref - 35.99) <= 0.01


@pytest.mark.parametrize("f0,rate,lag", [(35.99, 3.7, 1234),
                                          (-92.12, -5.1, 777),
                                          (10.0, 0.0, 500)])
def test_refine_peak_rate(f0, rate, lag):
    """Second-order refinement recovers a linear frequency sweep —
    capability past the reference's first-order CAF model entirely
    (its generator supports time-varying offsets,
    ``utils/generate.py:10-20``, but no engine searches them).  The
    rate resolution cell is 1/T^2 ~ 137 Hz/s at this window; the
    estimator lands within ~1/500 of a cell."""
    from caf_cookoff_tpu.ops.refine import refine_peak_rate

    rng = np.random.default_rng(3)
    n, total = 4096, 16384
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t_sec = np.arange(n) / FS
    hay = (1e-5 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))).astype(np.complex64)
    sweep = np.exp(2j * np.pi * f0 * t_sec + 1j * np.pi * rate * t_sec ** 2)
    hay[lag:lag + n] += (needle * sweep).astype(np.complex64)
    f_mean = f0 + rate * (n / FS) / 2       # what a coarse engine sees
    f_hat, r_hat, tau_hat, value = refine_peak_rate(
        needle, hay, round(f_mean * 2) / 2, lag, FS,
        coarse_step_hz=0.5, backend="xla")
    assert abs(f_hat - f0) <= 0.01
    assert abs(r_hat - rate) <= 0.25
    assert abs(tau_hat - lag) <= 0.01
    assert value > 0


def test_cli_num_peaks_refine_combined(tmp_path, capsys):
    """--num-peaks P --refine refines EVERY lattice peak."""
    from caf_cookoff_tpu.cli import main
    from caf_cookoff_tpu.utils.io import write_c64

    rng = np.random.default_rng(5)
    n, total = 1024, 32768
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))).astype(np.complex64)
    truths = [(-30.0, 9000), (45.0, 20000)]
    t = np.arange(n)
    for amp, (f, lag) in zip((1.0, 0.7), truths):
        hay[lag:lag + n] += (amp * needle * np.exp(
            2j * np.pi * f * t / FS)).astype(np.complex64)
    write_c64(str(tmp_path / "n.c64"), needle)
    write_c64(str(tmp_path / "h.c64"), hay)
    rc = main(["run", str(tmp_path / "n.c64"), str(tmp_path / "h.c64"),
               "--full-haystack", "--num-peaks", "2", "--refine",
               "--freq-step", "2.5"])
    assert rc == 0
    out = capsys.readouterr().out
    peak_lines = [ln for ln in out.splitlines() if ln.startswith("peak ")]
    assert len(peak_lines) == 2
    for ln, (f, lag) in zip(peak_lines, truths):
        assert "refined" in ln
        ref_f = float(ln.split("refined")[1].split()[0])
        ref_t = float(ln.split("@")[-1])
        assert abs(ref_f - f) <= 0.01
        assert abs(ref_t - lag) <= 0.1


def test_cli_batch_refine(fixture_pairs, capsys):
    from caf_cookoff_tpu.cli import main

    spec = [f"{n}:{h}" for n, h in fixture_pairs[:2]]
    rc = main(["batch", *spec, "--freq-step", "0.25", "--refine",
               "--json"])
    assert rc == 0
    import json

    records = json.loads(capsys.readouterr().out)
    truths = [parse_ground_truth(h) for _, h in fixture_pairs[:2]]
    for rec, gt in zip(records, truths):
        assert abs(rec["refined_freq_hz"] - gt.freq_hz) <= 0.01
        assert abs(rec["refined_lag_samples"] - gt.lag_samples) <= 0.1
