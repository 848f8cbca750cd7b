"""Second-order CAF: the dechirp-bank coarse engine (models/rate.py)
chained into the joint (freq, rate, lag) refine.

The reference's model is strictly first-order; a hard sweep (rate*T
many doppler bins) smears its surface peak.  These tests pin that the
dechirp bank recovers such an emitter coherently, that the unswept case
still routes to rate 0, and that chaining into refine_peak_rate with
the bank's answer yields continuous estimates.
"""

import numpy as np

from caf_cookoff_tpu.models.filterbank import caf_peak
from caf_cookoff_tpu.models.rate import rate_caf_peak
from caf_cookoff_tpu.ops.refine import refine_peak_rate

FS = 48_000.0


def _swept_pair(f0, rate, lag, n=4096, seed=3):
    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t_sec = np.arange(n) / FS
    hay = (1e-4 * (rng.standard_normal(n)
                   + 1j * rng.standard_normal(n))).astype(np.complex64)
    cp = (needle * np.exp(2j * np.pi * f0 * t_sec
                          + 1j * np.pi * rate * t_sec ** 2)
          ).astype(np.complex64)
    hay[lag:] += cp[: n - lag]
    return needle, hay


def test_rate_bank_recovers_hard_sweep():
    """412 Hz/s over an 85 ms window = ~70 doppler bins of smear: the
    first-order peak degrades; the dechirp bank recovers (r, f, lag)
    coherently with a visibly larger peak value."""
    f0, rate_true, lag = 20.0, 412.34, 137
    needle, hay = _swept_pair(f0, rate_true, lag)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    _, _, v1 = caf_peak(needle, hay, freqs, FS, backend="xla")
    rates = np.arange(-600.0, 601.0, 100.0)
    r_hat, f_hat, lag_hat, v = rate_caf_peak(needle, hay, freqs, rates,
                                             FS, backend="xla")
    assert lag_hat == lag
    assert abs(r_hat - rate_true) <= 100.0       # within one grid step
    assert abs(f_hat - f0) <= 1.0
    assert v > 1.3 * v1                           # coherent vs smeared


def test_rate_bank_zero_rate_emitter():
    """An unswept emitter routes to the r=0 bank entry and matches the
    first-order answer exactly."""
    f0, lag = -41.5, 70
    needle, hay = _swept_pair(f0, 0.0, lag)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    want = caf_peak(needle, hay, freqs, FS, backend="xla")
    rates = np.arange(-600.0, 601.0, 100.0)
    r_hat, f_hat, lag_hat, _ = rate_caf_peak(needle, hay, freqs, rates,
                                             FS, backend="xla")
    assert r_hat == 0.0
    assert (f_hat, lag_hat) == want[:2]


def test_rate_bank_chained_refine():
    """bank coarse -> refine_peak_rate(rate0=bank answer) recovers the
    sweep continuously."""
    f0, rate_true, lag = 20.0, 412.34, 137
    needle, hay = _swept_pair(f0, rate_true, lag)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    rates = np.arange(-600.0, 601.0, 100.0)
    r_hat, f_hat, lag_hat, _ = rate_caf_peak(needle, hay, freqs, rates,
                                             FS, backend="xla")
    f2, r2, t2, _ = refine_peak_rate(
        needle, hay, f_hat, lag_hat, FS, rate0_hz_per_s=r_hat,
        max_rate_hz_per_s=100.0, coarse_step_hz=0.5, backend="xla")
    assert abs(f2 - f0) <= 0.02
    assert abs(r2 - rate_true) <= 0.1
    assert abs(t2 - lag) <= 0.01


def _long_swept_capture(f0=-400.0, rate=400.0, lag=50_000,
                        n=4096, total=65_536 + 4_096, sigma=0.002,
                        seed=42):
    """An accelerating emitter DEEP into a long capture — the scenario
    the reference's generator can synthesize (capture-absolute phase
    integration, ``utils/generate.py:10-20``) but nothing anywhere in
    it can search.  Window-start frequency is ``f0 + rate*lag/fs``."""
    rng = np.random.default_rng(seed)
    from scipy.signal import filtfilt, firwin

    taps = firwin(127, 0.25)
    needle = filtfilt(taps, 1.0, rng.standard_normal(n)
                      + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (sigma * (rng.standard_normal(total)
                    + 1j * rng.standard_normal(total))
           ).astype(np.complex64)
    t_abs = (lag + np.arange(n)) / FS
    ph = 2 * np.pi * f0 * t_abs + np.pi * rate * t_abs * t_abs
    hay[lag:lag + n] += (needle * np.exp(1j * ph)).astype(np.complex64)
    return needle, hay, f0 + rate * lag / FS


def test_rate_overlap_save_long_capture_end_to_end():
    """VERDICT round-3 item 6's done-criterion: a 400 Hz/s sweep at lag
    ~50k in a 65536-lag capture, recovered coarse (dechirp bank riding
    the overlap-save scan) -> refined to <=0.1 Hz/s."""
    from caf_cookoff_tpu.models.rate import rate_overlap_save_peak

    rate_true, lag_true = 400.0, 50_000
    needle, hay, f_ws = _long_swept_capture(rate=rate_true, lag=lag_true)
    freqs = np.arange(-100.0, 100.1, 2.5, dtype=np.float32)
    rates = np.arange(-600.0, 601.0, 150.0)
    r_c, f_c, lag_c, v_c = rate_overlap_save_peak(
        needle, hay, freqs, rates, FS, backend="xla")
    assert abs(lag_c - lag_true) <= 2           # linear absolute lag
    assert abs(r_c - rate_true) <= 150.0        # within one bank step
    f2, r2, t2, _ = refine_peak_rate(
        needle, hay, f_c, lag_c, FS, rate0_hz_per_s=r_c,
        max_rate_hz_per_s=150.0, coarse_step_hz=2.5, backend="xla")
    assert abs(r2 - rate_true) <= 0.1
    assert abs(t2 - lag_true) <= 0.1
    assert abs(f2 - f_ws) <= 0.05


def test_cli_full_haystack_rate_grid(tmp_path, capsys):
    """`run --full-haystack --rate-grid`: the bank rides the
    overlap-save scan, so an accelerating emitter at a lag far past the
    needle length is found (ADVICE r3: the old path searched only
    haystack[:n] and mis-unwrapped the lag)."""
    from caf_cookoff_tpu.cli import main
    from caf_cookoff_tpu.utils.io import write_c64

    rate_true, lag_true = 400.0, 20_000
    # f0 chosen so the window-start frequency f0 + r*lag/fs (+16.7 Hz)
    # lands inside the +-100 Hz search grid.
    needle, hay, f_ws = _long_swept_capture(
        f0=-150.0, rate=rate_true, lag=lag_true, total=32_768)
    n_path, h_path = tmp_path / "n.c64", tmp_path / "h.c64"
    write_c64(str(n_path), needle)
    write_c64(str(h_path), hay)
    rc = main(["run", str(n_path), str(h_path), "--full-haystack",
               "--freq-start", "-100", "--freq-stop", "100",
               "--freq-step", "2.5", "--rate-grid=-600:600:150"])
    assert rc == 0
    out = capsys.readouterr().out
    line = [ln for ln in out.splitlines()
            if ln.startswith("Second-order estimate")][0]
    # "Second-order estimate: {f:+.4f} Hz {r:+.3f} Hz/s @ {t:.4f} samples"
    parts = line.split()
    f2, r2, t2 = float(parts[2]), float(parts[4]), float(parts[7])
    assert abs(r2 - rate_true) <= 0.1
    assert abs(t2 - lag_true) <= 0.1
    assert abs(f2 - f_ws) <= 0.05


def test_rate_overlap_save_zero_rate_matches_first_order():
    """r=0 bank entry over a long capture == the plain overlap-save
    answer (the composition degrades gracefully to first order)."""
    from caf_cookoff_tpu.models.overlap_save import overlap_save_peak
    from caf_cookoff_tpu.models.rate import rate_overlap_save_peak

    needle, hay, _ = _long_swept_capture(f0=30.0, rate=0.0, lag=20_000,
                                         total=32_768)
    freqs = np.arange(-100.0, 100.1, 2.5, dtype=np.float32)
    want = overlap_save_peak(needle, hay, freqs, FS, backend="xla")
    r_c, f_c, lag_c, _ = rate_overlap_save_peak(
        needle, hay, freqs, np.array([-300.0, 0.0, 300.0]), FS,
        backend="xla")
    assert r_c == 0.0
    assert (f_c, lag_c) == want[:2]


def test_refine_rate_narrow_bracket_converges_and_respects_bounds():
    """A sub-Hz/s bracket (narrower than the f64 polish's 4 Hz/s
    re-bracketing floor) must still converge to fine precision AND
    never return a rate outside rate0 +/- max_rate.  Regression: the
    polish once derived its next span from the CLIPPED grid, which
    collapsed to ~0 after one iteration (freezing at coarse
    resolution, measured 0.087 Hz/s error); and before the clip the
    candidates could walk several Hz/s outside the bracket."""
    rng = np.random.default_rng(3)
    n = 4096
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t_sec = np.arange(n) / FS
    rate_true, f0, lag = 0.313, 20.0, 137
    hay = np.zeros(8192, np.complex64)
    hay[lag:lag + n] = (needle * np.exp(
        2j * np.pi * f0 * t_sec
        + 1j * np.pi * rate_true * t_sec ** 2)).astype(np.complex64)
    f, r, tau, _ = refine_peak_rate(needle, hay, f0, lag, FS,
                                    rate0_hz_per_s=0.0,
                                    max_rate_hz_per_s=0.5)
    assert -0.5 <= r <= 0.5                      # bracket respected
    assert abs(r - rate_true) <= 1e-3, r         # fine convergence
    assert abs(f - f0) <= 0.01 and abs(tau - lag) <= 0.01


# ---- multi-emitter + detection through the rate x long-capture path ----

from caf_cookoff_tpu.models.rate import (  # noqa: E402
    rate_overlap_save_peak,
    rate_overlap_save_peaks,
)


def _swept_capture(emitters, n=2048, length=8192, seed=5, noise=0.01):
    """Long capture with several independently swept copies of one
    needle: ``emitters`` is a list of (f0_hz, rate_hz_per_s, lag, amp)."""
    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    t_sec = np.arange(n) / FS
    hay = (noise * (rng.standard_normal(length)
                    + 1j * rng.standard_normal(length))
           ).astype(np.complex64)
    for f0, rate, lag, amp in emitters:
        cp = amp * needle * np.exp(2j * np.pi * f0 * t_sec
                                   + 1j * np.pi * rate * t_sec ** 2)
        hay[lag:lag + n] += cp.astype(np.complex64)
    return needle, hay


FREQS_LAT = np.arange(-60, 60, 0.5, dtype=np.float32)
RATES_LAT = np.arange(-600.0, 601.0, 200.0)


def test_rate_lattice_two_emitters():
    """Two accelerating emitters at distinct (rate, lag) both reach the
    lattice with their own coherent (rate, freq, lag) triples."""
    emitters = [(20.0, 400.0, 4500, 1.0), (-31.0, -200.0, 900, 0.8)]
    needle, hay = _swept_capture(emitters)
    rr, ff, ll, vv = rate_overlap_save_peaks(
        needle, hay, FREQS_LAT, RATES_LAT, FS, num_peaks=2,
        backend="xla")
    got = sorted(zip(ll.tolist(), rr.tolist(), ff.tolist()))
    want = sorted((lag, r, f0) for f0, r, lag, _ in emitters)
    for (lg_g, r_g, f_g), (lg_w, r_w, f_w) in zip(got, want):
        assert lg_g == lg_w
        assert r_g == r_w                    # grid-exact rates injected
        assert abs(f_g - f_w) <= 1.0
    assert np.all(np.isfinite(vv))


def test_rate_lattice_weak_emitter_survives_strong_rate_ghosts():
    """A weak UNSWEPT emitter must not be displaced by the strong swept
    emitter's residual-chirp ridge at mismatched trial rates: cross-rate
    candidates merge in window-center frequency space with a rate-aware
    suppression window, so every surviving slot near the strong lag is
    either its matched-rate entry or a same-rate sinc sidelobe (the
    first-order engines' shared semantics) — never a different-rate
    ghost."""
    strong = (20.0, 400.0, 4500, 1.0)
    weak = (-45.0, 0.0, 900, 0.25)
    needle, hay = _swept_capture([strong, weak])
    rr, ff, ll, vv, snr = rate_overlap_save_peaks(
        needle, hay, FREQS_LAT, RATES_LAT, FS, num_peaks=5,
        backend="xla", with_snr=True)
    assert ll[0] == strong[2] and rr[0] == strong[1]
    assert abs(ff[0] - strong[0]) <= 1.0
    # The weak emitter holds slot 1 (strongest-first ordering).
    assert ll[1] == weak[2] and rr[1] == weak[1]
    assert abs(ff[1] - weak[0]) <= 1.0
    assert snr[1] > 10.0
    # No different-rate ghost within the strong emitter's lag cell.
    near_strong = np.abs(ll - strong[2]) <= 64
    finite = np.isfinite(vv)
    assert np.all(rr[near_strong & finite] == strong[1])


def test_rate_lattice_noise_only_zero_detections():
    """A noise-only capture yields ZERO detections at the auto
    threshold — every slot masks to -inf (the reference reports an
    unconditional argmax; detection decisions are the capability past
    it)."""
    needle, hay = _swept_capture([], noise=1.0)
    rr, ff, ll, vv = rate_overlap_save_peaks(
        needle, hay, FREQS_LAT, RATES_LAT, FS, num_peaks=3,
        backend="xla", min_snr_db="auto")
    assert np.all(np.isneginf(vv))


def test_rate_lattice_single_matches_argmax_engine():
    """num_peaks=1 reproduces rate_overlap_save_peak's triple exactly
    (same scan, same tie-breaks)."""
    needle, hay = _swept_capture([(12.5, -400.0, 3000, 1.0)])
    r1, f1, l1, v1 = rate_overlap_save_peak(
        needle, hay, FREQS_LAT, RATES_LAT, FS, backend="xla")
    rr, ff, ll, vv = rate_overlap_save_peaks(
        needle, hay, FREQS_LAT, RATES_LAT, FS, num_peaks=1,
        backend="xla")
    assert (rr[0], ff[0], int(ll[0])) == (r1, f1, l1)
    assert np.isclose(vv[0], v1, rtol=1e-6)

def test_cli_rate_grid_num_peaks_lattice(tmp_path, capsys):
    """`run --full-haystack --rate-grid --num-peaks N` lists the N
    strongest ACCELERATING emitters (rate column, per-peak SNR,
    detection count) — replacing the first-order lattice, which would
    smear the swept emitter."""
    from caf_cookoff_tpu.cli import main
    from caf_cookoff_tpu.utils.io import write_c64

    emitters = [(20.0, 400.0, 4500, 1.0), (-31.0, -200.0, 900, 0.8)]
    needle, hay = _swept_capture(emitters)
    n_path, h_path = tmp_path / "n.c64", tmp_path / "h.c64"
    write_c64(str(n_path), needle)
    write_c64(str(h_path), hay)
    # Threshold above the strong emitter's ~-13 dB sinc sidelobes so
    # slot 3 reports as a NON-detection, proving the decision logic.
    rc = main(["run", str(n_path), str(h_path), "--full-haystack",
               "--freq-start", "-60", "--freq-stop", "60",
               "--freq-step", "0.5", "--rate-grid=-600:600:200",
               "--num-peaks", "3", "--min-snr-db", "28"])
    assert rc == 0
    out = capsys.readouterr().out
    assert "Detections: 2 of 3 rate-lattice slots" in out
    rows = [ln for ln in out.splitlines() if ln.startswith("peak ")]
    assert len(rows) == 3
    got = []
    for ln in rows[:2]:
        parts = ln.split()
        got.append((int(parts[8]), float(parts[4]), float(parts[2])))
    want = sorted(((lag, r, f0) for f0, r, lag, _ in emitters),
                  key=lambda x: -x[0])  # strong (lag 4500) first
    for (lg_g, r_g, f_g), (lg_w, r_w, f_w) in zip(
            sorted(got), sorted(want)):
        assert lg_g == lg_w and r_g == r_w and abs(f_g - f_w) <= 1.0
    # Slot 3 is a NON-detection either way the engine says it: the
    # serial scan keeps a sub-threshold sidelobe slot ("below detection
    # threshold"), the round-5 segmented engine dedups it away entirely
    # ("no further distinct peaks") — both prove the decision logic.
    assert ("(below detection threshold)" in rows[2]
            or "(no further distinct peaks)" in rows[2]), rows[2]


# ---------------------------------------------------------------------------
# Segmented (de-serialized) rate engine — round 5
# ---------------------------------------------------------------------------


def _segmented_capture(f0, rate, lag, n=2048, total=16384, seed=8):
    rng = np.random.default_rng(seed)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))
           ).astype(np.complex64)
    t = np.arange(n)
    ph = 2 * np.pi * f0 * t / FS + np.pi * rate * (t / FS) ** 2
    hay[lag:lag + n] += (needle * np.exp(1j * ph)).astype(np.complex64)
    return needle, hay


def test_stein_rate_plain_grid_matches_serial_engine():
    """Plain grid: the segmented rate search (rates as synthesis rows)
    matches the exact serial scan bit-for-bit, swept and unswept."""
    from caf_cookoff_tpu.models.rate import (
        rate_overlap_save_peak,
        stein_rate_os_peak,
    )

    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    rates = np.arange(-240.0, 241.0, 60.0, dtype=np.float32)
    needle, hay = _segmented_capture(25.0, 120.0, 9000)
    exact = rate_overlap_save_peak(needle, hay, freqs, rates, FS)
    fast = stein_rate_os_peak(needle, hay, freqs, rates, FS)
    assert fast == exact
    needle, hay0 = _segmented_capture(-40.0, 0.0, 5000, seed=9)
    exact0 = rate_overlap_save_peak(needle, hay0, freqs, rates, FS)
    fast0 = stein_rate_os_peak(needle, hay0, freqs, rates, FS)
    assert fast0[:3] == exact0[:3] == (0.0, -40.0, 5000)


def test_stein_rate_banded_grid_matches_serial_engine():
    """Wide fine grid routes BANDED with the rate drift folded into the
    band envelope; answers still match the exact serial scan."""
    from caf_cookoff_tpu.models.rate import (
        rate_overlap_save_peak,
        stein_rate_os_peak,
    )
    from caf_cookoff_tpu.models.stein import _plan_bands

    freqs = np.linspace(-500, 500, 400, endpoint=False).astype(np.float32)
    rates = np.arange(-240.0, 241.0, 60.0, dtype=np.float32)
    margin = 240.0 * (2048 / FS)
    assert _plan_bands(FS, freqs, margin_hz=margin) is not None
    needle, hay = _segmented_capture(float(freqs[317]), -180.0, 7000,
                                      seed=2)
    exact = rate_overlap_save_peak(needle, hay, freqs, rates, FS)
    fast = stein_rate_os_peak(needle, hay, freqs, rates, FS)
    assert fast[:3] == exact[:3]
    np.testing.assert_allclose(fast[3], exact[3], rtol=2e-5)


def test_stein_rate_respects_num_lags():
    """An emitter past the requested lag bound must not be reported."""
    from caf_cookoff_tpu.models.rate import (
        rate_overlap_save_peak,
        stein_rate_os_peak,
    )

    freqs = np.arange(-100, 100, 1.0, dtype=np.float32)
    rates = np.arange(-120.0, 121.0, 60.0, dtype=np.float32)
    needle, hay = _segmented_capture(30.0, 60.0, 12000, seed=4)
    # Second, weaker emitter inside the bound.
    t = np.arange(2048)
    ph = 2 * np.pi * (-50.0) * t / FS + np.pi * (-60.0) * (t / FS) ** 2
    hay[3000:3000 + 2048] += 0.5 * (needle * np.exp(1j * ph)
                                    ).astype(np.complex64)
    exact = rate_overlap_save_peak(needle, hay, freqs, rates, FS,
                                   num_lags=8000)
    fast = stein_rate_os_peak(needle, hay, freqs, rates, FS,
                              num_lags=8000)
    assert fast[:3] == exact[:3] == (-60.0, -50.0, 3000)


def test_stein_rate_margin_shrinks_blocks():
    """The rate-augmented envelope must bind: large rates shrink the
    eligible block length (or raise), never silently overrun it."""
    import pytest

    from caf_cookoff_tpu.errors import SpanError
    from caf_cookoff_tpu.models.rate import _rate_block_len

    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    d_small = _rate_block_len(FS, freqs, np.asarray([0.0]), 4096, 128)
    d_big = _rate_block_len(FS, freqs, np.asarray([4000.0]), 4096, 128)
    assert d_big <= d_small
    with pytest.raises(SpanError):
        _rate_block_len(FS, np.asarray([23000.0], np.float32),
                        np.asarray([0.0]), 4096, 128)


def test_stein_rate_lattice_matches_serial_on_emitters():
    """Segmented multi-emitter rate search: both accelerating emitters
    recovered with the exact serial lattice's (rate, freq, lag) rows;
    detection SNR against the model floor."""
    from caf_cookoff_tpu.models.rate import (
        rate_overlap_save_peaks,
        stein_rate_os_peaks,
    )

    rng = np.random.default_rng(8)
    n, total = 2048, 16384
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))
           ).astype(np.complex64)
    t = np.arange(n)
    emitters = [(25.0, 120.0, 3000, 1.0), (-60.0, -120.0, 11000, 0.6)]
    for f0, r, lag, amp in emitters:
        ph = 2 * np.pi * f0 * t / FS + np.pi * r * (t / FS) ** 2
        hay[lag:lag + n] += amp * (needle * np.exp(1j * ph)
                                   ).astype(np.complex64)
    freqs = np.arange(-100, 100, 0.5, dtype=np.float32)
    rates = np.arange(-240.0, 241.0, 60.0, dtype=np.float32)

    def rows(o):
        return [(float(r), float(f), int(l))
                for r, f, l, v in zip(o[0], o[1], o[2], o[3])
                if np.isfinite(float(v))]

    want = rows(rate_overlap_save_peaks(needle, hay, freqs, rates, FS,
                                        3))
    got = rows(stein_rate_os_peaks(needle, hay, freqs, rates, FS, 3))
    truths = [(r, f, lag) for f, r, lag, _ in emitters]
    assert got[:2] == want[:2] == truths
    out = stein_rate_os_peaks(needle, hay, freqs, rates, FS, 3,
                              min_snr_db="auto", with_snr=True)
    snr = [float(s) for s in out[4] if np.isfinite(float(s))]
    assert len(snr) >= 2 and min(snr[:2]) > 25


def test_stein_rate_lattice_noise_only_zero_detections():
    from caf_cookoff_tpu.models.rate import stein_rate_os_peaks

    rng = np.random.default_rng(9)
    n, total = 1024, 8192
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    noise = (1e-3 * (rng.standard_normal(total)
                     + 1j * rng.standard_normal(total))
             ).astype(np.complex64)
    freqs = np.arange(-100, 100, 1.0, dtype=np.float32)
    rates = np.arange(-120.0, 121.0, 60.0, dtype=np.float32)
    out = stein_rate_os_peaks(needle, noise, freqs, rates, FS, 3,
                              min_snr_db="auto")
    assert not np.isfinite(out[3]).any()


def test_stein_rate_banded_pad_bins_stay_off_grid():
    """Round-5 review fix: on banded grids with k % kb != 0 the pad
    bins must not reach the exact re-score — the reported frequency
    must be IN the requested grid, matching the serial engine."""
    from caf_cookoff_tpu.models.rate import (
        rate_overlap_save_peak,
        stein_rate_os_peak,
    )
    from caf_cookoff_tpu.models.stein import _band_routing

    freqs = np.arange(20000.0, 22001.0, 500.0, dtype=np.float32)  # 5 bins
    rates = np.asarray([0.0], dtype=np.float32)
    n, total = 2048, 8192
    use_banded, d, freqs_pad, _, _ = _band_routing(FS, freqs, None)
    assert use_banded and len(freqs_pad) > len(freqs)  # pad bins exist
    rng = np.random.default_rng(3)
    needle = (rng.standard_normal(n)
              + 1j * rng.standard_normal(n)).astype(np.complex64)
    hay = (1e-4 * (rng.standard_normal(total)
                   + 1j * rng.standard_normal(total))
           ).astype(np.complex64)
    t = np.arange(n)
    # Emitter just PAST the grid edge — nearest pad bin would "win" if
    # unmasked; the correct answer is the best in-grid bin.
    hay[3000:3000 + n] += (needle * np.exp(
        2j * np.pi * 22400.0 * t / FS)).astype(np.complex64)
    want = rate_overlap_save_peak(needle, hay, freqs, rates, FS)
    got = stein_rate_os_peak(needle, hay, freqs, rates, FS)
    assert float(got[1]) in set(float(f) for f in freqs), got
    assert got[:3] == want[:3], (got, want)
