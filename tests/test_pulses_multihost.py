"""Pulse-train generator (grc/generate.grc analog) and multihost helpers."""

import numpy as np
import pytest

from caf_cookoff_tpu.utils.pulses import (
    PulseTrainConfig,
    generate_pulse_train,
    write_pulse_artifacts,
)


def test_pulse_train_structure():
    cfg = PulseTrainConfig(pulse_len=256, gap_len=128, num_pulses=4)
    x = generate_pulse_train(cfg)
    assert x.dtype == np.complex64
    assert len(x) == 4 * (256 + 128)
    # Gaps are silent, bursts are not.
    assert np.abs(x[256:256 + 128]).max() == 0
    assert np.abs(x[:256]).max() > 0.5


def test_pulse_tones_alternate():
    cfg = PulseTrainConfig(pulse_len=1024, gap_len=0, num_pulses=2,
                           tone_freqs_hz=(1000.0, 2000.0), rrc_alpha=0.0)
    x = generate_pulse_train(cfg)
    fs = cfg.sample_rate
    for p, want in [(0, 1000.0), (1, 2000.0)]:
        burst = x[p * 1024:(p + 1) * 1024]
        spec = np.abs(np.fft.fft(burst))
        f = np.fft.fftfreq(1024, 1 / fs)[spec.argmax()]
        assert abs(f - want) < fs / 1024


def test_pulse_artifacts(tmp_path):
    from scipy.io import wavfile

    from caf_cookoff_tpu.utils.sigmf import read_sigmf

    cfg = PulseTrainConfig(pulse_len=128, gap_len=64, num_pulses=2)
    x = write_pulse_artifacts(tmp_path / "pulses", cfg)
    rate, wav = wavfile.read(tmp_path / "pulses.wav")
    assert rate == 48000 and wav.shape == (len(x), 2)
    np.testing.assert_allclose(wav[:, 0], x.real, atol=1e-6)
    rec = read_sigmf(tmp_path / "pulses")
    np.testing.assert_array_equal(rec.samples, x)
    assert rec.global_meta["caf:tone_freqs_hz"] == [1000.0, 2000.0]


def test_pulse_caf_detects_itself():
    """A pulse burst CAF'd against a delayed copy of the train recovers
    the delay — the capture-workflow exercise the flowgraphs enable."""
    from caf_cookoff_tpu.models.overlap_save import overlap_save_peak

    cfg = PulseTrainConfig(pulse_len=512, gap_len=256, num_pulses=3)
    train = generate_pulse_train(cfg)
    needle = train[:512]
    lag = 700
    capture = np.concatenate(
        [np.zeros(lag, np.complex64), train]).astype(np.complex64)
    # Single tone bursts repeat, but the first (earliest) match wins the
    # tie-break only if strictly greater; search a narrow window instead.
    freqs = np.zeros(1, dtype=np.float32)
    _, got_lag, _ = overlap_save_peak(needle, capture[:1500], freqs,
                                      cfg.sample_rate)
    assert got_lag == lag


def test_global_mesh_cpu():
    from caf_cookoff_tpu.parallel import multihost

    mesh = multihost.global_mesh(pair=2, time=1)
    assert mesh.shape["pair"] == 2
    assert mesh.shape["doppler"] == 4  # 8 virtual devices / 2
    with pytest.raises(ValueError):
        multihost.global_mesh(pair=3)
    assert "process 0/1" in multihost.process_info()
