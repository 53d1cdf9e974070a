"""Mel frontend golden tests vs the reference fixtures (SURVEY §7 step 1)."""

import numpy as np
import pytest

from covomix_tpu.audio import MelConfig, mel_spectrogram, load_wav, log_mel_floor
from covomix_tpu.audio.mel import mel_filterbank, mel_frames_for_samples

from conftest import REFERENCE, reference_available

FIXTURES = [
    "908-31957-0024_5142-36586-0004",
    "908-31957-0024_5683-32865-0017",
]
CFG16 = MelConfig(sample_rate=16000, n_fft=1024, num_mels=80, hop_size=256, win_size=1024, fmin=0.0, fmax=8000.0)


@pytest.mark.skipif(not reference_available(), reason="reference fixtures not mounted")
@pytest.mark.parametrize("name", FIXTURES)
def test_golden_mel_parity(name):
    wav, sr = load_wav(f"{REFERENCE}/hifi-gan/hifigan_test/input_wav/{name}.wav")
    assert sr == 16000
    ref = np.load(f"{REFERENCE}/hifi-gan/hifigan_test/input_mel/{name}.npy")
    mel = np.asarray(mel_spectrogram(wav[None], CFG16))[0]
    assert mel.shape[0] == 80
    assert mel.shape[1] == ref.shape[1]
    diff = np.abs(mel - ref)
    assert diff.max() < 1e-4, f"max abs err {diff.max()}"
    assert diff.mean() < 2e-5


@pytest.mark.skipif(not reference_available(), reason="reference fixtures not mounted")
@pytest.mark.parametrize("name", FIXTURES)
def test_golden_mel_mcd_within_budget(name):
    """MCD between our log-mel and the reference fixture mel must be far inside
    the 0.1 dB budget (BASELINE.md) — the frontend contributes ~0 of it."""
    from covomix_tpu.util.metrics import mcd

    wav, _ = load_wav(f"{REFERENCE}/hifi-gan/hifigan_test/input_wav/{name}.wav")
    ref = np.load(f"{REFERENCE}/hifi-gan/hifigan_test/input_mel/{name}.npy")
    mel = np.asarray(mel_spectrogram(wav[None], CFG16))[0]
    d = mcd(ref.T, mel.T)
    assert d < 0.001, f"frontend MCD {d} dB"


def test_silence_hits_log_floor():
    mel = np.asarray(mel_spectrogram(np.zeros((1, 8000), np.float32), MelConfig()))
    assert np.allclose(mel, log_mel_floor, atol=1e-4)


def test_frame_count_formula():
    cfg = MelConfig()
    wav = np.random.RandomState(0).randn(1, 16000).astype(np.float32) * 0.1
    mel = np.asarray(mel_spectrogram(wav, cfg))
    assert mel.shape[2] == mel_frames_for_samples(16000, cfg) == 100  # 20 ms hop @8 kHz -> 50 Hz


def test_filterbank_shape_and_normalization():
    fb = mel_filterbank(8000, 480, 80, 0.0, 4000.0)
    assert fb.shape == (80, 241)
    assert fb.min() >= 0.0
    # every filter has support
    assert (fb.sum(axis=1) > 0).all()
    # Slaney normalization: peak of each filter ~= 2/(bandwidth)
    assert fb.max() < 1.0
