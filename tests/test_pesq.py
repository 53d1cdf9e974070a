"""PESQ-nb (numpy P.862-style) property and fixture tests.

Reference usage: hifi-gan/evaluate_metric.py:44-72, inference.py:44-80."""

import os

import numpy as np
import pytest

from conftest import REFERENCE, reference_available
from covomix_tpu.util.pesq_nb import pesq_nb


def _speechish(seconds=3.0, sr=8000, seed=0):
    t = np.arange(int(sr * seconds)) / sr
    x = np.zeros_like(t)
    for f0 in (120, 240, 360, 480, 600):
        x += np.sin(2 * np.pi * f0 * t) / f0 * 120
    x *= (0.5 + 0.5 * np.sin(2 * np.pi * 3 * t)) ** 2
    return x * 0.1


def test_identity_is_maximal():
    x = _speechish()
    assert pesq_nb(x, x) == pytest.approx(4.5, abs=1e-6)


def test_monotone_in_snr():
    x = _speechish()
    rng = np.random.RandomState(1)
    sig_p = np.mean(x ** 2)
    scores = []
    for snr in (40, 30, 20, 10):
        noise = rng.randn(len(x)) * np.sqrt(sig_p / 10 ** (snr / 10))
        scores.append(pesq_nb(x, x + noise))
    assert all(a > b for a, b in zip(scores, scores[1:])), scores
    assert scores[0] > 3.5          # 40 dB SNR still near-transparent
    assert scores[-1] < 2.0         # 10 dB SNR clearly degraded


def test_scale_invariance():
    """Level alignment: a pure gain must not tank the score."""
    x = _speechish()
    assert pesq_nb(x, 0.3 * x) > 4.3
    assert pesq_nb(x, 2.5 * x) > 4.3


def test_delay_robustness():
    """Time alignment absorbs a constant delay (P.862 crude align)."""
    x = _speechish()
    d = 64
    delayed = np.concatenate([np.zeros(d), x[:-d]])
    assert pesq_nb(x, delayed) > 4.3


def test_noise_vs_speech_is_bad():
    x = _speechish()
    rng = np.random.RandomState(2)
    assert pesq_nb(x, rng.randn(len(x)) * np.sqrt(np.mean(x ** 2))) < 1.5


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_fixture_copy_synthesis_plausible():
    """Reference golden pairs (hifi-gan/hifigan_test): vocoder copy-synthesis
    of clean speech must land in the published-plausible 3.5-4.5 band."""
    import glob

    from covomix_tpu.audio.wav import load_wav

    gen_dir = os.path.join(REFERENCE, "hifi-gan/hifigan_test/output_wav_12k")
    ref_dir = os.path.join(REFERENCE, "hifi-gan/hifigan_test/input_wav")
    pairs = 0
    for gen in sorted(glob.glob(os.path.join(gen_dir, "*_generated.wav"))):
        name = os.path.basename(gen).replace("_generated", "")
        ref = os.path.join(ref_dir, name)
        if not os.path.isfile(ref):
            continue
        g, sr = load_wav(gen)
        r, _ = load_wav(ref)
        n = min(len(g), len(r))
        score = pesq_nb(r[:n], g[:n], sr)
        assert 3.5 <= score <= 4.5, (name, score)
        pairs += 1
    assert pairs >= 2


# Pinned goldens (VERDICT r3 item 7): pesq_nb_approx values on the reference
# hifigan_test fixture pairs, frozen so refactors cannot silently shift the
# metric's scale. These are values of THIS implementation (deviation list in
# util/pesq_nb.py's docstring), NOT ITU P.862 conformance numbers — the ITU
# binary is unavailable offline. If a deliberate algorithm change moves them,
# re-pin and record the shift in PARITY.md.
_PINNED = {
    "908-31957-0024_5142-36586-0004.wav": 4.246163,
    "908-31957-0024_5683-32865-0017.wav": 4.229922,
}


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_fixture_scores_pinned():
    from covomix_tpu.audio.wav import load_wav

    gen_dir = os.path.join(REFERENCE, "hifi-gan/hifigan_test/output_wav_12k")
    ref_dir = os.path.join(REFERENCE, "hifi-gan/hifigan_test/input_wav")
    for name, expected in _PINNED.items():
        g, sr = load_wav(os.path.join(gen_dir, name.replace(".wav", "_generated.wav")))
        r, _ = load_wav(os.path.join(ref_dir, name))
        n = min(len(g), len(r))
        assert pesq_nb(r[:n], g[:n], sr) == pytest.approx(expected, abs=2e-4), name
