"""Legacy enhancement surface: complex STFT/iSTFT, spec transforms, Specs.

Parity targets: torch.stft / torch.istft (the reference's helpers,
covomix/data_module.py:805-811) and the spec_fwd/spec_back formulas
(data_module.py:754-781); dataset behavior vs Specs (data_module.py:71-142).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from covomix_tpu.audio.spec import (get_window, istft, spec_back, spec_fwd,
                                    stft_complex)

torch = pytest.importorskip("torch")

N_FFT, HOP = 510, 128  # reference defaults (data_module.py:569-570)


def _torch_win(window_type):
    w = torch.hann_window(N_FFT, periodic=True)
    return torch.sqrt(w) if window_type == "sqrthann" else w


@pytest.mark.parametrize("window_type", ["hann", "sqrthann"])
def test_stft_matches_torch(window_type):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 4 * HOP * 8).astype(np.float32) * 0.3
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(stft_complex(jnp.asarray(x), N_FFT, HOP, window_type))
    ref = torch.stft(torch.from_numpy(x), n_fft=N_FFT, hop_length=HOP,
                     window=_torch_win(window_type), center=True,
                     return_complex=True).numpy()
    assert ours.shape == ref.shape  # [B, F=256, frames]
    scale = np.abs(ref).max()
    assert np.abs(ours - ref).max() / scale < 2e-5


@pytest.mark.parametrize("window_type", ["hann", "sqrthann"])
def test_istft_matches_torch_and_roundtrips(window_type):
    rng = np.random.RandomState(1)
    t = HOP * 40
    x = rng.randn(t).astype(np.float32) * 0.5
    spec = torch.stft(torch.from_numpy(x), n_fft=N_FFT, hop_length=HOP,
                      window=_torch_win(window_type), center=True, return_complex=True)
    ref = torch.istft(spec, n_fft=N_FFT, hop_length=HOP,
                      window=_torch_win(window_type), center=True, length=t).numpy()
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(istft(jnp.asarray(spec.numpy()), N_FFT, HOP,
                                window_type, length=t))
    assert ours.shape == (t,)
    assert np.abs(ours - ref).max() < 1e-4
    # analysis->synthesis round trip reconstructs the interior exactly
    assert np.abs(ours[N_FFT:-N_FFT] - x[N_FFT:-N_FFT]).max() < 1e-4


@pytest.mark.parametrize("transform_type", ["exponent", "log", "none"])
def test_spec_transforms_match_reference_formulas(transform_type):
    rng = np.random.RandomState(2)
    z = (rng.randn(64, 33) + 1j * rng.randn(64, 33)).astype(np.complex64)
    factor, e = 0.15, 0.5
    zt = torch.from_numpy(z)
    if transform_type == "exponent":  # data_module.py:755-761
        ref = (zt.abs() ** e * torch.exp(1j * zt.angle()) * factor).numpy()
    elif transform_type == "log":     # data_module.py:762-765
        ref = (torch.log(1 + zt.abs()) * torch.exp(1j * zt.angle()) * factor).numpy()
    else:
        ref = z
    ours = np.asarray(spec_fwd(jnp.asarray(z), transform_type, factor, e))
    assert np.abs(ours - ref).max() < 1e-5
    back = np.asarray(spec_back(jnp.asarray(ours), transform_type, factor, e))
    assert np.abs(back - z).max() < 1e-4


def test_get_window_matches_torch():
    for wt in ("hann", "sqrthann"):
        assert np.abs(get_window(wt, N_FFT) - _torch_win(wt).numpy()).max() < 1e-6
    with pytest.raises(NotImplementedError):
        get_window("blackman", 16)


# ---------------------------------------------------------------------------
# Specs dataset

def _write_wav(path, x, sr=8000):
    from covomix_tpu.audio.wav import save_wav
    save_wav(str(path), x.astype(np.float32), sr)


@pytest.fixture
def specs_dir(tmp_path):
    rng = np.random.RandomState(3)
    for sub in ("s1", "mix_both", "mix_single"):
        (tmp_path / "train" / sub).mkdir(parents=True)
    for i, t in enumerate([HOP * 300, HOP * 300, HOP * 100]):  # last is short
        x = rng.randn(t) * 0.1
        _write_wav(tmp_path / "train" / "s1" / f"u{i}.wav", x)
        _write_wav(tmp_path / "train" / "mix_both" / f"u{i}.wav", x + rng.randn(t) * 0.05)
        _write_wav(tmp_path / "train" / "mix_single" / f"u{i}.wav", x + rng.randn(t) * 0.02)
    return tmp_path


def _kwargs():
    return dict(n_fft=N_FFT, hop_length=HOP, center=True, window="hann")


def test_specs_dataset_shapes_and_crop(specs_dir):
    from covomix_tpu.data.specs_legacy import Specs

    ds = Specs(str(specs_dir), "train", dummy=False, shuffle_spec=False,
               num_frames=256, stft_kwargs=_kwargs())
    assert len(ds) == 3
    X, Y = ds[0]
    # center=True on (num_frames-1)*hop samples -> exactly num_frames frames
    assert X.shape == (N_FFT // 2 + 1, 256) and Y.shape == X.shape
    assert np.iscomplexobj(np.asarray(X))
    # short file (100*HOP < target) pads instead of cropping
    Xs, _ = ds[2]
    assert Xs.shape == (N_FFT // 2 + 1, 256)


def test_specs_dataset_normalize_modes(specs_dir):
    from covomix_tpu.data.specs_legacy import Specs

    outs = {}
    for mode in ("noisy", "clean", "not"):
        ds = Specs(str(specs_dir), "train", dummy=False, shuffle_spec=False,
                   num_frames=256, normalize=mode, stft_kwargs=_kwargs(),
                   spec_transform=lambda s: s)
        outs[mode] = np.asarray(ds[0][0])
    # different normalization factors scale the clean spectrum differently
    assert not np.allclose(outs["noisy"], outs["clean"])
    assert not np.allclose(outs["clean"], outs["not"])
    # pure rescaling: ratios are constant across bins
    r = np.abs(outs["noisy"]) / np.maximum(np.abs(outs["not"]), 1e-9)
    assert r.std() / r.mean() < 1e-3


def test_specs_dataset_only_enhancement_and_dummy(specs_dir):
    from covomix_tpu.data.specs_legacy import Specs

    ds = Specs(str(specs_dir), "train", dummy=False, shuffle_spec=False,
               num_frames=256, only_enhancement="yes", stft_kwargs=_kwargs())
    assert all("mix_single" in f for f in ds.noisy_files)
    dsd = Specs(str(specs_dir), "train", dummy=True, shuffle_spec=False,
                num_frames=256, stft_kwargs=_kwargs())
    assert len(dsd) == int(3 / 150)  # data_module.py:138-142


def test_specs_requires_center():
    from covomix_tpu.data.specs_legacy import Specs

    with pytest.raises(AssertionError):
        Specs("/nonexistent", "train", dummy=False, shuffle_spec=False, num_frames=8,
              stft_kwargs=dict(n_fft=N_FFT, hop_length=HOP, center=False, window="hann"))


def test_remove_unwanted_backchannels():
    from covomix_tpu.data.specs_legacy import remove_unwanted_backchannels as f

    # kept only when directly preceded by [spkchange] (data_module.py:144-157)
    assert f("hi [backchannel] there") == "hi there"
    assert f("[spkchange] [backchannel] ok") == "[spkchange] [backchannel] ok"
    assert f("[backchannel] lead") == "lead"
    assert f("a [spkchange] [partialoverlap] b [partialoverlap]") == \
        "a [spkchange] [partialoverlap] b"
