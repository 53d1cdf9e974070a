"""XLA log-mel frontend, bit-matching the reference HiFi-GAN mel pipeline.

Reference contract (covomix/util/generate_mel.py:49-72, hifi-gan/meldataset.py:49-72):
  1. reflect-pad the waveform by (n_fft - hop) / 2 on each side
  2. torch.stft(n_fft, hop, win, hann window, center=False, onesided)
  3. magnitude = sqrt(re^2 + im^2 + 1e-9)
  4. mel = librosa Slaney filterbank (norm='slaney', htk=False) @ magnitude
  5. log(clamp(mel, min=1e-5))

CoVoMix config (monologue_generation.py:349-357, hifi-gan/config_covomix.json):
  sr 8000, n_fft 480, hop 160 (20 ms), win 480, fmin 0, fmax 4000, 80 mels.

The filterbank is precomputed in numpy (librosa is not a dependency — the Slaney
formula is implemented from its published definition) and the framing/rFFT runs in
jnp so it fuses under jit on TPU.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

log_mel_floor = float(np.log(1e-5))  # ~= -11.5129; reference mel floor


@dataclasses.dataclass(frozen=True)
class MelConfig:
    sample_rate: int = 8000
    n_fft: int = 480
    num_mels: int = 80
    hop_size: int = 160
    win_size: int = 480
    fmin: float = 0.0
    fmax: float = 4000.0

    @property
    def pad(self) -> int:
        return (self.n_fft - self.hop_size) // 2


def _hz_to_mel_slaney(f: np.ndarray) -> np.ndarray:
    """Slaney mel scale (librosa htk=False default)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = f >= min_log_hz
    mels = np.where(log_region, min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz) / logstep, mels)
    return mels


def _mel_to_hz_slaney(m: np.ndarray) -> np.ndarray:
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freqs = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    log_region = m >= min_log_mel
    freqs = np.where(log_region, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)
    return freqs


def mel_filterbank(sample_rate: int, n_fft: int, num_mels: int, fmin: float, fmax: float) -> np.ndarray:
    """Slaney-normalized triangular mel filterbank, numerically identical to
    librosa.filters.mel(sr, n_fft, n_mels, fmin, fmax) with defaults (htk=False,
    norm='slaney'), which is what generate_mel.py:57 uses. Returns [num_mels, 1+n_fft//2] f32."""
    fftfreqs = np.linspace(0.0, sample_rate / 2.0, 1 + n_fft // 2, dtype=np.float64)
    mel_min = _hz_to_mel_slaney(np.array(fmin))
    mel_max = _hz_to_mel_slaney(np.array(fmax))
    mel_pts = np.linspace(mel_min, mel_max, num_mels + 2)
    hz_pts = _mel_to_hz_slaney(mel_pts)

    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fftfreqs[None, :]

    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))

    # Slaney-style area normalization
    enorm = 2.0 / (hz_pts[2 : num_mels + 2] - hz_pts[:num_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _mel_basis_and_window(cfg: MelConfig):
    # numpy (not jnp) so the cache is safe to hit from inside jit traces
    basis = mel_filterbank(cfg.sample_rate, cfg.n_fft, cfg.num_mels, cfg.fmin, cfg.fmax)
    # periodic Hann, matching torch.hann_window(win_size) (generate_mel.py:59)
    n = np.arange(cfg.win_size, dtype=np.float64)
    window = (0.5 - 0.5 * np.cos(2.0 * np.pi * n / cfg.win_size)).astype(np.float32)
    return basis, window


@functools.lru_cache(maxsize=8)
def _dft_kernels(cfg: MelConfig):
    """Windowed DFT basis as conv kernels [n_fft, 1, F] (cos) and (−sin).

    The STFT runs as ONE strided convolution against this basis — a dense
    matmul that XLA tiles straight onto the TPU MXU, instead of a
    gather-into-frames + FFT (which is both gather-unfriendly on TPU and
    pathologically slow on XLA:CPU)."""
    _, window = _mel_basis_and_window(cfg)
    n_fft = cfg.n_fft
    win = np.zeros(n_fft, np.float64)
    lp = (n_fft - cfg.win_size) // 2
    win[lp : lp + cfg.win_size] = window
    k = np.arange(n_fft)[:, None]
    f = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    cos_k = (np.cos(ang) * win[:, None]).astype(np.float32)[:, None, :]  # [K, 1, F]
    sin_k = (-np.sin(ang) * win[:, None]).astype(np.float32)[:, None, :]
    return cos_k, sin_k


def stft_magnitude(y: jnp.ndarray, cfg: MelConfig) -> jnp.ndarray:
    """Magnitude STFT of [B, T] -> [B, F, frames], matching the reference:
    reflect pad (n_fft-hop)/2, center=False, sqrt(power + 1e-9)."""
    pad = cfg.pad
    y = jnp.pad(y, [(0, 0)] * (y.ndim - 1) + [(pad, pad)], mode="reflect")
    cos_k, sin_k = _dft_kernels(cfg)
    x = y[..., None]  # [B, T, 1]
    dn = ("NWC", "WIO", "NWC")
    # precision pinned to HIGHEST: the mel-parity budget (0.1 dB MCD) does not
    # survive bf16 MXU passes, and this conv is a negligible share of pipeline cost
    hi = jax.lax.Precision.HIGHEST
    re = jax.lax.conv_general_dilated(x, jnp.asarray(cos_k), (cfg.hop_size,), [(0, 0)], dimension_numbers=dn, precision=hi)
    im = jax.lax.conv_general_dilated(x, jnp.asarray(sin_k), (cfg.hop_size,), [(0, 0)], dimension_numbers=dn, precision=hi)
    mag = jnp.sqrt(jnp.square(re) + jnp.square(im) + 1e-9)  # [B, frames, F]
    return jnp.swapaxes(mag, -1, -2)  # [B, F, frames]


@functools.partial(jax.jit, static_argnames=("cfg",))
def mel_spectrogram(y: jnp.ndarray, cfg: MelConfig = MelConfig()) -> jnp.ndarray:
    """Log-mel of waveform [B, T] (float in [-1, 1]) -> [B, num_mels, frames].

    Matches covomix/util/generate_mel.py:49-72 to ~1e-4 (verified against the
    golden fixtures in hifi-gan/hifigan_test/input_mel)."""
    basis, _ = _mel_basis_and_window(cfg)
    mag = stft_magnitude(y.astype(jnp.float32), cfg)
    # HIGHEST like the STFT convs above: the default bf16-class matmul would
    # round this [80, F] x [F, T] projection (~0.4% rel) and blow the ~1e-4
    # golden-parity budget on real TPU (CPU tests mask it — they run wrapped
    # in default_matmul_precision('highest'))
    mel = jnp.einsum("mf,bft->bmt", basis, mag, precision=jax.lax.Precision.HIGHEST)
    return jnp.log(jnp.clip(mel, min=1e-5))


def mel_frames_for_samples(num_samples: int, cfg: MelConfig = MelConfig()) -> int:
    """Number of mel frames produced for a waveform of num_samples samples."""
    padded = num_samples + 2 * cfg.pad
    return 1 + (padded - cfg.n_fft) // cfg.hop_size
