"""Complex STFT / iSTFT and spectral transforms (legacy enhancement path).

TPU-native equivalent of the reference's torch.stft/istft helpers
(covomix/data_module.py:805-811) and the `spec_fwd`/`spec_back` compressed-
spectrum transforms (data_module.py:754-781) used by the legacy `Specs`
speech-enhancement dataset (data_module.py:71-142). Nothing on the CoVoMix
synthesis path uses these; they exist for capability parity.

Both directions run as dense matmuls/convolutions against a precomputed DFT
basis — one strided conv for analysis and one transposed conv for the
overlap-add — so XLA tiles them onto the MXU instead of a gather-into-frames
+ FFT (gathers with large index arrays stall pathologically on this stack;
see audio/mel.py for the same design on the magnitude path).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HI = jax.lax.Precision.HIGHEST


def get_window(window_type: str, window_length: int) -> np.ndarray:
    """'hann' (periodic) or 'sqrthann' (data_module.py:60-67)."""
    n = np.arange(window_length, dtype=np.float64)
    hann = 0.5 - 0.5 * np.cos(2.0 * np.pi * n / window_length)
    if window_type == "hann":
        return hann.astype(np.float32)
    if window_type == "sqrthann":
        return np.sqrt(hann).astype(np.float32)
    raise NotImplementedError(f"Window type {window_type} not implemented!")


@functools.lru_cache(maxsize=8)
def _analysis_kernels(n_fft: int, window_type: str):
    """Windowed DFT basis as conv kernels [n_fft, 1, F] for re and -im."""
    win = get_window(window_type, n_fft).astype(np.float64)
    k = np.arange(n_fft)[:, None]
    f = np.arange(1 + n_fft // 2)[None, :]
    ang = 2.0 * np.pi * k * f / n_fft
    cos_k = (np.cos(ang) * win[:, None]).astype(np.float32)[:, None, :]
    sin_k = (-np.sin(ang) * win[:, None]).astype(np.float32)[:, None, :]
    return cos_k, sin_k


@functools.lru_cache(maxsize=8)
def _synthesis_matrices(n_fft: int, window_type: str):
    """Inverse-rDFT bases [F, n_fft] mapping (re, im) -> windowed time frame.

    x[n] = (1/n_fft) * sum_f w_f * (re_f cos(2πfn/N) - im_f sin(2πfn/N)),
    w_f = 1 for DC/Nyquist, 2 otherwise (onesided hermitian fold), then * win
    — exactly torch.istft's per-frame inverse before overlap-add."""
    F = 1 + n_fft // 2
    win = get_window(window_type, n_fft).astype(np.float64)
    f = np.arange(F)[:, None]
    nn = np.arange(n_fft)[None, :]
    ang = 2.0 * np.pi * f * nn / n_fft
    fold = np.full((F, 1), 2.0)
    fold[0] = 1.0
    if n_fft % 2 == 0:
        fold[-1] = 1.0
    c = (fold * np.cos(ang) / n_fft) * win[None, :]
    s = (-fold * np.sin(ang) / n_fft) * win[None, :]
    return c.astype(np.float32), s.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _scatter_kernel(n_fft: int):
    """[K=n_fft, I=n_fft, O=1] identity placement kernel: conv_transpose with
    stride=hop turns per-frame samples (as channels) into overlap-add.
    lax.conv_transpose applies the kernel spatially REVERSED (gradient-of-conv
    semantics), so channel i maps to flipped tap n_fft-1-i to land sample i of
    each frame at frame_start + i."""
    k = np.zeros((n_fft, n_fft, 1), np.float32)
    k[n_fft - 1 - np.arange(n_fft), np.arange(n_fft), 0] = 1.0
    return k


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window_type", "center"))
def stft_complex(y: jnp.ndarray, n_fft: int, hop_length: int,
                 window_type: str = "hann", center: bool = True) -> jnp.ndarray:
    """torch.stft-matching complex STFT. [B, T] (or [T]) -> [B, F, frames]
    complex64 (onesided, win_length == n_fft, normalized=False).

    center=True reflect-pads n_fft//2 each side so frames = 1 + T//hop
    (the legacy Specs dataset asserts center=True, data_module.py:97)."""
    squeeze = y.ndim == 1
    if squeeze:
        y = y[None]
    y = y.astype(jnp.float32)
    if center:
        p = n_fft // 2
        y = jnp.pad(y, [(0, 0), (p, p)], mode="reflect")
    cos_k, sin_k = _analysis_kernels(n_fft, window_type)
    x = y[..., None]
    dn = ("NWC", "WIO", "NWC")
    re = jax.lax.conv_general_dilated(x, jnp.asarray(cos_k), (hop_length,), [(0, 0)],
                                      dimension_numbers=dn, precision=_HI)
    im = jax.lax.conv_general_dilated(x, jnp.asarray(sin_k), (hop_length,), [(0, 0)],
                                      dimension_numbers=dn, precision=_HI)
    spec = jax.lax.complex(re, im)          # [B, frames, F]
    spec = jnp.swapaxes(spec, -1, -2)       # [B, F, frames]
    return spec[0] if squeeze else spec


@functools.partial(jax.jit, static_argnames=("n_fft", "hop_length", "window_type",
                                             "center", "length"))
def istft(spec: jnp.ndarray, n_fft: int, hop_length: int,
          window_type: str = "hann", center: bool = True,
          length: int | None = None) -> jnp.ndarray:
    """torch.istft-matching inverse. [B, F, frames] (or [F, frames]) complex
    -> [B, T] f32: per-frame inverse rDFT, window, overlap-add, then divide by
    the overlapped window-square envelope (data_module.py:809-811 semantics)."""
    squeeze = spec.ndim == 2
    if squeeze:
        spec = spec[None]
    b, F, frames = spec.shape
    c, s = _synthesis_matrices(n_fft, window_type)
    re = jnp.real(spec).astype(jnp.float32)
    im = jnp.imag(spec).astype(jnp.float32)
    # [B, frames, n_fft] windowed time frames
    fr = jnp.einsum("bft,fn->btn", re, jnp.asarray(c), precision=_HI) + \
         jnp.einsum("bft,fn->btn", im, jnp.asarray(s), precision=_HI)
    kern = jnp.asarray(_scatter_kernel(n_fft))
    ola = jax.lax.conv_transpose(fr, kern, (hop_length,), "VALID",
                                 dimension_numbers=("NWC", "WIO", "NWC"),
                                 precision=_HI)[..., 0]     # [B, T_pad]
    win = jnp.asarray(get_window(window_type, n_fft))
    wsq = jnp.broadcast_to(win * win, (1, frames, n_fft))
    env = jax.lax.conv_transpose(wsq, kern, (hop_length,), "VALID",
                                 dimension_numbers=("NWC", "WIO", "NWC"),
                                 precision=_HI)[0, :, 0]    # [T_pad]
    out = ola / jnp.maximum(env, 1e-11)[None]
    if center:
        p = n_fft // 2
        out = out[:, p : out.shape[1] - p]
    if length is not None:
        t = out.shape[1]
        out = out[:, :length] if t >= length else jnp.pad(out, [(0, 0), (0, length - t)])
    return out[0] if squeeze else out


def spec_fwd(spec: jnp.ndarray, transform_type: str = "exponent",
             spec_factor: float = 0.15, spec_abs_exponent: float = 0.5) -> jnp.ndarray:
    """Forward magnitude compression (data_module.py:754-768): 'exponent'
    -> |S|^e * exp(i*angle) * factor; 'log' -> log1p(|S|) phase-preserving
    * factor; 'none' -> identity."""
    if transform_type == "exponent":
        if spec_abs_exponent != 1:
            mag = jnp.abs(spec)
            spec = jnp.where(mag > 0, spec * mag ** (spec_abs_exponent - 1), spec)
        return spec * spec_factor
    if transform_type == "log":
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, jnp.log1p(mag) / jnp.maximum(mag, 1e-30), 1.0)
        return spec * scale * spec_factor
    if transform_type == "none":
        return spec
    raise ValueError(f"unknown transform_type {transform_type!r}")


def spec_back(spec: jnp.ndarray, transform_type: str = "exponent",
              spec_factor: float = 0.15, spec_abs_exponent: float = 0.5) -> jnp.ndarray:
    """Inverse of spec_fwd (data_module.py:769-781)."""
    if transform_type == "exponent":
        spec = spec / spec_factor
        if spec_abs_exponent != 1:
            mag = jnp.abs(spec)
            spec = jnp.where(mag > 0, spec * mag ** (1.0 / spec_abs_exponent - 1), spec)
        return spec
    if transform_type == "log":
        spec = spec / spec_factor
        mag = jnp.abs(spec)
        scale = jnp.where(mag > 0, jnp.expm1(mag) / jnp.maximum(mag, 1e-30), 1.0)
        return spec * scale
    if transform_type == "none":
        return spec
    raise ValueError(f"unknown transform_type {transform_type!r}")
