"""Small utilities (capability parity with covomix/util/other.py,
covomix/util/registry.py, covomix/util/tensors.py)."""

from __future__ import annotations

import os

import numpy as np


def ensure_dir(file_path: str) -> None:
    os.makedirs(file_path, exist_ok=True)


def mean_std(data: np.ndarray):
    data = data[~np.isnan(data)]
    return float(np.mean(data)), float(np.std(data))


def pad_spec(spec: np.ndarray, multiple: int = 64, pad_value: float = 0.0) -> np.ndarray:
    """Pad the time axis (last) of a spectrogram to a multiple (other.py pad_spec)."""
    t = spec.shape[-1]
    rem = (-t) % multiple
    if rem == 0:
        return spec
    pad = [(0, 0)] * (spec.ndim - 1) + [(0, rem)]
    return np.pad(spec, pad, constant_values=pad_value)


class Registry:
    """Name -> class registry (covomix/util/registry.py:5)."""

    def __init__(self, managed_thing: str):
        self.managed_thing = managed_thing
        self._registry = {}

    def register(self, name: str):
        def inner(cls):
            self._registry[name] = cls
            return cls

        return inner

    def get_by_name(self, name: str):
        if name not in self._registry:
            raise ValueError(f"unknown {self.managed_thing}: {name!r}; have {sorted(self._registry)}")
        return self._registry[name]

    def get_all_names(self):
        return sorted(self._registry)


def batch_broadcast(x, array):
    """Broadcast scalar/1-d x against a batched array (covomix/util/tensors.py)."""
    x = np.asarray(x)
    if x.ndim == 0:
        return x
    assert x.ndim == 1 and len(x) == array.shape[0]
    return x.reshape(-1, *([1] * (array.ndim - 1)))


def round_up(n: int, m: int) -> int:
    """Smallest multiple of m >= n (shared bucketing helper)."""
    return ((n + m - 1) // m) * m


# ---------------------------------------------------------------------------
# f0/pitch + length-mask helpers (covomix/covomix_model/utils.py:62-145 —
# dead code in the reference: that module's own `from utils import stft`
# import is broken and nothing on the live path imports it; carried for
# component-inventory parity). numpy implementations of the torch semantics.


def process_f0(f0: np.ndarray, hparams: dict):
    """Standardize f0 by corpus mean/std and interpolate through unvoiced
    (f0==0) gaps; returns (f0_standardized, uv_mask) with uv 1.0 where the
    input frame was unvoiced (utils.py:79-85)."""
    f0 = np.asarray(f0, np.float32)
    f0_ = (f0 - hparams["f0_mean"]) / hparams["f0_std"]
    zeros = np.where(f0 == 0)[0]
    voiced = np.where(f0 > 0)[0]
    if zeros.size and voiced.size:
        f0_[zeros] = np.interp(zeros, voiced, f0_[voiced])
    uv = (f0 == 0).astype(np.float32)
    return f0_.astype(np.float32), uv


def restore_pitch(pitch: np.ndarray, uv, hparams: dict, pitch_padding=None,
                  min=None, max=None):  # noqa: A002 — reference arg names
    """Invert process_f0's standardization; unvoiced frames -> 1, padded
    frames (input == -200 by default) -> 0 (utils.py:87-99)."""
    pitch = np.asarray(pitch, np.float32)
    if pitch_padding is None:
        pitch_padding = pitch == -200
    pitch = pitch * hparams["f0_std"] + hparams["f0_mean"]
    if min is not None:
        pitch = np.maximum(pitch, min)
    if max is not None:
        pitch = np.minimum(pitch, max)
    if uv is not None:
        pitch = np.where(np.asarray(uv) > 0, 1.0, pitch)
    return np.where(pitch_padding, 0.0, pitch).astype(np.float32)


def make_pad_mask(lengths, xs: np.ndarray = None, length_dim: int = -1) -> np.ndarray:
    """True where a position is PADDING (>= its row's length). With `xs`,
    the [B, maxlen] mask is reshaped/broadcast to xs's shape along
    `length_dim` (utils.py:104-131)."""
    if length_dim == 0:
        raise ValueError(f"length_dim cannot be 0: {length_dim}")
    lengths = list(lengths) if not isinstance(lengths, list) else lengths
    bs = len(lengths)
    maxlen = int(max(lengths)) if xs is None else xs.shape[length_dim]
    mask = np.arange(maxlen)[None, :] >= np.asarray(lengths, np.int64)[:, None]
    if xs is not None:
        assert xs.shape[0] == bs, (xs.shape[0], bs)
        if length_dim < 0:
            length_dim = xs.ndim + length_dim
        ind = tuple(slice(None) if i in (0, length_dim) else None for i in range(xs.ndim))
        mask = np.broadcast_to(mask[ind], xs.shape)
    return mask


def make_non_pad_mask(lengths, xs: np.ndarray = None, length_dim: int = -1) -> np.ndarray:
    """Inverse of make_pad_mask: True on VALID positions (utils.py:134-135)."""
    return ~make_pad_mask(lengths, xs, length_dim)


def get_mask_from_lengths(lengths) -> np.ndarray:
    """[B, max(lengths)] bool, True on valid positions (utils.py:138-142)."""
    lengths = np.asarray(lengths, np.int64)
    max_len = int(lengths.max())
    return np.arange(max_len)[None, :] < lengths[:, None]
