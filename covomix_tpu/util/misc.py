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
