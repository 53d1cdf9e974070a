"""ctypes bindings for the C++ runtime helpers (libcovomix_native.so).

Builds the shared library on first import if the toolchain is available;
falls back to numpy implementations otherwise, so the framework never hard-
fails on a missing compiler."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Sequence

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcovomix_native.so")
_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120)
        return os.path.isfile(_SO)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.isfile(_SO) and not _build():
        _lib = False
        return _lib
    try:
        lib = ctypes.CDLL(_SO)
        if not hasattr(lib, "balanced_assignment_f32"):
            # stale build from an older source revision: rebuild and reload
            _build()
            lib = ctypes.CDLL(_SO)
        i64p = ctypes.POINTER(ctypes.c_int64)
        f32p = ctypes.POINTER(ctypes.c_float)
        lib.levenshtein_i64.restype = ctypes.c_int64
        lib.levenshtein_i64.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64]
        lib.levenshtein_batch_i64.restype = None
        lib.levenshtein_batch_i64.argtypes = [i64p, i64p, i64p, i64p, ctypes.c_int64, i64p]
        lib.batch_by_size.restype = ctypes.c_int64
        lib.batch_by_size.argtypes = [i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i64p]
        lib.balanced_assignment_f32.restype = None
        lib.balanced_assignment_f32.argtypes = [f32p, ctypes.c_int64, ctypes.c_int64, i64p]
        _lib = lib
    except OSError:
        _lib = False
    return _lib


def _as_i64(x) -> np.ndarray:
    return np.ascontiguousarray(np.asarray(x, dtype=np.int64))


def _ptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def native_available() -> bool:
    return bool(_load())


def levenshtein(a: Sequence[int], b: Sequence[int]) -> int:
    """Edit distance between two token-id sequences."""
    aa, bb = _as_i64(a), _as_i64(b)
    lib = _load()
    if lib:
        return int(lib.levenshtein_i64(_ptr(aa), len(aa), _ptr(bb), len(bb)))
    # numpy fallback (row-DP)
    if len(aa) == 0:
        return len(bb)
    prev = np.arange(len(bb) + 1, dtype=np.int64)
    for i in range(1, len(aa) + 1):
        cur = np.empty_like(prev)
        cur[0] = i
        sub = prev[:-1] + (aa[i - 1] != bb)
        for j in range(1, len(bb) + 1):
            cur[j] = min(prev[j] + 1, cur[j - 1] + 1, sub[j - 1])
        prev = cur
    return int(prev[-1])


def levenshtein_batch(refs: Sequence[Sequence[int]], hyps: Sequence[Sequence[int]]) -> np.ndarray:
    assert len(refs) == len(hyps)
    lib = _load()
    if not lib:
        return np.asarray([levenshtein(r, h) for r, h in zip(refs, hyps)], np.int64)
    flat_a = _as_i64(np.concatenate([_as_i64(r) for r in refs]) if refs else [])
    flat_b = _as_i64(np.concatenate([_as_i64(h) for h in hyps]) if hyps else [])
    off_a = _as_i64(np.cumsum([0] + [len(r) for r in refs]))
    off_b = _as_i64(np.cumsum([0] + [len(h) for h in hyps]))
    out = np.zeros(len(refs), np.int64)
    lib.levenshtein_batch_i64(_ptr(flat_a), _ptr(off_a), _ptr(flat_b), _ptr(off_b), len(refs), _ptr(out))
    return out


def batch_by_size(lengths: Sequence[int], max_tokens: int = 0, max_sentences: int = 0) -> list:
    """Length-sorted bucketing into batches (fairseq data_utils_fast semantics).
    Returns a list of index arrays."""
    lengths = _as_i64(lengths)
    order = _as_i64(np.argsort(lengths, kind="stable"))
    lib = _load()
    if lib:
        bounds = np.zeros(len(lengths) + 1, np.int64)
        n = int(lib.batch_by_size(_ptr(lengths), _ptr(order), len(lengths),
                                  int(max_tokens), int(max_sentences), _ptr(bounds)))
        return [order[bounds[i]:bounds[i + 1]] for i in range(n)]
    # python fallback
    batches, cur, max_len = [], [], 0
    for idx in order:
        new_max = max(max_len, int(lengths[idx]))
        bsz = len(cur) + 1
        if cur and ((max_sentences and bsz > max_sentences) or (max_tokens and new_max * bsz > max_tokens)):
            batches.append(np.asarray(cur))
            cur, max_len = [int(idx)], int(lengths[idx])
        else:
            cur.append(int(idx))
            max_len = new_max
    if cur:
        batches.append(np.asarray(cur))
    return batches


def balanced_assignment(scores) -> np.ndarray:
    """Balanced token->expert assignment (fairseq BASE-layer EP routing
    capability, fairseq/clib/libbase/balanced_assignment.cpp semantics):
    scores [T, E] with E | T; every expert receives exactly T/E tokens,
    approximately maximizing total affinity (Bertsekas auction, eps-optimal).

    Returns expert_of_token [T] int64. Sort tokens by it (stable) for the
    BASE-layer's contiguous per-expert chunks."""
    s = np.ascontiguousarray(np.asarray(scores, np.float32))
    assert s.ndim == 2, s.shape
    t, e = s.shape
    assert e > 0 and t % e == 0, f"experts {e} must divide tokens {t}"
    lib = _load()
    if lib:
        out = np.zeros(t, np.int64)
        lib.balanced_assignment_f32(s.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                                    t, e, _ptr(out))
        return out
    # numpy fallback: same Gauss-Seidel auction
    k = t // e
    eps = max((float(s.max()) - float(s.min())) / 50.0, 1e-4)
    cost = np.zeros(t, np.float64)
    owner = np.full(t, -1, np.int64)
    need = np.full(e, k, np.int64)
    queue = list(range(e))
    rounds = 0
    while queue and rounds < 2000 * e:
        rounds += 1
        ex = queue.pop(0)
        m = int(need[ex])
        if m <= 0:
            continue
        value = s[:, ex] - cost
        cand = np.flatnonzero(owner != ex)
        order = cand[np.argsort(-value[cand], kind="stable")]
        take = min(m, len(order))
        runner_up = value[order[take]] if len(order) > take else float(value.min()) - 1.0
        for tk in order[:take]:
            prev = int(owner[tk])
            owner[tk] = ex
            need[ex] -= 1
            cost[tk] += value[tk] - runner_up + eps
            if prev >= 0:
                need[prev] += 1
                queue.append(prev)
        if need[ex] > 0:
            queue.append(ex)
    for ex in range(e):         # fill-in fallback
        while need[ex] > 0:
            free = np.flatnonzero(owner < 0)
            if not len(free):
                break
            owner[free[np.argmax(s[free, ex])]] = ex
            need[ex] -= 1
    return owner
