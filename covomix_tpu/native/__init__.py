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
        if not hasattr(lib, "block_to_dataset_index"):
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
        lib.bleu_add_i64.restype = None
        lib.bleu_add_i64.argtypes = [i64p, i64p, ctypes.c_int64, i64p, ctypes.c_int64,
                                     ctypes.c_int64, ctypes.c_int64]
        lib.token_block_slices.restype = ctypes.c_int64
        lib.token_block_slices.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64,
                                           ctypes.c_int64, ctypes.c_int64, i64p]
        lib.block_to_dataset_index.restype = None
        lib.block_to_dataset_index.argtypes = [i64p, ctypes.c_int64, i64p, ctypes.c_int64, i64p]
        _lib = lib
    except (OSError, AttributeError):
        # OSError: unloadable .so. AttributeError: a stale .so missing a newer
        # symbol AND the rebuild failed (no compiler) — fall back to numpy
        # rather than hard-failing every wrapper (the module contract)
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
    if len(lengths) == 0:
        # guard BEFORE the native call: the C++ writes out_boundaries[1]
        # unconditionally, past the 1-element buffer allocated for n==0
        return []
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


class BleuScorer:
    """Corpus BLEU accumulator (capability of fairseq/clib/libbleu/libbleu.cpp
    + fairseq/scoring/bleu.py Scorer): pad/eos trimming, unk tokens in the
    reference never match (replaced by a negative sentinel), clipped 1..4-gram
    matches accumulated across add() calls, BLEU-4 with brevity penalty.

    Deliberate deviation from libbleu: ngrams are matched by exact token-tuple
    keys (the reference FNV-hashes ngram bytes, which can false-match on
    collisions), and a sentence consisting only of pad/eos counts zero tokens
    (the reference keeps one trailing eos). C++ fast path with a pure-python
    fallback; both share these semantics (tests/test_native_ops.py)."""

    def __init__(self, pad: int = 1, eos: int = 2, unk: int = 3):
        self.pad, self.eos, self.unk = int(pad), int(eos), int(unk)
        self.reset()

    def reset(self, one_init: bool = False):
        # stat = [reflen, predlen, count1, match1, ..., count4, match4]
        self.stat = np.zeros(10, np.int64)
        if one_init:  # +1 smoothing on orders 2..4 (bleu_one_init)
            self.stat[4:10] = 1

    @staticmethod
    def _trim(seq: np.ndarray, pad: int, eos: int) -> np.ndarray:
        i = 0
        while i < len(seq) and seq[i] == pad:
            i += 1
        j = len(seq)
        while j > i and (seq[j - 1] == pad or seq[j - 1] == eos):
            j -= 1
        return seq[i:j]

    def add(self, ref, pred):
        ref = _as_i64(ref).ravel().copy()
        pred = _as_i64(pred).ravel()
        ref[ref == self.unk] = -999  # unknown ref words never match (bleu.py:114-117)
        lib = _load()
        if lib:
            r, p = np.ascontiguousarray(ref), np.ascontiguousarray(pred)
            lib.bleu_add_i64(_ptr(self.stat), _ptr(r), len(r), _ptr(p), len(p),
                             self.pad, self.eos)
            return
        r = self._trim(ref, self.pad, self.eos)
        p = self._trim(pred, self.pad, self.eos)
        self.stat[0] += len(r)
        self.stat[1] += len(p)
        for n in range(1, 5):
            if len(p) < n:
                continue
            pg = [tuple(p[i:i + n]) for i in range(len(p) - n + 1)]
            self.stat[2 * n] += len(pg)
            if len(r) < n:
                continue
            from collections import Counter

            count = Counter(pg)
            for i in range(len(r) - n + 1):
                g = tuple(r[i:i + n])
                if count.get(g, 0) > 0:
                    self.stat[2 * n + 1] += 1
                    count[g] -= 1

    def precision(self):
        return [self.stat[2 * n + 1] / self.stat[2 * n] if self.stat[2 * n] > 0 else 0.0
                for n in range(1, 5)]

    def brevity(self):
        import math

        reflen, predlen = int(self.stat[0]), int(self.stat[1])
        if predlen == 0:
            return 0.0
        return min(1.0, math.exp(1 - reflen / predlen))

    def score(self, order: int = 4) -> float:
        import math

        psum = sum(math.log(p) if p > 0 else float("-inf")
                   for p in self.precision()[:order])
        return self.brevity() * math.exp(psum / order) * 100.0

    def result_string(self, order: int = 4) -> str:
        ps = ", ".join(f"{p * 100:.1f}" for p in self.precision()[:order])
        return (f"BLEU{order} = {self.score(order):.2f}, {ps} "
                f"(BP={self.brevity():.3f}, ratio={int(self.stat[1]) / max(int(self.stat[0]), 1):.3f}, "
                f"syslen={int(self.stat[1])}, reflen={int(self.stat[0])})")


def token_block_slices(sizes, block_size: int, break_mode: str = "none",
                       document_sep_len: int = 1) -> np.ndarray:
    """[start, end) slices over the flattened token stream for each block
    (capability of fairseq/data/token_block_utils_fast.pyx
    _get_slice_indices_fast). break_mode: 'none' (fixed block_size chunks),
    'complete' (whole sentences packed up to block_size), 'complete_doc'
    (documents delimited by document_sep_len-sized rows; keeps blocks >1),
    'eos' (one slice per sentence). Returns int64 [num_blocks, 2]."""
    sizes = _as_i64(sizes)
    modes = {None: 0, "none": 0, "complete": 1, "complete_doc": 2, "eos": 3}
    if break_mode not in modes:
        raise ValueError(f"Invalid break_mode: {break_mode}")
    mode = modes[break_mode]
    lib = _load()
    if lib:
        total = int(sizes.sum())
        cap = len(sizes) + (total // max(int(block_size), 1)) + 2
        out = np.zeros(2 * cap, np.int64)
        m = int(lib.token_block_slices(_ptr(sizes), len(sizes), int(block_size),
                                       mode, int(document_sep_len), _ptr(out)))
        return out[: 2 * m].reshape(m, 2)
    # pure-numpy fallback (same semantics)
    if mode == 0:
        total = int(sizes.sum())
        starts = np.arange(0, total, int(block_size), dtype=np.int64)
        return np.stack([starts, np.minimum(starts + int(block_size), total)], axis=1) \
            if total else np.zeros((0, 2), np.int64)
    if mode == 3:
        cum = np.concatenate([[0], np.cumsum(sizes)])
        return np.stack([cum[:-1], cum[1:]], axis=1)
    out, tok, cur, i = [], 0, 0, 0
    min_keep = 2 if mode == 2 else 1
    while i < len(sizes):
        doc_sep = mode == 2 and sizes[i] == document_sep_len
        if (cur + sizes[i] <= block_size or cur == 0) and not doc_sep:
            cur += int(sizes[i])
            i += 1
        else:
            if cur >= min_keep:
                out.append((tok, tok + cur))
            tok += cur
            cur = 0
            if doc_sep:
                tok += int(sizes[i])
                i += 1
    if cur >= min_keep:
        out.append((tok, tok + cur))
    return np.asarray(out, np.int64).reshape(-1, 2)


def block_to_dataset_index(sizes, slice_indices) -> np.ndarray:
    """Per block: (start_ds_idx, start_offset, end_ds_idx) into the
    per-sequence dataset (token_block_utils_fast.pyx DatasetSearcher)."""
    sizes = _as_i64(sizes)
    sl = _as_i64(slice_indices).reshape(-1, 2)
    lib = _load()
    if lib:
        out = np.zeros(3 * len(sl), np.int64)
        flat = np.ascontiguousarray(sl.ravel())
        lib.block_to_dataset_index(_ptr(sizes), len(sizes), _ptr(flat), len(sl), _ptr(out))
        return out.reshape(-1, 3)
    cum = np.concatenate([[0], np.cumsum(sizes)])

    # flat -> dataset index, DatasetSearcher semantics: a flat index on a
    # sequence boundary stays on the first sequence starting there (including
    # zero-length ones)
    def find(flat):
        i = int(np.searchsorted(cum, flat, side="left"))
        return i if i < len(cum) - 1 and cum[i] == flat else i - 1

    out = []
    for s, e in sl:
        sd = find(s)
        out.append((sd, int(s) - int(cum[sd]), sd if e <= s else find(e - 1)))
    return np.asarray(out, np.int64).reshape(-1, 3)


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
