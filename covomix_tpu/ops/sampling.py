"""Token sampling ops (jnp, jit-safe), matching text2semantic.py:105-132.

All functions are shape-static and usable inside lax loops on TPU."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def safe_log(t: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    return jnp.log(jnp.clip(t, min=eps))


def gumbel_noise(key, shape) -> jnp.ndarray:
    # matches gumbel_noise (text2semantic.py:108-110): -log(-log(U))
    u = jax.random.uniform(key, shape)
    return -safe_log(-safe_log(u))


def gumbel_sample(key, logits: jnp.ndarray, temperature: float | jnp.ndarray = 1.0, axis: int = -1) -> jnp.ndarray:
    """argmax(logits/max(T,1e-10) + gumbel) — text2semantic.py:112-113."""
    t = jnp.maximum(jnp.asarray(temperature, logits.dtype), 1e-10)
    return jnp.argmax(logits / t + gumbel_noise(key, logits.shape), axis=axis)


def top_k_filter(logits: jnp.ndarray, thres: float = 0.1, k: int | None = None) -> jnp.ndarray:
    """Keep top-k logits, set the rest to -inf (text2semantic.py:126-132).

    Default k = ceil(thres * vocab) like the reference's top_k(thres=0.1)."""
    vocab = logits.shape[-1]
    if k is None:
        k = math.ceil(thres * vocab)
    k = max(1, min(k, vocab))
    kth = jax.lax.top_k(logits, k)[0][..., -1:]
    return jnp.where(logits < kth, NEG_INF, logits)


def top_p_filter(logits: jnp.ndarray, thres: float = 0.9) -> jnp.ndarray:
    """Nucleus filtering (text2semantic.py:118-124): remove tokens once the sorted
    cumulative probability exceeds `thres` (keeping the first that crosses)."""
    sorted_logits = jnp.sort(logits, axis=-1)[..., ::-1]
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    # F.pad(cum > thres, (1, -1)): shift right by one, first position False
    remove = jnp.concatenate([jnp.zeros_like(cum[..., :1], bool), (cum > thres)[..., :-1]], axis=-1)
    # threshold value: the smallest kept logit
    kept = jnp.where(remove, jnp.inf, sorted_logits)
    cutoff = jnp.min(kept, axis=-1, keepdims=True)
    return jnp.where(logits < cutoff, NEG_INF, logits)


def mask_after_eos(tokens: jnp.ndarray, eos_id: int, pad_id: int) -> jnp.ndarray:
    """Replace everything strictly after the first EOS with pad_id, keeping the
    EOS itself (text2semantic.py:73-76)."""
    after = jnp.cumsum((tokens == eos_id).astype(jnp.int32), axis=-1) > 0
    # keep the eos position itself: shift right by one
    after = jnp.concatenate([jnp.zeros_like(after[..., :1]), after[..., :-1]], axis=-1)
    return jnp.where(after, pad_id, tokens)


def ban_repeated_ngrams(logits: jnp.ndarray, tokens: jnp.ndarray, cur_len: jnp.ndarray,
                        n: int) -> jnp.ndarray:
    """No-repeat-ngram masking inside a jitted AR decode loop.

    TPU-native equivalent of fairseq's ngram_repeat_block CUDA kernel
    (fairseq/clib/cuda/ngram_repeat_block_cuda_kernel.cu: for each window of
    the last n-1 generated tokens matching an earlier window, ban the token
    that followed it). Pure jnp, shape-static: `tokens` [B, L] is the decode
    buffer, `cur_len` a traced scalar (# tokens generated so far), `n` static.

    Returns logits [B, V] with banned token ids set to NEG_INF. No-op while
    cur_len < n."""
    if n <= 0:
        return logits
    b, l = tokens.shape
    # prefix = last n-1 generated tokens: tokens[cur_len-(n-1) : cur_len]
    start = jnp.maximum(cur_len - (n - 1), 0)
    pref_idx = (start + jnp.arange(n - 1)) % l
    prefix = tokens[:, pref_idx] if n > 1 else jnp.zeros((b, 0), tokens.dtype)
    # window at j matches iff tokens[j+i] == prefix[i] for all i < n-1,
    # and the banned continuation tokens[j+n-1] lies inside the generated region
    eq = jnp.ones((b, l), bool)
    for i in range(n - 1):
        eq &= jnp.roll(tokens, -i, axis=1) == prefix[:, i][:, None]
    pos = jnp.arange(l)[None, :]
    valid = (pos + n - 1 < cur_len) & (cur_len >= n)
    match = eq & valid
    banned = jnp.roll(tokens, -(n - 1), axis=1)                  # tokens[j+n-1] at col j
    banned = jnp.where(match, banned, -1)                        # -1 -> dropped by scatter
    counts = jnp.zeros(logits.shape, jnp.int32).at[
        jnp.arange(b)[:, None], banned].add(match.astype(jnp.int32), mode="drop")
    return jnp.where(counts > 0, NEG_INF, logits)


def set_eos_id(tokens: jnp.ndarray, eos_id: int, pad_id: int) -> jnp.ndarray:
    """Append one position and write eos at the first pad slot per row
    (text2semantic.py:59-67). Static +1 length."""
    lengths = jnp.sum(jnp.cumsum((tokens == pad_id).astype(jnp.int32), axis=-1) == 0, axis=-1)
    out = jnp.pad(tokens, [(0, 0)] * (tokens.ndim - 1) + [(0, 1)], constant_values=pad_id)
    pos = jnp.arange(out.shape[-1])
    return jnp.where(pos[None, :] == lengths[:, None], eos_id, out)
