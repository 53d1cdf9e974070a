"""Cross-device collectives used by model code.

The reference hand-writes ONE collective: a variable-batch all_gather
autograd.Function whose backward scatters grads by rank
(covomix/covomix_model/t2s_distributed.py:52-102), used by the T2S alignment
regularizer (text2semantic.py:1048-1084). In JAX, `jax.lax.all_gather` is
natively differentiable (its transpose is a psum_scatter slice), so the
equivalent is a one-liner inside shard_map — kept here with the regularizer
itself so the parity point is explicit."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def all_gather_batch(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Gather along the batch axis across `axis_name`. Differentiable: the
    backward pass delivers each rank its own grad shard (what AllGather.backward
    does manually in t2s_distributed.py:92-102)."""
    return jax.lax.all_gather(x, axis_name, axis=0, tiled=True)


def alignment_regularizer(
    source_emb: jnp.ndarray,   # [B, S, D]
    target_emb: jnp.ndarray,   # [B, T, D]
    source_mask: jnp.ndarray | None = None,
    target_mask: jnp.ndarray | None = None,
    *,
    axis_name: str | None = None,
    use_logsumexp_pool: bool = True,
    temp: float = 0.1,
) -> jnp.ndarray:
    """SpeechAlign-style CFG regularizer (text2semantic.py:1048-1084, following
    arXiv 2309.08773): pool source/target over time (logsumexp or max), l2-
    normalize, and match the off-diagonal similarity structures across the
    (globally gathered) batch with MSE."""
    # large-but-safe fill: -finfo.max would overflow to -inf under the /temp
    # in the logsumexp pool, and an all-masked row (empty/fully-padded text)
    # would then produce -inf -> nan through l2norm, poisoning the whole
    # loss's gradients. -1e30/temp stays finite; an all-masked row pools to a
    # constant vector and contributes a fixed direction instead of nan.
    neg = jnp.asarray(-1e30, source_emb.dtype)
    if source_mask is not None:
        source_emb = jnp.where(source_mask[..., None], source_emb, neg)
    if target_mask is not None:
        target_emb = jnp.where(target_mask[..., None], target_emb, neg)

    if axis_name is not None:
        source_emb = all_gather_batch(source_emb, axis_name)
        target_emb = all_gather_batch(target_emb, axis_name)

    if use_logsumexp_pool:
        source_pool = jax.nn.logsumexp(source_emb / temp, axis=1) * temp
        target_pool = jax.nn.logsumexp(target_emb / temp, axis=1) * temp
    else:
        source_pool = jnp.max(source_emb, axis=1)
        target_pool = jnp.max(target_emb, axis=1)

    def l2norm(t):
        return t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)

    s, t = l2norm(source_pool), l2norm(target_pool)
    sim_s = s @ s.T
    sim_t = t @ t.T
    b = sim_s.shape[0]
    off_diag = ~jnp.eye(b, dtype=bool)
    diff = jnp.where(off_diag, sim_s - sim_t, 0.0)
    return jnp.sum(jnp.square(diff)) / jnp.maximum(jnp.sum(off_diag), 1)
