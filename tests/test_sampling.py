"""Sampling op parity vs the reference torch formulas (text2semantic.py:59-132)."""

import numpy as np
import jax
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from covomix_tpu.ops import sampling as S


def _torch_top_k(logits, thres=0.1):
    import math

    k = math.ceil(thres * logits.shape[-1])
    val, ind = torch.topk(logits, k, dim=-1)
    probs = torch.full_like(logits, float("-inf"))
    probs.scatter_(-1, ind, val)
    return probs


def _torch_top_p(logits, thres=0.9):
    sorted_logits, sorted_indices = torch.sort(logits, descending=True)
    cum_probs = torch.cumsum(F.softmax(sorted_logits, dim=-1), dim=-1)
    sorted_indices_to_remove = F.pad(cum_probs > thres, (1, -1), value=0)
    sorted_logits[sorted_indices_to_remove] = float("-inf")
    sorted_logits = sorted_logits.scatter(-1, sorted_indices, sorted_logits)
    return sorted_logits


def _torch_mask_after_eos(target, eos_id, pad_id):
    mask = (target == eos_id).cumsum(dim=-1) > 0
    mask = F.pad(mask, (1, -1), value=False)
    return target.masked_fill(mask, pad_id)


def _torch_set_eos(t, eos_id, pad_id):
    eos_indices = ((t == pad_id).cumsum(dim=-1) == 0).sum(dim=-1, keepdim=True).long()
    batch_range = torch.arange(t.shape[0]).unsqueeze(-1)
    t = F.pad(t, (0, 1), value=pad_id)
    t[batch_range, eos_indices] = eos_id
    return t


def test_top_k_parity():
    logits = np.random.RandomState(0).randn(4, 53).astype(np.float32)
    ref = _torch_top_k(torch.from_numpy(logits.copy())).numpy()
    mine = np.asarray(S.top_k_filter(jnp.asarray(logits)))
    keep = np.isfinite(ref)
    assert (np.isfinite(mine) == keep).all() or (mine[~keep] <= -1e29).all()
    np.testing.assert_allclose(mine[keep], ref[keep], rtol=1e-6)


def test_top_p_parity():
    logits = np.random.RandomState(1).randn(3, 31).astype(np.float32)
    ref = _torch_top_p(torch.from_numpy(logits.copy())).numpy()
    mine = np.asarray(S.top_p_filter(jnp.asarray(logits)))
    keep = np.isfinite(ref)
    assert ((mine <= -1e29) == ~keep).all()
    np.testing.assert_allclose(mine[keep], ref[keep], rtol=1e-6)


def test_mask_after_eos_parity():
    t = np.array([[3, 5, 7, 5, 2], [1, 1, 1, 1, 1], [5, 0, 0, 5, 0]], np.int64)
    ref = _torch_mask_after_eos(torch.from_numpy(t.copy()), eos_id=5, pad_id=-1).numpy()
    mine = np.asarray(S.mask_after_eos(jnp.asarray(t), eos_id=5, pad_id=-1))
    np.testing.assert_array_equal(mine, ref)


def test_set_eos_parity():
    t = np.array([[3, 4, 0, 0], [1, 2, 3, 4], [0, 0, 0, 0]], np.int64)
    ref = _torch_set_eos(torch.from_numpy(t.copy()), eos_id=9, pad_id=0).numpy()
    mine = np.asarray(S.set_eos_id(jnp.asarray(t), eos_id=9, pad_id=0))
    np.testing.assert_array_equal(mine, ref)


def test_gumbel_sample_respects_filter():
    key = jax.random.PRNGKey(0)
    logits = jnp.asarray(np.random.RandomState(2).randn(8, 100).astype(np.float32))
    filt = S.top_k_filter(logits, thres=0.05)
    samples = np.asarray(S.gumbel_sample(key, filt, temperature=1.0))
    kept = np.asarray(filt) > -1e29
    for b, s in enumerate(samples):
        assert kept[b, s]
