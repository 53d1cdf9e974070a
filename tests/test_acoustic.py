"""Acoustic flow-matching model: shapes, losses, sampler, variants."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from covomix_tpu.models import acoustic as A

TINY = A.AcousticConfig(dim_in=80, dim=64, depth=2, heads=2, dim_head=16, dim_phoneme_emb=32, num_phoneme_tokens=502)
VOMIX = A.AcousticConfig(dim_in=160, dim=64, depth=2, heads=2, dim_head=16, dim_phoneme_emb=32, num_phoneme_tokens=502, mode="two_one")


@pytest.fixture(scope="module")
def tiny_params():
    return jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def vomix_params():
    return jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), VOMIX)


def test_forward_shapes_single(tiny_params):
    B, T = 2, 24
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (B, T, 80))
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jax.random.normal(key, (B, T, 80))
    out = jax.jit(functools.partial(A.forward, cfg=TINY))(tiny_params, x=x, phoneme_ids=ph, cond=cond, times=jnp.array([0.3, 0.7]))
    assert out.shape == (B, T, 80)
    assert np.isfinite(np.asarray(out)).all()


def test_forward_shapes_vomix(vomix_params):
    B, T = 2, 24
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (B, T, 80))
    ph = jax.random.randint(key, (B, T, 2), 0, 502)
    cond = jax.random.normal(key, (B, T, 160))
    out = jax.jit(functools.partial(A.forward, cfg=VOMIX))(vomix_params, x=x, phoneme_ids=ph, cond=cond, times=jnp.array([0.3, 0.7]))
    assert out.shape == (B, T, 80)  # mixed single-channel output (acoustic.py:403-404)


def test_cfm_loss_and_grad(tiny_params):
    B, T = 2, 16
    key = jax.random.PRNGKey(4)
    x1 = jax.random.normal(key, (B, T, 80))
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jax.random.normal(key, (B, T, 80))
    loss_fn = lambda p: A.cfm_loss(p, TINY, key, x1, ph, cond, cond_drop_prob=0.3)
    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(tiny_params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gnorm > 0


def test_masked_loss_ignores_unmasked_region(tiny_params):
    """Loss must depend only on the masked region (acoustic.py:527-538)."""
    B, T = 1, 16
    key = jax.random.PRNGKey(5)
    x1 = jax.random.normal(key, (B, T, 80))
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jax.random.normal(key, (B, T, 80))
    mask = jnp.zeros((B, T), bool).at[:, 8:].set(True)
    loss_fn = jax.jit(functools.partial(A.cfm_loss, cfg=TINY))
    l1 = float(loss_fn(tiny_params, key=key, x1=x1, phoneme_ids=ph, cond=cond, mask=mask))
    # perturb the *unmasked* target region: loss unchanged (same key -> same noise/t)
    x1_perturbed = x1.at[:, :8].add(10.0)
    l2 = float(loss_fn(tiny_params, key=key, x1=x1_perturbed, phoneme_ids=ph, cond=cond, mask=mask))
    # the flow target in the masked region is unchanged; cond is zeroed there on
    # the masked region only; the unmasked cond change DOES feed the network, so
    # allow small difference but targets differ drastically if mask was ignored
    assert abs(l1 - l2) < l1 * 0.5


def test_sample_shapes_and_cfg(tiny_params, vomix_params):
    key = jax.random.PRNGKey(6)
    B, T = 1, 12
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jnp.zeros((B, T, 80))
    out = jax.jit(functools.partial(A.sample, cfg=TINY, cond_scale=0.7, step_size=0.25))(tiny_params, key=key, phoneme_ids=ph, cond=cond)
    assert out.shape == (B, T, 80)
    ph2 = jax.random.randint(key, (B, T, 2), 0, 502)
    cond2 = jnp.zeros((B, T, 160))
    out2 = jax.jit(functools.partial(A.sample, cfg=VOMIX, cond_scale=0.7, step_size=0.25))(vomix_params, key=key, phoneme_ids=ph2, cond=cond2)
    assert out2.shape == (B, T, 80)  # y0 = randn_like(cond[..., :80]) (acoustic.py:647-650)


def test_random_span_mask_contiguous():
    key = jax.random.PRNGKey(7)
    mask = np.asarray(A.random_span_mask(key, 8, 50, 0.7, 1.0))
    for row in mask:
        idx = np.where(row)[0]
        assert len(idx) >= int(0.7 * 50) - 1
        assert (np.diff(idx) == 1).all()  # one contiguous span


def test_cfg_formula(tiny_params):
    """forward_with_cond_scale: logits*(1+s) - s*null (acoustic.py:414-428)."""
    B, T, s = 1, 8, 0.7
    key = jax.random.PRNGKey(8)
    x = jax.random.normal(key, (B, T, 80))
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jax.random.normal(key, (B, T, 80))
    times = jnp.array([0.5])
    # pin f32 matmuls: batch-1 vs batch-2 runs must agree numerically
    with jax.default_matmul_precision("highest"):
        fwd = jax.jit(functools.partial(A.forward, cfg=TINY))
        logits = fwd(tiny_params, x=x, phoneme_ids=ph, cond=cond, times=times, cond_drop_mask=jnp.zeros((B,), bool))
        null = fwd(tiny_params, x=x, phoneme_ids=ph, cond=cond, times=times, cond_drop_mask=jnp.ones((B,), bool))
        expected = logits * (1 + s) - s * null
        # the sampler folds (cond, null) into one doubled batch (A.sample)
        x2 = jnp.concatenate([x, x]); ph2 = jnp.concatenate([ph, ph]); c2 = jnp.concatenate([cond, cond])
        drop = jnp.array([False, True]); t2 = jnp.array([0.5, 0.5])
        out = fwd(tiny_params, x=x2, phoneme_ids=ph2, cond=c2, times=t2, cond_drop_mask=drop)
        got = out[:1] * (1 + s) - s * out[1:]
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=2e-4)
