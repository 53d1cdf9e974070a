"""Adaptive Tsit5 sampler (torchode-path parity): coefficient order conditions
and agreement with the fixed-step midpoint sampler on the same field."""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from covomix_tpu.models import acoustic as A
from covomix_tpu.models.acoustic import _TSIT5_A, _TSIT5_B, _TSIT5_C, _TSIT5_E

TINY = A.AcousticConfig(dim_in=80, dim=32, depth=2, heads=2, dim_head=16, dim_phoneme_emb=16, num_phoneme_tokens=502)


def test_tsit5_order_conditions():
    b = np.asarray(_TSIT5_B)
    c = np.asarray(_TSIT5_C)
    # order-1..3 conditions for the 5th-order weights
    np.testing.assert_allclose(b.sum(), 1.0, atol=1e-12)
    np.testing.assert_allclose((b * c).sum(), 0.5, atol=1e-9)
    np.testing.assert_allclose((b * c**2).sum(), 1.0 / 3.0, atol=1e-8)
    # consistency: each stage's a-row sums to its c
    for s in range(1, 7):
        np.testing.assert_allclose(sum(_TSIT5_A[s]), c[s], atol=1e-7)
    # error weights sum to ~0 (difference of two consistent methods)
    np.testing.assert_allclose(np.asarray(_TSIT5_E).sum(), 0.0, atol=1e-9)


def test_adaptive_matches_midpoint_trajectory():
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), TINY)
    key = jax.random.PRNGKey(1)
    B, T = 1, 12
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jax.random.normal(key, (B, T, 80)) * 0.1
    mid = jax.jit(functools.partial(A.sample, cfg=TINY, cond_scale=1.0, step_size=1 / 64))(
        params, key=key, phoneme_ids=ph, cond=cond)
    ada_fn = jax.jit(functools.partial(A.sample_adaptive, cfg=TINY, cond_scale=1.0, atol=1e-5, rtol=1e-5))
    ada, steps = ada_fn(params, key=key, phoneme_ids=ph, cond=cond)
    assert int(steps) < 64  # adaptivity: far fewer than the dense-step baseline
    diff = np.abs(np.asarray(ada) - np.asarray(mid))
    scale = np.abs(np.asarray(mid)).mean() + 1e-6
    assert diff.max() / scale < 0.05, (diff.max(), scale)


def test_adaptive_bf16_converges():
    """bf16 serving dtype: the rounding-noise floor in the error scale keeps
    the controller from rejecting to max_steps (the round-2 f32-only
    limitation); accuracy is bounded by the bf16 noise floor, so compare
    against the f32 trajectory at a bf16-appropriate tolerance."""
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), TINY)
    key = jax.random.PRNGKey(1)
    B, T = 1, 12
    ph = jax.random.randint(key, (B, T), 0, 502)
    cond = jax.random.normal(key, (B, T, 80)) * 0.1
    ada_fn = functools.partial(A.sample_adaptive, cfg=TINY, cond_scale=1.0,
                               atol=1e-5, rtol=1e-5, max_steps=64)
    ref, steps32 = jax.jit(functools.partial(ada_fn, dtype=jnp.float32))(
        params, key=key, phoneme_ids=ph, cond=cond)
    y16, steps16 = jax.jit(functools.partial(ada_fn, dtype=jnp.bfloat16))(
        params, key=key, phoneme_ids=ph, cond=cond)
    assert int(steps16) < 64, int(steps16)          # controller converges
    assert int(steps16) <= int(steps32) + 16        # and doesn't thrash
    diff = np.abs(np.asarray(y16) - np.asarray(ref))
    scale = np.abs(np.asarray(ref)).mean() + 1e-6
    assert diff.max() / scale < 0.15, (diff.max(), scale)


def test_adaptive_with_cfg_runs():
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(2), TINY)
    key = jax.random.PRNGKey(3)
    ph = jax.random.randint(key, (1, 8), 0, 502)
    cond = jnp.zeros((1, 8, 80))
    y, steps = jax.jit(functools.partial(A.sample_adaptive, cfg=TINY, cond_scale=0.7))(
        params, key=key, phoneme_ids=ph, cond=cond)
    assert y.shape == (1, 8, 80)
    assert np.isfinite(np.asarray(y)).all()
