"""Bucket-padding skew: padded inference vs exact-length inference.

The reference runs the acoustic transformer at exact sequence lengths
(monologue_generation.py:168-172); this repo buckets lengths for XLA
executable reuse (pipeline.py). Without an attention mask, pad frames
(cond 0 / token 501) leak into dense attention and skew the valid-region
output. The fix is the optional key_mask threaded through acoustic.forward;
this file quantifies the skew and asserts the mask removes it."""

import numpy as np
import jax
import jax.numpy as jnp

from covomix_tpu.models import acoustic as A

CFG = A.AcousticConfig(dim_in=80, dim=64, depth=2, heads=2, dim_head=16,
                       dim_phoneme_emb=32, num_phoneme_tokens=502)


def _inputs(t, seed=0):
    rng = np.random.RandomState(seed)
    x = rng.randn(1, t, 80).astype(np.float32)
    ph = rng.randint(0, 500, (1, t)).astype(np.int32)
    cond = rng.randn(1, t, 80).astype(np.float32)
    return x, ph, cond


def _pad(arr, tb, value):
    pad = [(0, 0), (0, tb - arr.shape[1])] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad, constant_values=value)


def test_key_mask_removes_padding_skew():
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), CFG)
    t, tb = 45, 128
    x, ph, cond = _inputs(t)
    times = jnp.array([0.5])

    with jax.default_matmul_precision("highest"):
        exact = np.asarray(A.forward(params, CFG, jnp.asarray(x), jnp.asarray(ph),
                                     jnp.asarray(cond), times))
        xp = _pad(x, tb, 0.0)
        php = _pad(ph, tb, 501)
        cp = _pad(cond, tb, 0.0)
        unmasked = np.asarray(A.forward(params, CFG, jnp.asarray(xp), jnp.asarray(php),
                                        jnp.asarray(cp), times))[:, :t]
        km = jnp.asarray((np.arange(tb) < t)[None, :])
        masked = np.asarray(A.forward(params, CFG, jnp.asarray(xp), jnp.asarray(php),
                                      jnp.asarray(cp), times, key_mask=km))[:, :t]

    skew_unmasked = float(np.abs(unmasked - exact).max())
    skew_masked = float(np.abs(masked - exact).max())
    print(f"padding skew: unmasked {skew_unmasked:.5f}, masked {skew_masked:.2e}")
    # documented finding: unmasked bucket padding materially changes the output
    assert skew_unmasked > 1e-3
    # the key mask restores exact-length behavior to numerical noise
    assert skew_masked < 1e-4


def test_valid_len_matches_key_mask_and_exact():
    """The scalar valid_len prefix mask (the production serving path — keeps
    attention on the flash kernel on TPU) must match both the bool key_mask
    and exact-length inference."""
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), CFG)
    t, tb = 45, 128
    x, ph, cond = _inputs(t)
    times = jnp.array([0.5])

    with jax.default_matmul_precision("highest"):
        exact = np.asarray(A.forward(params, CFG, jnp.asarray(x), jnp.asarray(ph),
                                     jnp.asarray(cond), times))
        xp, php, cp = _pad(x, tb, 0.0), _pad(ph, tb, 501), _pad(cond, tb, 0.0)
        # traced scalar like pipeline.flow_sample passes (one compile per bucket)
        fwd = jax.jit(lambda vl: A.forward(params, CFG, jnp.asarray(xp), jnp.asarray(php),
                                           jnp.asarray(cp), times, valid_len=vl))
        via_valid = np.asarray(fwd(jnp.int32(t)))[:, :t]
    assert float(np.abs(via_valid - exact).max()) < 1e-4


def test_sample_accepts_valid_len():
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), CFG)
    t = 64
    _, ph, cond = _inputs(t, seed=3)
    out = A.sample(params, CFG, jax.random.PRNGKey(3), jnp.asarray(ph), jnp.asarray(cond),
                   cond_scale=0.7, valid_len=jnp.int32(50))
    assert out.shape == (1, t, 80)
    assert np.isfinite(np.asarray(out)).all()


def test_sample_accepts_key_mask():
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), CFG)
    t = 64
    _, ph, cond = _inputs(t, seed=2)
    km = jnp.ones((1, t), bool)
    out = A.sample(params, CFG, jax.random.PRNGKey(2), jnp.asarray(ph), jnp.asarray(cond),
                   cond_scale=0.7, key_mask=km)
    assert out.shape == (1, t, 80)
    assert np.isfinite(np.asarray(out)).all()
