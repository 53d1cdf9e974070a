"""Text2Semantic: training loss, AR decode, dual-stream CoMix, EOS semantics."""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from covomix_tpu.models import text2semantic as T

TINY = T.T2SConfig(dim=64, source_depth=2, target_depth=2, heads=2, dim_head=16,
                   num_text_tokens=50, num_semantic_tokens=20, target_dim=64)
COMIX = T.T2SConfig(dim=64, source_depth=2, target_depth=2, heads=2, dim_head=16,
                    num_text_tokens=50, num_semantic_tokens=20, target_dim=64, two_output=True)


@pytest.fixture(scope="module")
def tiny_params():
    return jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(0), TINY)


@pytest.fixture(scope="module")
def comix_params():
    return jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(1), COMIX)


def test_loss_and_grad(tiny_params):
    key = jax.random.PRNGKey(2)
    src = jax.random.randint(key, (2, 7), 1, 50)
    tgt = jax.random.randint(key, (2, 9), 0, 20)
    loss, grads = jax.jit(jax.value_and_grad(lambda p: T.forward_loss(p, TINY, src, tgt)))(tiny_params)
    assert np.isfinite(float(loss))
    gnorm = jax.tree_util.tree_reduce(lambda a, g: a + float(jnp.sum(jnp.abs(g))), grads, 0.0)
    assert gnorm > 0


def test_comix_loss_two_streams(comix_params):
    key = jax.random.PRNGKey(3)
    src = jax.random.randint(key, (2, 7), 1, 50)
    tgt = jax.random.randint(key, (2, 9, 2), 0, 20)
    loss = jax.jit(functools.partial(T.forward_loss, cfg=COMIX))(comix_params, source_ids=src, target_ids=tgt)
    assert np.isfinite(float(loss))


def test_generate_shapes_and_determinism(tiny_params):
    key = jax.random.PRNGKey(4)
    src = jax.random.randint(key, (2, 5), 1, 50)
    gen_fn = jax.jit(functools.partial(T.generate, cfg=TINY, max_length=16))
    g1 = gen_fn(tiny_params, key=key, source_ids=src)
    g2 = gen_fn(tiny_params, key=key, source_ids=src)
    np.testing.assert_array_equal(np.asarray(g1.tokens), np.asarray(g2.tokens))
    assert g1.tokens.shape == (2, 16)
    toks = np.asarray(g1.tokens)
    valid = toks != TINY.semantic_pad_id
    assert (toks[valid] >= 0).all() and (toks[valid] <= TINY.semantic_eos_id).all()


def test_generate_stops_on_eos():
    """With a 4-token vocab EOS is sampled within a few steps per row; the loop
    must stop once every row has an EOS, and positions after the first EOS must
    be pad (mask_after_eos, text2semantic.py:807-826)."""
    cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                      num_text_tokens=11, num_semantic_tokens=3, target_dim=32)
    params = jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(9), cfg)
    # shrink the tied embedding so logits ~ 0 -> near-uniform sampling, EOS
    # (1 of 4 tokens) arrives within a few steps per row
    params = dict(params)
    params["sem_emb"] = {"w": params["sem_emb"]["w"] * 0.01}
    key = jax.random.PRNGKey(5)
    src = jax.random.randint(key, (2, 4), 1, 11)
    max_length = 96
    gen = jax.jit(functools.partial(T.generate, cfg=cfg, max_length=max_length, top_k_thres=1.0))(
        params, key=key, source_ids=src)
    toks = np.asarray(gen.tokens)
    eos, pad = cfg.semantic_eos_id, cfg.semantic_pad_id
    assert int(gen.num_steps) < max_length, "never stopped (EOS stop broken)"
    for row in toks:
        eos_pos = np.where(row == eos)[0]
        assert len(eos_pos) >= 1
        first = eos_pos[0]
        assert (row[first + 1:] == pad).all()  # everything after first EOS is pad
        assert (row[:first] != pad).all()


def test_comix_generate_two_streams(comix_params):
    key = jax.random.PRNGKey(6)
    src = jax.random.randint(key, (1, 5), 1, 50)
    gen = jax.jit(functools.partial(T.generate, cfg=COMIX, max_length=12))(comix_params, key=key, source_ids=src)
    assert gen.tokens.shape == gen.tokens2.shape == (1, 12)
    # streams differ (independent heads + samples) with overwhelming probability
    assert not np.array_equal(np.asarray(gen.tokens), np.asarray(gen.tokens2))


def test_cfg_decode_runs(tiny_params):
    key = jax.random.PRNGKey(7)
    src = jax.random.randint(key, (1, 5), 1, 50)
    gen = jax.jit(functools.partial(T.generate, cfg=TINY, max_length=8, cond_scale=1.5))(tiny_params, key=key, source_ids=src)
    assert gen.tokens.shape == (1, 8)


def test_loss_drops_with_teacher_forcing_overfit(tiny_params):
    """3 gradient steps on one batch should reduce the loss (sanity of grads)."""
    import optax

    key = jax.random.PRNGKey(8)
    src = jax.random.randint(key, (2, 6), 1, 50)
    tgt = jax.random.randint(key, (2, 8), 0, 20)
    opt = optax.adam(1e-3)
    params = tiny_params
    state = opt.init(params)
    loss_fn = lambda p: T.forward_loss(p, TINY, src, tgt)

    @jax.jit
    def step(p, s):
        l, g = jax.value_and_grad(loss_fn)(p)
        updates, s = opt.update(g, s)
        return optax.apply_updates(p, updates), s, l

    losses = []
    for _ in range(4):
        params, state, l = step(params, state)
        losses.append(float(l))
    assert losses[-1] < losses[0]


def test_min_length_forces_full_decode(tiny_params):
    """min_length == max_length masks EOS -> decode runs every step (used by
    bench.py to measure honest full-length AR cost)."""
    key = jax.random.PRNGKey(11)
    src = jax.random.randint(key, (2, 6), 1, 50)
    L = 12
    res = T.generate(tiny_params, TINY, key, src, max_length=L, min_length=L)
    assert int(res.num_steps) == L
    toks = np.asarray(res.tokens)
    assert (toks[:, : L - 1] != TINY.semantic_eos_id).all()  # EOS banned before min_length
