"""BMUF periodic model sync (fairseq/optim/bmuf.py capability; reference
tests run world_size 2 on gloo — tests/distributed/test_bmuf.py:103 — here
the 8-device virtual CPU mesh plays that role). The block update is checked
against a numpy mirror of the reference math (bmuf.py:146-201)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from covomix_tpu.parallel.bmuf import (
    BMUFConfig, bmuf_update, init_bmuf_state, make_bmuf_train_step, stack_for_bmuf,
)

NDP = 4


def _mesh():
    return Mesh(np.array(jax.devices()[:NDP]), ("dp",))


def _run_tick(params_stk, state_stk, cfg):
    """Apply one bmuf_update tick per worker over the stacked trees."""
    mesh = _mesh()

    def tick(p, s):
        sq = lambda t: jax.tree_util.tree_map(lambda x: x[0], t)
        ex = lambda t: jax.tree_util.tree_map(lambda x: x[None], t)
        p2, s2 = bmuf_update(sq(p), sq(s), cfg, axis_name="dp")
        return ex(p2), ex(s2)

    fn = jax.shard_map(tick, mesh=mesh, in_specs=(P("dp"), P("dp")),
                       out_specs=(P("dp"), P("dp")), check_vma=False)
    return jax.jit(fn)(params_stk, state_stk)


def _np_block_sync(p, g, m, bm, block_lr, use_nbm):
    """Numpy mirror of bmuf.py:146-201 (momentum != 0 path)."""
    grad = (g - p).mean(axis=0)                      # pmean over workers
    m_new = bm * m + block_lr * grad                 # smoothed grad (shared)
    p_new = g[0] - m_new                             # g identical across workers
    if use_nbm:
        p_new = p_new - bm * m_new
    return p_new, m_new


def _mk(t_val, *, sync_every=4, **kw):
    rng = np.random.RandomState(0)
    p = {"w": rng.randn(NDP, 3, 5).astype(np.float32)}
    g = {"w": rng.randn(1, 3, 5).astype(np.float32).repeat(NDP, 0)}
    m = {"w": rng.randn(1, 3, 5).astype(np.float32).repeat(NDP, 0) * 0.1}
    state = {"global": {"w": jnp.asarray(g["w"])},
             "smoothed": {"w": jnp.asarray(m["w"])},
             "t": jnp.full((NDP,), t_val, jnp.int32)}
    cfg = BMUFConfig(sync_every=sync_every, **kw)
    return {"w": jnp.asarray(p["w"])}, state, cfg, p, g, m


def test_block_sync_matches_reference_math():
    p, state, cfg, pn, gn, mn = _mk(t_val=3, sync_every=4,
                                    block_momentum=0.75, block_lr=0.9, use_nbm=False)
    p2, s2 = _run_tick(p, state, cfg)
    exp_p, exp_m = _np_block_sync(pn["w"], gn["w"], mn["w"][0], 0.75, 0.9, False)
    got = np.asarray(p2["w"])
    assert np.allclose(got, got[0:1], atol=0), "workers must be identical after sync"
    np.testing.assert_allclose(got[0], exp_p, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["smoothed"]["w"])[0], exp_m, atol=1e-5)
    np.testing.assert_allclose(np.asarray(s2["global"]["w"])[0], exp_p, atol=1e-5)
    assert int(np.asarray(s2["t"])[0]) == 4


def test_block_sync_nesterov():
    p, state, cfg, pn, gn, mn = _mk(t_val=3, sync_every=4,
                                    block_momentum=0.5, block_lr=1.0, use_nbm=True)
    p2, _ = _run_tick(p, state, cfg)
    exp_p, _ = _np_block_sync(pn["w"], gn["w"], mn["w"][0], 0.5, 1.0, True)
    np.testing.assert_allclose(np.asarray(p2["w"])[0], exp_p, atol=1e-5)


def test_noop_between_syncs():
    p, state, cfg, pn, _, mn = _mk(t_val=1, sync_every=4, block_momentum=0.75)
    p2, s2 = _run_tick(p, state, cfg)
    np.testing.assert_array_equal(np.asarray(p2["w"]), pn["w"])  # untouched
    np.testing.assert_array_equal(np.asarray(s2["smoothed"]["w"]), mn["w"])
    assert int(np.asarray(s2["t"])[0]) == 2


def test_momentum_zero_is_plain_averaging():
    p, state, cfg, pn, _, mn = _mk(t_val=3, sync_every=4, block_momentum=0.0)
    p2, s2 = _run_tick(p, state, cfg)
    np.testing.assert_allclose(np.asarray(p2["w"])[0], pn["w"].mean(0), atol=1e-6)
    # bmuf.py:169-173: averaging path leaves the smoothed grad untouched
    np.testing.assert_array_equal(np.asarray(s2["smoothed"]["w"]), mn["w"])


def test_warmup_broadcast_and_average():
    # rank-0 broadcast (default) at t == warmup_steps
    p, state, cfg, pn, _, _ = _mk(t_val=1, sync_every=100,
                                  block_momentum=0.9, warmup_steps=2)
    p2, s2 = _run_tick(p, state, cfg)
    got = np.asarray(p2["w"])
    for w in range(NDP):
        np.testing.assert_allclose(got[w], pn["w"][0], atol=1e-6)
    np.testing.assert_array_equal(np.asarray(s2["smoothed"]["w"]), 0)  # reset
    np.testing.assert_allclose(np.asarray(s2["global"]["w"])[0], pn["w"][0], atol=1e-6)
    # average_sync variant
    p, state, cfg, pn, _, _ = _mk(t_val=1, sync_every=100,
                                  block_momentum=0.9, warmup_steps=2, average_sync=True)
    p2, _ = _run_tick(p, state, cfg)
    np.testing.assert_allclose(np.asarray(p2["w"])[0], pn["w"].mean(0), atol=1e-6)


def test_default_momentum_is_one_minus_inv_world():
    assert BMUFConfig().resolved_momentum(4) == pytest.approx(0.75)
    assert BMUFConfig(block_momentum=0.3).resolved_momentum(4) == pytest.approx(0.3)


def test_bmuf_train_step_end_to_end():
    """Full jitted BMUF training over dp=4 on a least-squares toy: workers
    diverge between syncs (different data shards), reconcile exactly at sync
    steps, and the synced model's loss decreases."""
    from covomix_tpu.train.loop import TrainConfig, init_train_state

    mesh = _mesh()
    rng = np.random.RandomState(1)
    w_true = rng.randn(6, 1).astype(np.float32)
    X = rng.randn(NDP, 16, 6).astype(np.float32)
    Y = X @ w_true + rng.randn(NDP, 16, 1).astype(np.float32) * 0.01

    def loss_fn(params, batch, key):
        pred = batch["x"] @ params["w"]
        return jnp.mean(jnp.square(pred - batch["y"]))

    tcfg = TrainConfig(lr=0.05, ema_decay=0.9)
    bcfg = BMUFConfig(sync_every=3, block_momentum=0.5, use_nbm=True)
    params = {"w": jnp.zeros((6, 1), jnp.float32)}
    ts = init_train_state(params, tcfg)
    stacked = stack_for_bmuf(ts, init_bmuf_state(params), mesh)
    step = make_bmuf_train_step(loss_fn, tcfg, bcfg, mesh)

    batch = {"x": jnp.asarray(X), "y": jnp.asarray(Y)}
    losses = []
    for i in range(9):
        stacked, metrics = step(stacked, batch, jax.random.PRNGKey(i))
        w = np.asarray(stacked["train"][0]["w"])  # TrainState.params is field 0
        losses.append(float(np.asarray(metrics["loss"])[0]))
        if (i + 1) % 3 == 0:
            assert np.allclose(w, w[0:1]), f"step {i+1}: not synced at boundary"
        else:
            assert not np.allclose(w, w[0:1]), f"step {i+1}: workers should diverge"
    assert losses[-1] < losses[0] * 0.5, losses


def test_warmup_resets_inner_optimizer_state():
    """fairseq _warmup_sync restores the inner optimizer's initial state at
    warmup end (bmuf.py:107-123): after the warmup-sync step the Adam moments
    must be fresh (zeros), not the divergent warmup trajectory's."""
    from covomix_tpu.train.loop import TrainConfig, init_train_state

    mesh = _mesh()
    train_cfg = TrainConfig(lr=1e-2)
    params = {"w": jnp.ones((4, 8), jnp.float32)}

    def loss_fn(p, batch, key):
        return jnp.mean(jnp.square(p["w"] - batch["x"]))

    batch = {"x": jnp.arange(NDP * 1 * 4 * 8, dtype=jnp.float32).reshape(NDP, 1, 4, 8) * 0.01}

    def run(warmup):
        st0 = init_train_state(params, train_cfg)
        stk = stack_for_bmuf(st0, init_bmuf_state(st0.params),  mesh)
        step = make_bmuf_train_step(loss_fn, train_cfg,
                                    BMUFConfig(sync_every=10, warmup_steps=warmup), mesh)
        stk, _ = step(stk, batch, jax.random.PRNGKey(0))
        return stk

    # warmup_steps=1: the first step IS the warmup sync -> all float
    # opt-state leaves (Adam moments) reset to zero; without warmup the same
    # step leaves nonzero moments
    def float_leaves(s):
        return [np.asarray(x) for x in jax.tree_util.tree_leaves(s["train"][1])
                if np.asarray(x).dtype.kind == "f"]
    assert any(np.abs(x).max() > 0 for x in float_leaves(run(0)))
    assert all(np.abs(x).max() == 0 for x in float_leaves(run(1)))
