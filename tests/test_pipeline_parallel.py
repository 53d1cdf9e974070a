"""Pipeline-parallel (GPipe over 'pp' mesh axis) training parity.

The pipelined OT-CFM loss and its grads must match the single-device
acoustic.cfm_loss bit-for-bit in expectation (identical RNG through
acoustic.cfm_inputs; only reduction order differs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covomix_tpu.models import acoustic as A
from covomix_tpu.parallel import pipeline as PP

CFG = A.AcousticConfig(
    dim_in=8, dim=32, depth=4, dim_head=16, heads=2, ff_mult=2,
    num_phoneme_tokens=11, dim_phoneme_emb=16, conv_pos_kernel=7,
)


def _batch(b=8, t=24):
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.randn(b, t, CFG.mel_dim).astype(np.float32))
    ph = jnp.asarray(r.randint(0, CFG.num_phoneme_tokens, (b, t)))
    cond = jnp.asarray(r.randn(b, t, CFG.dim_in).astype(np.float32))
    return x1, ph, cond


@pytest.mark.parametrize("dp,pp,m", [(2, 2, 4), (1, 4, 2), (2, 4, 4)])
def test_pp_loss_and_grads_match_single_device(dp, pp, m):
    if dp * pp > len(jax.devices()):
        pytest.skip("not enough devices")
    params = A.init(jax.random.PRNGKey(1), CFG)
    x1, ph, cond = _batch()
    key = jax.random.PRNGKey(2)

    loss_ref, grads_ref = jax.jit(jax.value_and_grad(
        lambda p: A.cfm_loss(p, CFG, key, x1, ph, cond, cond_drop_prob=0.2)))(params)

    mesh = PP.make_pp_mesh(dp, pp, jax.devices()[: dp * pp])
    stacked, rest = PP.stack_layer_params(params, CFG)
    pp_params = {"stacked": stacked, "rest": rest}
    shardings = PP.pp_param_shardings(mesh, pp_params)
    pp_params = jax.tree.map(jax.device_put, pp_params, shardings)

    def loss_fn(p):
        return PP.pp_cfm_loss(p, CFG, key, x1, ph, cond, mesh=mesh,
                              num_microbatches=m, cond_drop_prob=0.2)

    loss_pp, grads_pp = jax.jit(jax.value_and_grad(loss_fn))(pp_params)

    np.testing.assert_allclose(float(loss_pp), float(loss_ref), rtol=2e-5)

    back = PP.unstack_layer_params(grads_pp["stacked"], grads_pp["rest"], CFG)
    half = CFG.depth // 2
    # first-half skip placeholders: exactly zero grads
    for i in range(half):
        g = jax.tree.map(lambda a: np.abs(np.asarray(a)).max(),
                         jax.tree.map(lambda a: a[i], grads_pp["stacked"])["skip"])
        assert g["w"] == 0.0 and g["b"] == 0.0
    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat_pp = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_leaves_with_path(back)}
    for kp, ref in flat_ref:
        name = jax.tree_util.keystr(kp)
        got = np.asarray(flat_pp[name])
        np.testing.assert_allclose(got, np.asarray(ref), rtol=1e-4, atol=5e-6,
                                   err_msg=name)


def test_stack_unstack_roundtrip():
    params = A.init(jax.random.PRNGKey(3), CFG)
    stacked, rest = PP.stack_layer_params(params, CFG)
    back = PP.unstack_layer_params(stacked, rest, CFG)
    ref_flat = jax.tree_util.tree_leaves_with_path(params)
    got = {jax.tree_util.keystr(kp): v
           for kp, v in jax.tree_util.tree_leaves_with_path(back)}
    assert len(ref_flat) == len(got)
    for kp, v in ref_flat:
        np.testing.assert_array_equal(np.asarray(got[jax.tree_util.keystr(kp)]), np.asarray(v))


def test_pp_train_step_runs_and_matches():
    """A few optimizer steps under pp x dp track the single-device trajectory."""
    from covomix_tpu.train.loop import TrainConfig, init_train_state, make_train_step
    from covomix_tpu.parallel.train_step import make_sharded_train_step

    if len(jax.devices()) < 4:
        pytest.skip("not enough devices")
    mesh = PP.make_pp_mesh(2, 2, jax.devices()[:4])
    params = A.init(jax.random.PRNGKey(4), CFG)
    x1, ph, cond = _batch()
    tcfg = TrainConfig(lr=1e-3)

    def loss_single(p, batch, key):
        return A.cfm_loss(p, CFG, key, batch[0], batch[1], batch[2])

    def loss_pp(p, batch, key):
        return PP.pp_cfm_loss(p, CFG, key, batch[0], batch[1], batch[2],
                              mesh=mesh, num_microbatches=4)

    state_ref = init_train_state(params, tcfg)
    # no donation: the pp param tree may alias these buffers (device_put with a
    # matching sharding is a no-op on single-host CPU)
    step_ref = make_train_step(loss_single, tcfg, donate=False)

    pp_params = dict(zip(("stacked", "rest"), PP.stack_layer_params(params, CFG)))
    shardings = PP.pp_param_shardings(mesh, pp_params)
    pp_params = jax.tree.map(jax.device_put, pp_params, shardings)
    state_pp = init_train_state(pp_params, tcfg)
    step_pp = make_sharded_train_step(loss_pp, tcfg, mesh, shardings)

    batch = (x1, ph, cond)
    for i in range(3):
        key = jax.random.PRNGKey(100 + i)
        state_ref, m_ref = step_ref(state_ref, batch, key)
        state_pp, m_pp = step_pp(state_pp, batch, key)
        np.testing.assert_allclose(float(m_pp["loss"]), float(m_ref["loss"]), rtol=5e-5)

    back = PP.unstack_layer_params(state_pp.params["stacked"], state_pp.params["rest"], CFG)
    ref0 = np.asarray(state_ref.params["layers"][0]["qkv"]["w"])
    got0 = np.asarray(back["layers"][0]["qkv"]["w"])
    np.testing.assert_allclose(got0, ref0, rtol=1e-4, atol=1e-6)
