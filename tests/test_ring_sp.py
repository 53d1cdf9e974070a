"""Sequence-parallel (ring attention over 'sp') training parity.

The time-sharded OT-CFM loss and grads must match the single-device
acoustic.cfm_loss (identical RNG via acoustic.cfm_inputs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from covomix_tpu.models import acoustic as A
from covomix_tpu.models import layers as L
from covomix_tpu.parallel import ring as R

CFG = A.AcousticConfig(
    dim_in=8, dim=32, depth=4, dim_head=16, heads=2, ff_mult=2,
    num_phoneme_tokens=11, dim_phoneme_emb=16, conv_pos_kernel=7,
)


def _batch(b=4, t=32):
    r = np.random.RandomState(0)
    x1 = jnp.asarray(r.randn(b, t, CFG.mel_dim).astype(np.float32))
    ph = jnp.asarray(r.randint(0, CFG.num_phoneme_tokens, (b, t)))
    cond = jnp.asarray(r.randn(b, t, CFG.dim_in).astype(np.float32))
    return x1, ph, cond


def test_ring_attention_matches_dense():
    """ring_attention over sp shards == full attention on the gathered seq."""
    sp = 4
    if len(jax.devices()) < sp:
        pytest.skip("not enough devices")
    mesh = R.make_sp_mesh(1, sp, jax.devices()[:sp])
    r = np.random.RandomState(1)
    b, h, t, dh = 2, 2, 32, 8
    q, k, v = (jnp.asarray(r.randn(b, h, t, dh).astype(np.float32)) for _ in range(3))
    from jax.sharding import PartitionSpec as P

    out = jax.jit(jax.shard_map(
        lambda q, k, v: R.ring_attention(q, k, v, "sp", sp),
        mesh=mesh, in_specs=P(None, None, "sp"), out_specs=P(None, None, "sp"),
        check_vma=False))(q, k, v)
    ref = L.attend(q, k, v)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_conv_halo_matches_same_padding():
    sp = 4
    if len(jax.devices()) < sp:
        pytest.skip("not enough devices")
    mesh = R.make_sp_mesh(1, sp, jax.devices()[:sp])
    r = np.random.RandomState(2)
    c, kernel = 16, 7
    p = {"w": jnp.asarray(r.randn(kernel, 1, c).astype(np.float32) * 0.1),
         "b": jnp.asarray(r.randn(c).astype(np.float32) * 0.1)}
    x = jnp.asarray(r.randn(2, 32, c).astype(np.float32))
    from jax.sharding import PartitionSpec as P

    out = jax.jit(jax.shard_map(
        lambda x: R.conv1d_halo(p, x, kernel, c, "sp", sp),
        mesh=mesh, in_specs=P(None, "sp"), out_specs=P(None, "sp"),
        check_vma=False))(x)
    ref = L.conv1d(p, x, padding=kernel // 2, groups=c)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("cond_scale", [1.0, 0.7])
@pytest.mark.parametrize("dp,sp", [(2, 2), (1, 4)])
def test_sample_sp_matches_single_device(dp, sp, cond_scale):
    if dp * sp > len(jax.devices()):
        pytest.skip("not enough devices")
    params = A.init(jax.random.PRNGKey(3), CFG)
    _, ph, cond = _batch()
    key = jax.random.PRNGKey(4)
    ref = jax.jit(lambda: A.sample(params, CFG, key, ph, cond, cond_scale=cond_scale))()
    mesh = R.make_sp_mesh(dp, sp, jax.devices()[: dp * sp])
    got = jax.jit(lambda: R.sample_sp(params, CFG, key, ph, cond, mesh=mesh,
                                      cond_scale=cond_scale))()
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=5e-4)


@pytest.mark.parametrize("dp,sp", [(2, 2), (1, 4), (2, 4)])
def test_sp_loss_and_grads_match_single_device(dp, sp):
    if dp * sp > len(jax.devices()):
        pytest.skip("not enough devices")
    params = A.init(jax.random.PRNGKey(1), CFG)
    x1, ph, cond = _batch()
    key = jax.random.PRNGKey(2)

    loss_ref, grads_ref = jax.jit(jax.value_and_grad(
        lambda p: A.cfm_loss(p, CFG, key, x1, ph, cond, cond_drop_prob=0.2)))(params)

    mesh = R.make_sp_mesh(dp, sp, jax.devices()[: dp * sp])
    loss_sp, grads_sp = jax.jit(jax.value_and_grad(
        lambda p: R.cfm_loss_sp(p, CFG, key, x1, ph, cond, mesh=mesh,
                                cond_drop_prob=0.2)))(params)

    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=2e-5)
    flat_ref = jax.tree_util.tree_leaves_with_path(grads_ref)
    flat_sp = {jax.tree_util.keystr(kp): v
               for kp, v in jax.tree_util.tree_leaves_with_path(grads_sp)}
    for kp, ref in flat_ref:
        name = jax.tree_util.keystr(kp)
        np.testing.assert_allclose(np.asarray(flat_sp[name]), np.asarray(ref),
                                   rtol=1e-4, atol=5e-6, err_msg=name)
