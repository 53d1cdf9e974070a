"""Fused Pallas vocoder-tail kernel vs the op-by-op generator tail.

The kernel fuses lrelu -> ConvTranspose1d(2, k4, p1) -> 3-branch MRF ->
lrelu(0.01) -> conv_post -> tanh on a space-to-depth packed layout; this
must be numerically identical (f32, interpret mode) to the composition in
models/vocoder.py — including sequence-edge zero-padding semantics and
tile-boundary halos."""

import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.models import layers as L
from covomix_tpu.models import vocoder as V
from covomix_tpu.ops import vocoder_tail as VT

C = 31
KERNELS = (3, 7, 11)
DILS = ((1, 3, 5),) * 3


def _params(key):
    up = L.conv1d_init(key, 2 * C, C, 4)  # stored [K, In, Out] for conv_transpose
    blocks = [V._resblock1_init(jax.random.fold_in(key, j), C, KERNELS[j], DILS[j])
              for j in range(3)]
    post = L.conv1d_init(jax.random.fold_in(key, 9), C, 1, 7)
    return up, blocks, post


def _ref_tail(up, blocks, post, x2):
    x = L.leaky_relu(x2, V.LRELU_SLOPE)
    x = L.conv_transpose1d(up, x, stride=2, padding=1, kernel=4)
    acc = None
    for j in range(3):
        y = V._resblock1(blocks[j], x, KERNELS[j], DILS[j])
        acc = y if acc is None else acc + y
    x = acc / 3
    x = L.leaky_relu(x)  # slope 0.01
    x = L.conv1d(post, x, padding=3)
    return jnp.tanh(x)[..., 0]


def _run_fused(up, blocks, post, x2, tbu):
    Wm, Bm, plan = VT.pack_tail_weights(up, blocks, post, C, KERNELS, DILS,
                                        dtype=jnp.float32)
    return VT.fused_tail(x2, Wm, Bm, plan, channels=C, tbu=tbu, interpret=True)


def test_fused_tail_exact_single_tile():
    key = jax.random.PRNGKey(0)
    up, blocks, post = _params(key)
    x2 = jax.random.normal(jax.random.fold_in(key, 1), (1, 120, 2 * C), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = _ref_tail(up, blocks, post, x2)
        out = _run_fused(up, blocks, post, x2, tbu=64)
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_tail_exact_multi_tile_and_batch():
    """Multiple tiles exercise the halo DMA and the edge-mask on first/last
    tiles; batch > 1 exercises the grid's batch axis."""
    key = jax.random.PRNGKey(2)
    up, blocks, post = _params(key)
    x2 = jax.random.normal(jax.random.fold_in(key, 3), (2, 420, 2 * C), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = _ref_tail(up, blocks, post, x2)
        out = _run_fused(up, blocks, post, x2, tbu=64)  # 210 units -> 4 tiles
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_tail_tap_plan_shapes():
    plan, n_slots = VT.plan_tail(KERNELS, DILS)
    assert plan[0][0] == "up" and plan[-1][0] == "post"
    assert len(plan) == 20  # up + 18 mrf convs + post
    # slot count = sum of per-conv tap groups
    assert n_slots == sum(len(e) for _, e in plan)


def test_generator_fused_integration_matches_unfused():
    """generator(fuse_tail='interpret') must match generator(fuse_tail=False)
    end to end — catches integration bugs (stage slicing, dtype, trimming)
    that the kernel-level tests cannot."""
    cfg = V.VocoderConfig(upsample_initial_channel=496)  # 496/16 = 31 channels at the tail
    key = jax.random.PRNGKey(5)
    p = V.init_generator(key, cfg)
    mel = jax.random.normal(jax.random.fold_in(key, 6), (2, 12, cfg.num_mels), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = V.generator(p, cfg, mel, fuse_tail=False)
        out = V.generator(p, cfg, mel, fuse_tail="interpret")
    assert out.shape == ref.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_fused_stage_exact():
    """fused_stage (rate-4 upsample + 62-ch MRF) vs the op-by-op composition."""
    C, CIN = 62, 125
    key = jax.random.PRNGKey(7)
    up = L.conv1d_init(key, CIN, C, 4)
    blocks = [V._resblock1_init(jax.random.fold_in(key, j), C, KERNELS[j], DILS[j])
              for j in range(3)]
    x1 = jax.random.normal(jax.random.fold_in(key, 8), (2, 100, CIN), jnp.float32)

    def ref(x):
        x = L.leaky_relu(x, V.LRELU_SLOPE)
        x = L.conv_transpose1d(up, x, stride=4, padding=0, kernel=4)
        acc = None
        for j in range(3):
            y = V._resblock1(blocks[j], x, KERNELS[j], DILS[j])
            acc = y if acc is None else acc + y
        return acc / 3

    with jax.default_matmul_precision("highest"):
        r = ref(x1)
        Wup, Wm, Bm, plan = VT.pack_stage_weights(up, blocks, C, CIN, KERNELS, DILS,
                                                  dtype=jnp.float32)
        out = VT.fused_stage(x1, Wup, Wm, Bm, plan, channels=C, tbu=48, interpret=True)
    assert out.shape == r.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(r), atol=2e-5)
