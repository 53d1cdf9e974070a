"""Pallas flash attention vs the XLA einsum reference (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from covomix_tpu.models.layers import attend
from covomix_tpu.ops.flash_attention import flash_attention


def test_flash_matches_einsum_attention():
    key = jax.random.PRNGKey(0)
    b, h, t, dh = 2, 2, 512, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = attend(q, k, v)
        out = flash_attention(q, k, v, block_q=256, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_unaligned_length_masked_padding():
    """T=300 pads to 512 internally; padded key columns must not leak."""
    key = jax.random.PRNGKey(3)
    b, h, t, dh = 1, 2, 300, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = attend(q, k, v)
        out = flash_attention(q, k, v, interpret=True)
    assert out.shape == (b, h, t, dh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)


def test_flash_dynamic_valid_len_prefix_mask():
    """valid_len (traced scalar) must reproduce attention over the prefix —
    the bucketed-serving contract (one compile per bucket, any true length)."""
    key = jax.random.PRNGKey(5)
    b, h, t, dh = 1, 2, 512, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    fn = jax.jit(lambda vl: flash_attention(q, k, v, valid_len=vl, block_q=256,
                                            block_k=256, interpret=True))
    with jax.default_matmul_precision("highest"):
        for vl in (300, 256, 511):
            ref = attend(q[:, :, :], k[:, :, :vl], v[:, :, :vl])
            out = fn(jnp.int32(vl))
            np.testing.assert_allclose(np.asarray(out[:, :, :vl]),
                                       np.asarray(ref[:, :, :vl]), atol=2e-5,
                                       err_msg=str(vl))


def test_attend_dispatch_valid_len_off_tpu_builds_mask():
    from covomix_tpu.ops.flash_attention import attend_flash_or_xla

    key = jax.random.PRNGKey(6)
    q = jax.random.normal(key, (2, 2, 64, 16))
    out = attend_flash_or_xla(q, q, q, valid_len=jnp.int32(40))  # CPU -> einsum+mask
    ref = attend(q, q, q, key_mask=jnp.broadcast_to(jnp.arange(64)[None] < 40, (2, 64)))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_flash_dispatch_falls_back_off_tpu():
    from covomix_tpu.ops.flash_attention import attend_flash_or_xla

    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (1, 2, 64, 16))
    out = attend_flash_or_xla(q, q, q)  # T < threshold and CPU -> einsum path
    ref = attend(q, q, q)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)


def test_flash_attention_gradients_match_einsum():
    """flash_attention is differentiable (custom_vjp: einsum-recompute
    backward) — the acoustic training crop (T >= 512) hits this on TPU."""
    key = jax.random.PRNGKey(9)
    b, h, t, dh = 1, 2, 256, 16
    q = jax.random.normal(key, (b, h, t, dh))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh))

    def loss_flash(q, k, v):
        return (flash_attention(q, k, v, block_q=128, block_k=128, interpret=True) ** 2).sum()

    def loss_ref(q, k, v):
        return (attend(q, k, v) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3)


def test_flash_attention_grad_with_valid_len():
    key = jax.random.PRNGKey(10)
    b, h, t, dh = 1, 2, 256, 16
    q = jax.random.normal(key, (b, h, t, dh))
    vl = 200

    def loss_flash(q):
        o = flash_attention(q, q, q, valid_len=jnp.int32(vl), block_q=128, block_k=128,
                            interpret=True)
        return (o[:, :, :vl] ** 2).sum()

    def loss_ref(q):
        km = jnp.broadcast_to(jnp.arange(t)[None] < vl, (b, t))
        return (attend(q, q, q, key_mask=km)[:, :, :vl] ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_flash)(q)
        gr = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-3, rtol=1e-3)


def test_flash_long_sequence_chunked_loop_fwd_bwd():
    """T large enough that the block loops exceed MAX_UNROLL and take the
    chunked-fori path (plus an odd tail block) — forward and backward."""
    key = jax.random.PRNGKey(11)
    b, h, t, dh = 1, 2, 640, 16  # 5 blocks of 128
    q = jax.random.normal(key, (b, h, t, dh))
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh))
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh))
    with jax.default_matmul_precision("highest"):
        out = flash_attention(q, k, v, block_q=128, block_k=128, interpret=True)
        ref = attend(q, k, v)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

        gf = jax.grad(lambda q: (flash_attention(q, k, v, block_q=128, block_k=128,
                                                 interpret=True) ** 2).sum())(q)
        gr = jax.grad(lambda q: (attend(q, k, v) ** 2).sum())(q)
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-3, rtol=1e-3)


def test_acoustic_loss_grad_through_flash_kernel(monkeypatch):
    """End-to-end: the acoustic OT-CFM training loss differentiated with
    attention routed through the Pallas kernel (interpret mode) must match
    the einsum path — the TPU training configuration (crop >= 512) the CPU
    dispatch otherwise never exercises."""
    import covomix_tpu.models.acoustic as A
    import covomix_tpu.ops.flash_attention as FA
    from covomix_tpu.train.loop import acoustic_loss_fn

    cfg = A.AcousticConfig(dim_in=80, dim=32, depth=2, heads=2, dim_head=16,
                           dim_phoneme_emb=16, num_phoneme_tokens=30)
    params = A.init(jax.random.PRNGKey(0), cfg)
    b, t = 2, 128
    key = jax.random.PRNGKey(1)
    batch = {"x": jax.random.normal(key, (b, t, 80)),   # VoSingle: cond = x
             "phonemes": jax.random.randint(key, (b, t), 0, 30),
             "mask": jnp.ones((b, t), bool)}
    loss_fn = acoustic_loss_fn(cfg, cond_drop_prob=0.0)

    def flash_dispatch(q, k, v, *, key_mask=None, valid_len=None, causal=False, **kw):
        if key_mask is None and not causal:
            return flash_attention(q, k, v, valid_len=valid_len, block_q=128,
                                   block_k=128, interpret=True)
        return attend(q, k, v, key_mask=key_mask, causal=causal)

    with jax.default_matmul_precision("highest"):
        ref_loss, ref_grads = jax.value_and_grad(loss_fn)(params, batch, jax.random.PRNGKey(2))
        monkeypatch.setattr(A, "attend_flash_or_xla", flash_dispatch)
        fl_loss, fl_grads = jax.value_and_grad(loss_fn)(params, batch, jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(fl_loss), float(ref_loss), rtol=1e-4)
    flat_r = jax.tree_util.tree_leaves(ref_grads)
    flat_f = jax.tree_util.tree_leaves(fl_grads)
    for a, b_ in zip(flat_f, flat_r):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-3, rtol=2e-3)


def test_flash_per_row_valid_len():
    """valid_len as a [B] vector: each batch row masks its own key prefix —
    the batched-serving contract (serving.BatchedPipeline passes one decode
    length per dialogue row)."""
    key = jax.random.PRNGKey(11)
    b, h, t, dh = 3, 2, 512, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    vls = np.array([512, 130, 300], np.int32)
    fn = jax.jit(lambda vl: flash_attention(q, k, v, valid_len=vl, block_q=256,
                                            block_k=256, interpret=True))
    with jax.default_matmul_precision("highest"):
        out = np.asarray(fn(jnp.asarray(vls)))
        for i, vl in enumerate(vls):
            ref = attend(q[i:i + 1], k[i:i + 1, :, :vl], v[i:i + 1, :, :vl])
            np.testing.assert_allclose(out[i:i + 1, :, :vl], np.asarray(ref[:, :, :vl]),
                                       atol=2e-5, err_msg=f"row {i} vl={vl}")


def test_flash_per_row_valid_len_grad():
    key = jax.random.PRNGKey(12)
    b, h, t, dh = 2, 2, 256, 16
    q = jax.random.normal(key, (b, h, t, dh))
    vls = jnp.asarray(np.array([256, 100], np.int32))
    row_keep = (np.arange(t)[None, :] < np.asarray(vls)[:, None])[:, None, :, None]

    def loss_flash(q):
        o = flash_attention(q, q, q, valid_len=vls, block_q=128, block_k=128,
                            interpret=True)
        return ((o * row_keep) ** 2).sum()

    def loss_ref(q):
        km = jnp.arange(t)[None, :] < vls[:, None]
        return ((attend(q, q, q, key_mask=km) * row_keep) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_flash)(q)
        gr = jax.grad(loss_ref)(q)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), atol=1e-3, rtol=1e-3)


def test_flash_bf16_default_blocks_unequal_pad_regression():
    """Regression (review r3): with bf16 defaults, 512 < t <= 896 resolved to
    block_q in {640,768,896} > block_k=512 and tp = round_up(t, block_q) was
    NOT a multiple of block_k — the kernel's floored num_kb dropped the tail
    key columns entirely (0.28 max-abs error at t=600). Blocks must shrink to
    divisors of tp."""
    key = jax.random.PRNGKey(9)
    b, h, dh = 1, 2, 32
    with jax.default_matmul_precision("highest"):
        for t in (600, 640, 700, 896):
            q = jax.random.normal(key, (b, h, t, dh), jnp.bfloat16)
            k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.bfloat16)
            v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.bfloat16)
            ref = attend(q, k, v)
            out = flash_attention(q, k, v, interpret=True)  # DEFAULT blocks
            err = np.abs(np.asarray(out, np.float32) - np.asarray(ref, np.float32)).max()
            assert err < 0.02, f"t={t}: {err}"


def test_flash_bf16_default_blocks_grad_regression():
    """The custom_vjp backward re-materializes from the forward's lse — the
    same divisibility bug corrupted gradients for 512 < t <= 896 at bf16."""
    key = jax.random.PRNGKey(10)
    b, h, t, dh = 1, 2, 600, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.bfloat16)
    with jax.default_matmul_precision("highest"):
        def loss_flash(q):
            return jnp.sum(jnp.square(flash_attention(q, k, v, interpret=True).astype(jnp.float32)))

        def loss_ref(q):
            return jnp.sum(jnp.square(attend(q, k, v).astype(jnp.float32)))

        gf = jax.grad(loss_flash)(q).astype(jnp.float32)
        gr = jax.grad(loss_ref)(q).astype(jnp.float32)
    scale = np.abs(np.asarray(gr)).max()
    assert np.abs(np.asarray(gf) - np.asarray(gr)).max() < 0.05 * max(scale, 1.0)
