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
    """T=300 pads to 384 and takes the ONE-SHOT kernel path (_resolve_blocks
    single-K-block branch); padded key columns must not leak."""
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

    def flash_dispatch(q, k, v, *, key_mask=None, valid_len=None, causal=False,
                       rotary=None, **kw):
        if key_mask is None and not causal:
            if rotary is not None:
                # mirror production: fuse rotary into the (interpret-mode)
                # kernel via tables — default blocks take the one-shot path
                from covomix_tpu.models.layers import rotary_freqs
                from covomix_tpu.ops.flash_attention import rotary_tables_halfsplit
                tables = rotary_tables_halfsplit(rotary[0], rotary[1], q.dtype)
                return flash_attention(q, k, v, valid_len=valid_len, rotary=tables,
                                       interpret=True)
            return flash_attention(q, k, v, valid_len=valid_len, block_q=128,
                                   block_k=128, interpret=True)
        if rotary is not None:
            from covomix_tpu.models.layers import rotary_halfsplit
            q = rotary_halfsplit(rotary[0], rotary[1], q)
            k = rotary_halfsplit(rotary[0], rotary[1], k)
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


def test_flash_default_blocks_oneshot_grad_with_valid_len():
    """Gradients through the production DEFAULT-config path: _resolve_blocks
    takes the ONE-SHOT forward branch (t=800 -> tp=896, single K block, no
    online-softmax carry) whose saved lse feeds the multi-block backward
    kernels, under a valid_len prefix mask — the bf16 training configuration
    (acoustic crop 800-1600). No earlier grad test exercised the one-shot
    forward (all pinned block_q/block_k=128), so a regression there was
    invisible (ADVICE r4)."""
    key = jax.random.PRNGKey(13)
    b, h, t, dh = 1, 2, 800, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    vl = 700
    row_keep = (np.arange(t) < vl)[None, None, :, None]

    def loss_flash(q, k, v):
        o = flash_attention(q, k, v, valid_len=jnp.int32(vl), interpret=True)  # DEFAULT blocks
        return ((o * row_keep) ** 2).sum()

    def loss_ref(q, k, v):
        km = jnp.broadcast_to(jnp.arange(t)[None] < vl, (b, t))
        return ((attend(q, k, v, key_mask=km) * row_keep) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=1e-3, rtol=1e-3)


def test_flash_valid_len_zero_clamps_to_one():
    """valid_len == 0 is outside the serving contract; the wrapper clamps it
    to 1 so a caller bug yields defined output (attend key 0 only), not a
    uniform average over garbage keys (ADVICE r4)."""
    key = jax.random.PRNGKey(14)
    b, h, t, dh = 1, 2, 256, 16
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    with jax.default_matmul_precision("highest"):
        out0 = flash_attention(q, q, q, valid_len=jnp.int32(0), block_q=128,
                               block_k=128, interpret=True)
        out1 = flash_attention(q, q, q, valid_len=jnp.int32(1), block_q=128,
                               block_k=128, interpret=True)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1), atol=1e-6)


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


def test_flash_causal_matches_einsum():
    """causal=True (tq == tk self-attention, T2S training decoder): one-shot
    and multi-block paths vs the einsum reference."""
    key = jax.random.PRNGKey(15)
    b, h, t, dh = 2, 2, 300, 32
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    with jax.default_matmul_precision("highest"):
        ref = attend(q, k, v, causal=True)
        # default blocks -> one-shot branch (t=300 pads to 384)
        out1 = flash_attention(q, k, v, causal=True, interpret=True)
        # explicit small blocks -> multi-K-block online-softmax branch
        out2 = flash_attention(q, k, v, causal=True, block_q=128, block_k=128,
                               interpret=True)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref), atol=2e-5)


def test_flash_causal_with_per_row_valid_len():
    """causal + per-row prefix mask — the T2S training decoder contract
    (right-padded target batches, one valid length per row)."""
    key = jax.random.PRNGKey(16)
    b, h, t, dh = 3, 2, 256, 16
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    vls = np.array([256, 100, 177], np.int32)
    km = jnp.arange(t)[None, :] < jnp.asarray(vls)[:, None]
    with jax.default_matmul_precision("highest"):
        ref = attend(q, k, v, key_mask=km, causal=True)
        out = np.asarray(flash_attention(q, k, v, valid_len=jnp.asarray(vls),
                                         causal=True, block_q=128, block_k=128,
                                         interpret=True))
    for i, vl in enumerate(vls):
        np.testing.assert_allclose(out[i, :, :vl], np.asarray(ref)[i, :, :vl],
                                   atol=2e-5, err_msg=f"row {i}")


def test_flash_causal_grads_match_einsum():
    """Causal backward: dq/dk/dv through both backward kernels (multi-block)
    and through the one-shot forward's saved lse (default blocks)."""
    key = jax.random.PRNGKey(17)
    b, h, t, dh = 2, 2, 320, 16
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    vls = jnp.asarray(np.array([320, 200], np.int32))
    row_keep = (np.arange(t)[None, :] < np.asarray(vls)[:, None])[:, None, :, None]
    km = jnp.arange(t)[None, :] < vls[:, None]

    def loss_ref(q, k, v):
        return ((attend(q, k, v, key_mask=km, causal=True) * row_keep) ** 2).sum()

    with jax.default_matmul_precision("highest"):
        gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
        for blocks in ({}, {"block_q": 128, "block_k": 128}):
            def loss_flash(q, k, v, blocks=blocks):
                o = flash_attention(q, k, v, valid_len=vls, causal=True,
                                    interpret=True, **blocks)
                return ((o * row_keep) ** 2).sum()
            gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
            for a, b_ in zip(gf, gr):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                           atol=1e-3, rtol=1e-3, err_msg=str(blocks))


def test_t2s_forward_loss_flash_vs_einsum_grads(monkeypatch):
    """End-to-end: T2S teacher-forced CE with decoder/encoder attention routed
    through the Pallas kernel (interpret) vs the einsum path — loss and grads
    must match on right-padded batches (the collate contract the prefix_lens
    routing relies on, data_module.py:853)."""
    import covomix_tpu.models.text2semantic as T
    import covomix_tpu.ops.flash_attention as FA

    cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=2, heads=2, dim_head=16,
                      num_text_tokens=50, num_semantic_tokens=20, target_dim=32)
    params = T.init(jax.random.PRNGKey(0), cfg)
    b, s, t = 2, 12, 24
    rng = np.random.RandomState(0)
    src = rng.randint(1, 50, (b, s)).astype(np.int32)
    tgt = rng.randint(0, 20, (b, t)).astype(np.int32)
    src[1, 8:] = cfg.text_pad_id       # right padding
    tgt[1, 17:] = cfg.semantic_pad_id

    def loss(p):
        return T.forward_loss(p, cfg, jnp.asarray(src), jnp.asarray(tgt))

    def flash_dispatch(q, k, v, *, key_mask=None, valid_len=None, causal=False, **kw):
        from covomix_tpu.models.layers import attend as _attend
        if key_mask is None and valid_len is not None and (not causal or q.shape[-2] == k.shape[-2]):
            return FA.flash_attention(q, k, v, valid_len=valid_len, causal=causal,
                                      block_q=128, block_k=128, interpret=True)
        if key_mask is None and valid_len is not None:
            key_mask = jnp.broadcast_to(jnp.arange(k.shape[-2])[None] <
                                        jnp.asarray(valid_len).reshape(-1)[:, None],
                                        (q.shape[0], k.shape[-2]))
        return _attend(q, k, v, key_mask=key_mask, causal=causal)

    with jax.default_matmul_precision("highest"):
        ref_loss, ref_g = jax.value_and_grad(loss)(params)
        monkeypatch.setattr(T, "attend_flash_or_xla", flash_dispatch)
        fl_loss, fl_g = jax.value_and_grad(loss)(params)
    np.testing.assert_allclose(float(fl_loss), float(ref_loss), rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(fl_g), jax.tree_util.tree_leaves(ref_g)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=2e-3)


def test_flash_fused_rotary_matches_external_rotary():
    """rotary=(cos, sin_signed) tables applied IN-KERNEL (one-shot path) must
    match layers.rotary_halfsplit applied outside + plain flash — measured
    bit-identical on chip (tools/attn_fuse_probe.py parity 0.0e+00); assert
    tight tolerance through interpret mode here."""
    from covomix_tpu.models.layers import rotary_freqs, rotary_halfsplit
    from covomix_tpu.ops.flash_attention import rotary_tables_halfsplit

    key = jax.random.PRNGKey(11)
    b, h, t, dh = 2, 4, 300, 64
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    inv = rotary_freqs(dh)
    pos = jnp.arange(t)
    with jax.default_matmul_precision("highest"):
        qr = rotary_halfsplit(pos, inv, q)
        kr = rotary_halfsplit(pos, inv, k)
        ref = flash_attention(qr, kr, v, valid_len=t - 17, interpret=True)
        tables = rotary_tables_halfsplit(pos, inv, q.dtype)
        out = flash_attention(q, k, v, valid_len=t - 17, rotary=tables, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_flash_fused_rotary_grads_match_external():
    """Gradients through the fused-rotary core (counter-rotation backward)
    must match grads of external-rotary + plain flash."""
    from covomix_tpu.models.layers import rotary_freqs, rotary_halfsplit
    from covomix_tpu.ops.flash_attention import rotary_tables_halfsplit

    key = jax.random.PRNGKey(12)
    b, h, t, dh = 1, 2, 256, 64
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    inv = rotary_freqs(dh)
    pos = jnp.arange(t)
    tables = rotary_tables_halfsplit(pos, inv, q.dtype)

    def loss_ext(q, k, v):
        qr = rotary_halfsplit(pos, inv, q)
        kr = rotary_halfsplit(pos, inv, k)
        o = flash_attention(qr, kr, v, valid_len=200, interpret=True)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))

    def loss_fused(q, k, v):
        o = flash_attention(q, k, v, valid_len=200, rotary=tables, interpret=True)
        return jnp.sum(o * jnp.cos(jnp.arange(o.size).reshape(o.shape) * 0.01))

    with jax.default_matmul_precision("highest"):
        ge = jax.grad(loss_ext, argnums=(0, 1, 2))(q, k, v)
        gf = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(ge, gf):
        np.testing.assert_allclose(np.asarray(b_), np.asarray(a), atol=3e-5, rtol=1e-4)


def test_attend_dispatch_rotary_falls_back_bit_identical_off_tpu():
    """Off-TPU, attend_flash_or_xla(rotary=...) must equal pre-rotated
    attend() exactly (the CPU test-suite contract for layer_core)."""
    from covomix_tpu.models.layers import rotary_freqs, rotary_halfsplit
    from covomix_tpu.ops.flash_attention import attend_flash_or_xla

    key = jax.random.PRNGKey(13)
    b, h, t, dh = 2, 2, 64, 64
    q = jax.random.normal(key, (b, h, t, dh), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh), jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh), jnp.float32)
    inv = rotary_freqs(dh)
    pos = jnp.arange(t)
    qr = rotary_halfsplit(pos, inv, q)
    kr = rotary_halfsplit(pos, inv, k)
    ref = attend(qr, kr, v)
    out = attend_flash_or_xla(q, k, v, rotary=(pos, inv))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_resolve_blocks_nopad_oneshot_decisions():
    """Default-config one-shot block resolution: bf16 T=912/800 (sublane-tile
    multiples, not lane multiples) run UNPADDED with bq=t/hb=2 (33.2 -> 25.8
    ms/layer at the B=64 serving shape, tools/attn_nopad_probe.py); lane
    multiples keep the measured bq512/hb4 config; T=300 still pads to 384."""
    from covomix_tpu.ops.flash_attention import (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                                 DEFAULT_HEAD_BLOCK, _resolve_blocks)

    cfg = (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, DEFAULT_HEAD_BLOCK, False)
    bf16 = jnp.dtype(jnp.bfloat16)
    # serving T=912 and the acoustic training crop T=800: no pad, single block
    for t in (912, 800):
        bq, bk, hb, _, tp = _resolve_blocks(cfg, t, 16, bf16)
        assert (bq, bk, tp, hb) == (t, t, t, 2), (t, bq, bk, hb, tp)
    # lane-multiple T keeps the padded-path defaults (bq512/hb4 at tp<=1024)
    bq, bk, hb, _, tp = _resolve_blocks(cfg, 1024, 16, bf16)
    assert (bq, bk, tp, hb) == (512, 1024, 1024, 4)
    # non-sublane-multiple T still pads (384) and one-shots
    bq, bk, hb, _, tp = _resolve_blocks(cfg, 300, 16, bf16)
    assert tp == 384 and bk == 384
    # f32 stays on the padded path (VMEM bound unverified for no-pad f32)
    bq, bk, hb, _, tp = _resolve_blocks(cfg, 912, 16, jnp.dtype(jnp.float32))
    assert tp == 1024


def test_resolve_blocks_explicit_non128_override_terminates():
    """Regression: explicit non-128-multiple block overrides (e.g. the
    backward's capped (304, 512) against tp=1024) made the old -=128 shrink
    loop run forever at trace time; blocks must now land on divisors of tp."""
    from covomix_tpu.ops.flash_attention import _resolve_blocks

    bf16 = jnp.dtype(jnp.bfloat16)
    bq, bk, hb, _, tp = _resolve_blocks((304, 512, 4, False), 912, 16, bf16)
    assert tp % bq == 0 and tp % bk == 0
    bq, bk, hb, _, tp = _resolve_blocks((300, 904, 4, False), 1200, 16, bf16)
    assert tp % bq == 0 and tp % bk == 0


def test_flash_nopad_oneshot_matches_einsum_bf16():
    """The unpadded one-shot path (tp == t == 912) vs einsum, with a prefix
    valid_len — the exact serving configuration the probe measured."""
    key = jax.random.PRNGKey(17)
    b, h, t, dh = 1, 4, 912, 64
    q = jax.random.normal(key, (b, h, t, dh)).astype(jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (b, h, t, dh)).astype(jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (b, h, t, dh)).astype(jnp.bfloat16)
    valid = 777
    mask = jnp.arange(t)[None, :] < valid
    ref = attend(q, k, v, key_mask=jnp.broadcast_to(mask, (b, t)))
    out = flash_attention(q, k, v, valid_len=valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out[:, :, :valid], np.float32),
                               np.asarray(ref[:, :, :valid], np.float32), atol=3e-2)
