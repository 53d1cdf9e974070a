"""Layer-level parity vs torch formulas (RMSNorm, rotary conventions, GEGLU)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from covomix_tpu.models import layers as L


def test_rmsnorm_matches_reference_formula():
    # F.normalize(x, dim=-1) * sqrt(d) * gamma (acoustic.py:165-175)
    x = np.random.RandomState(0).randn(2, 5, 16).astype(np.float32)
    gamma = np.random.RandomState(1).randn(16).astype(np.float32)
    ref = (F.normalize(torch.from_numpy(x), dim=-1) * (16**0.5) * torch.from_numpy(gamma)).numpy()
    mine = np.asarray(L.rmsnorm({"gamma": jnp.asarray(gamma)}, jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_rotary_halfsplit_matches_acoustic_reference():
    # acoustic.py:116-137: freqs = cat((f, f)); rotate_half = split-in-two-halves
    dh, T = 8, 6
    t = np.random.RandomState(0).randn(1, 2, T, dh).astype(np.float32)
    inv_freq = 1.0 / (10000 ** (np.arange(0, dh, 2, dtype=np.float32) / dh))
    freqs = np.einsum("i,j->ij", np.arange(T, dtype=np.float32), inv_freq)
    freqs = np.concatenate([freqs, freqs], axis=-1)
    tt = torch.from_numpy(t)
    x1, x2 = tt.chunk(2, dim=-1)
    rot = torch.cat((-x2, x1), dim=-1)
    ref = (tt * torch.from_numpy(np.cos(freqs)) + rot * torch.from_numpy(np.sin(freqs))).numpy()
    mine = np.asarray(L.rotary_halfsplit(jnp.arange(T), jnp.asarray(inv_freq), jnp.asarray(t)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_rotary_interleaved_matches_lucidrains_reference():
    # rotary_embedding_torch.py:36-49: interleaved pairs
    dh, T = 8, 5
    t = np.random.RandomState(1).randn(1, 2, T, dh).astype(np.float32)
    inv_freq = 1.0 / (10000 ** (np.arange(0, dh, 2, dtype=np.float32) / dh))
    freqs = np.einsum("i,j->ij", np.arange(T, dtype=np.float32), inv_freq)
    freqs = np.repeat(freqs, 2, axis=-1)
    tt = torch.from_numpy(t)
    tp = tt.reshape(1, 2, T, dh // 2, 2)
    rot = torch.stack((-tp[..., 1], tp[..., 0]), dim=-1).reshape(1, 2, T, dh)
    ref = (tt * torch.from_numpy(np.cos(freqs)) + rot * torch.from_numpy(np.sin(freqs))).numpy()
    mine = np.asarray(L.rotary_interleaved(jnp.arange(T), jnp.asarray(inv_freq), jnp.asarray(t)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_geglu_matches_reference():
    # text2semantic.py:154-157: x, gate = chunk; gelu(gate) * x
    x = np.random.RandomState(2).randn(2, 3, 10).astype(np.float32)
    a, gate = torch.from_numpy(x).chunk(2, dim=-1)
    ref = (F.gelu(gate) * a).numpy()
    mine = np.asarray(L.geglu(jnp.asarray(x)))
    np.testing.assert_allclose(mine, ref, atol=1e-5)


def test_attend_causal_with_cache_offset():
    # query at absolute position 3 attends keys 0..3 only
    q = jnp.asarray(np.random.RandomState(3).randn(1, 1, 1, 4).astype(np.float32))
    k = jnp.asarray(np.random.RandomState(4).randn(1, 1, 6, 4).astype(np.float32))
    v = jnp.asarray(np.random.RandomState(5).randn(1, 1, 6, 4).astype(np.float32))
    out_offset = L.attend(q, k, v, causal=True, q_offset=3)
    out_mask = L.attend(q, k[:, :, :4], v[:, :, :4])
    np.testing.assert_allclose(np.asarray(out_offset), np.asarray(out_mask), atol=1e-5)


def test_conv_transpose_matches_torch():
    x = np.random.RandomState(6).randn(1, 80, 9).astype(np.float32)  # [B, C, T] torch
    w = np.random.RandomState(7).randn(80, 40, 8).astype(np.float32)  # [in, out, k]
    ref = torch.conv_transpose1d(torch.from_numpy(x), torch.from_numpy(w), stride=5, padding=1).numpy()
    p = {"w": jnp.asarray(w.transpose(2, 0, 1))}
    import jax
    with jax.default_matmul_precision("highest"):
        mine = np.asarray(L.conv_transpose1d(p, jnp.asarray(x.transpose(0, 2, 1)), stride=5, padding=1, kernel=8))
    np.testing.assert_allclose(mine.transpose(0, 2, 1), ref, atol=1e-4)


def test_depthwise_conv1d_matches_grouped_conv():
    """Shift-and-add depthwise conv == lax grouped conv, values AND both
    grads (the grouped-conv WEIGHT grad is the op the TPU stack mishandles —
    see layers.depthwise_conv1d; on CPU both lower fine, so grad parity is
    checkable here)."""
    import jax

    rng = np.random.RandomState(8)
    k, c, t = 31, 16, 50
    p = {"w": jnp.asarray(rng.randn(k, 1, c).astype(np.float32) * 0.2),
         "b": jnp.asarray(rng.randn(c).astype(np.float32))}
    x = jnp.asarray(rng.randn(2, t, c).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        ref = L.conv1d(p, x, padding=k // 2, groups=c)
        mine = L.depthwise_conv1d(p, x, padding=k // 2)
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-5)

        def loss(impl, p, x):
            return jnp.sum(jnp.square(impl(p, x)))

        g_ref = jax.grad(lambda p, x: loss(lambda p, x: L.conv1d(p, x, padding=k // 2, groups=c), p, x),
                         argnums=(0, 1))(p, x)
        g_new = jax.grad(lambda p, x: loss(lambda p, x: L.depthwise_conv1d(p, x, padding=k // 2), p, x),
                         argnums=(0, 1))(p, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_ref), jax.tree_util.tree_leaves(g_new)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-4)


def test_depthwise_conv1d_asymmetric_length():
    """Non-SAME case: output length t + 2p - k + 1 matches the grouped conv."""
    rng = np.random.RandomState(9)
    k, c, t = 5, 4, 12
    p = {"w": jnp.asarray(rng.randn(k, 1, c).astype(np.float32))}
    x = jnp.asarray(rng.randn(1, t, c).astype(np.float32))
    for pad in (0, 1, 2, 4):
        ref = L.conv1d(p, x, padding=pad, groups=c)
        mine = L.depthwise_conv1d(p, x, padding=pad)
        assert mine.shape == ref.shape
        np.testing.assert_allclose(np.asarray(mine), np.asarray(ref), atol=1e-5)
