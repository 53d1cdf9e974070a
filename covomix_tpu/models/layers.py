"""Shared neural-net building blocks (pure functions over param pytrees).

Conventions:
  * activations are [B, T, D]; attention tensors are [B, H, T, dh]
  * params are nested dicts of jnp arrays (f32); compute dtype is a function arg
  * norms run in float32 for numerical stability regardless of compute dtype

Reference contracts cited per function into /root/reference (PyTorch CoVoMix)."""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# initializers (healthy defaults mirroring torch's fan-in scaling)


def linear_init(key, d_in: int, d_out: int, bias: bool = True, scale: float = 1.0):
    kw, kb = jax.random.split(key)
    bound = scale / math.sqrt(d_in)
    p = {"w": jax.random.uniform(kw, (d_in, d_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (d_out,), jnp.float32, -bound, bound)
    return p


def linear(p, x):
    y = x @ p["w"].astype(x.dtype)
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def embedding_init(key, vocab: int, dim: int):
    return {"w": jax.random.normal(key, (vocab, dim), jnp.float32)}


def embedding(p, ids, dtype=jnp.float32):
    return jnp.take(p["w"].astype(dtype), ids, axis=0)


def conv1d_init(key, c_in: int, c_out: int, kernel: int, groups: int = 1, bias: bool = True):
    """Weights stored [K, C_in/groups, C_out] (lax 'WIO' layout)."""
    kw, kb = jax.random.split(key)
    fan_in = kernel * c_in // groups
    bound = 1.0 / math.sqrt(fan_in)
    p = {"w": jax.random.uniform(kw, (kernel, c_in // groups, c_out), jnp.float32, -bound, bound)}
    if bias:
        p["b"] = jax.random.uniform(kb, (c_out,), jnp.float32, -bound, bound)
    return p


def conv1d(p, x, stride: int = 1, padding="SAME", groups: int = 1, lhs_dilation: int = 1, rhs_dilation: int = 1):
    """x: [B, T, C]. padding: 'SAME' | 'VALID' | int | (lo, hi)."""
    if isinstance(padding, int):
        padding = [(padding, padding)]
    elif isinstance(padding, tuple):
        padding = [padding]
    y = jax.lax.conv_general_dilated(
        x,
        p["w"].astype(x.dtype),
        window_strides=(stride,),
        padding=padding,
        lhs_dilation=(lhs_dilation,),
        rhs_dilation=(rhs_dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


def depthwise_conv1d(p, x, padding: int):
    """Depthwise 1-D conv (groups == channels) as K shifted FMAs.

    Functionally identical to conv1d(p, x, padding=padding, groups=C) with
    'WIO' weights [K, 1, C], but implemented as K statically-sliced
    multiply-adds over the padded input instead of lax.conv_general_dilated.
    Why: XLA:TPU's depthwise-conv WEIGHT GRADIENT lowers to a
    batch-group-count convolution this stack cannot even compile standalone
    ("Expected output feature dimension size (value 1) to be a multiple of
    batch group count 1024", tools/conv_probe.py) and schedules
    pathologically inside the train step — train_probe.py attributes ~30% of
    the acoustic train step to this conv whose FORWARD costs <1% of a flow
    eval. The shift-and-add autodiff is shift-and-add again (dx: correlation
    with the flipped taps; dw: K fused reductions) — pure VPU work XLA fuses
    cleanly. Forward cost is equivalent (both are K*B*T*C VPU FMAs)."""
    k = p["w"].shape[0]
    w = p["w"].astype(x.dtype)                    # [K, 1, C]
    t_out = x.shape[1] + 2 * padding - k + 1
    xp = jnp.pad(x, ((0, 0), (padding, padding), (0, 0)))
    out = xp[:, :t_out] * w[0, 0]
    for kk in range(1, k):
        out = out + jax.lax.dynamic_slice_in_dim(xp, kk, t_out, axis=1) * w[kk, 0]
    if "b" in p:
        out = out + p["b"].astype(x.dtype)
    return out


def conv_transpose1d(p, x, stride: int, padding: int, kernel: int):
    """Torch ConvTranspose1d semantics: out_len = (T-1)*stride - 2*padding + kernel.

    Implemented as an input-dilated convolution with the spatially-flipped kernel,
    which XLA lowers onto the MXU. Weight layout [K, C_in, C_out] where C_in is the
    *input* channel count (i.e. already transposed relative to torch's [in, out, k])."""
    w = jnp.flip(p["w"].astype(x.dtype), axis=0)
    pad = kernel - 1 - padding
    y = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(1,),
        padding=[(pad, pad)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
    )
    if "b" in p:
        y = y + p["b"].astype(x.dtype)
    return y


# ---------------------------------------------------------------------------
# norms


def rmsnorm_init(dim: int):
    return {"gamma": jnp.ones((dim,), jnp.float32)}


def _l2_normalize(xf):
    """x / max(||x||, 1e-12) computed as x * rsqrt(max(||x||^2, 1e-24)):
    identical forward (sqrt is monotone), but the VJP stays finite at x == 0
    (sqrt'(0) = inf would otherwise turn zero cotangents into NaN — hit by
    pipeline-parallel bubble ticks that run on zero-filled activations)."""
    sq = jnp.sum(xf * xf, axis=-1, keepdims=True)
    return xf * jax.lax.rsqrt(jnp.maximum(sq, 1e-24))


def rmsnorm(p, x):
    """F.normalize(x, dim=-1) * sqrt(d) * gamma (acoustic.py:165-175)."""
    xf = x.astype(jnp.float32)
    normed = _l2_normalize(xf) * math.sqrt(x.shape[-1])
    return (normed * p["gamma"]).astype(x.dtype)


def adaptive_rmsnorm_init(key, dim: int, cond_dim: int):
    """Init to identity: gamma weight 0 / bias 1, beta 0/0 (acoustic.py:190-196)."""
    return {
        "to_gamma": {"w": jnp.zeros((cond_dim, dim), jnp.float32), "b": jnp.ones((dim,), jnp.float32)},
        "to_beta": {"w": jnp.zeros((cond_dim, dim), jnp.float32), "b": jnp.zeros((dim,), jnp.float32)},
    }


def adaptive_rmsnorm(p, x, cond):
    """cond: [B, cond_dim] -> per-example scale/shift (acoustic.py:198-204)."""
    xf = x.astype(jnp.float32)
    normed = _l2_normalize(xf) * math.sqrt(x.shape[-1])
    gamma = linear(p["to_gamma"], cond.astype(jnp.float32))[:, None, :]
    beta = linear(p["to_beta"], cond.astype(jnp.float32))[:, None, :]
    return (normed * gamma + beta).astype(x.dtype)


def layernorm_init(dim: int):
    return {"gamma": jnp.ones((dim,), jnp.float32), "beta": jnp.zeros((dim,), jnp.float32)}


def layernorm(p, x, eps: float = 1e-5):
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["gamma"] + p["beta"]).astype(x.dtype)


def groupnorm(p, x, num_groups: int, eps: float = 1e-5, length_mask=None):
    """x: [B, T, C]; affine per channel (fairseq Fp32GroupNorm).

    The stats reduce over TIME (num_groups == C is per-channel instance
    norm), so padded timesteps would shift every valid frame's statistics.
    `length_mask` [B, T] bool restricts the stats to valid timesteps, making
    padded/bucketed extraction exactly equal to exact-length extraction
    (the reference extracts per file at exact length,
    get_fisher_semantic_tokens_parallel.py:21-61)."""
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, num_groups, c // num_groups)
    if length_mask is None:
        mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
        var = jnp.var(xf, axis=(1, 3), keepdims=True)
    else:
        m = length_mask[:, :, None, None].astype(jnp.float32)
        count = jnp.maximum(jnp.sum(m, axis=(1, 3), keepdims=True), 1.0) * (c // num_groups)
        mean = jnp.sum(xf * m, axis=(1, 3), keepdims=True) / count
        var = jnp.sum(jnp.square(xf - mean) * m, axis=(1, 3), keepdims=True) / count
    y = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, t, c)
    return (y * p["gamma"] + p["beta"]).astype(x.dtype)


# ---------------------------------------------------------------------------
# rotary embeddings — two conventions coexist in the reference:
#  * acoustic.py:116-137: "half-split" rotation (chunk into two halves)
#  * rotary_embedding_torch.py:36-49: "interleaved" pair rotation


def rotary_freqs(dim_head: int, theta: float = 10000.0) -> jnp.ndarray:
    return 1.0 / (theta ** (jnp.arange(0, dim_head, 2, dtype=jnp.float32) / dim_head))


def rotary_halfsplit(positions: jnp.ndarray, inv_freq: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Acoustic-model rotary: freqs = cat((p*f, p*f)); rotate_half = split-in-two.
    positions [T]; t [..., T, dh]."""
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)  # [T, dh]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    d = t.shape[-1] // 2
    t1, t2 = t[..., :d], t[..., d:]
    rot = jnp.concatenate([-t2, t1], axis=-1)
    return (t * cos.astype(t.dtype) + rot * sin.astype(t.dtype)).astype(t.dtype)


def rotary_interleaved(positions: jnp.ndarray, inv_freq: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """lucidrains rotary: freqs repeated pairwise; rotate_half swaps (x0,x1)->(-x1,x0).
    positions [T]; t [..., T, dh]."""
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]  # [T, dh/2]
    freqs = jnp.repeat(freqs, 2, axis=-1)  # [T, dh], pattern f0 f0 f1 f1 ...
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    shape = t.shape
    tp = t.reshape(shape[:-1] + (shape[-1] // 2, 2))
    rot = jnp.stack([-tp[..., 1], tp[..., 0]], axis=-1).reshape(shape)
    return (t * cos.astype(t.dtype) + rot * sin.astype(t.dtype)).astype(t.dtype)


# ---------------------------------------------------------------------------
# attention


def attend(q, k, v, *, key_mask: Optional[jnp.ndarray] = None, causal: bool = False, q_offset=None):
    """Scaled dot-product attention.

    q [B,H,Tq,dh], k/v [B,H,Tk,dh]; key_mask [B,Tk] True=attend; causal applies
    lower-triangular masking with queries placed at the *end* of the key axis
    unless q_offset is given (attend_t2s.py:69-109 cached-decode semantics).
    Softmax runs in f32; the matmuls stay in the input dtype for the MXU."""
    scale = q.shape[-1] ** -0.5
    sim = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    tq, tk = q.shape[-2], k.shape[-2]
    if key_mask is not None:
        sim = jnp.where(key_mask[:, None, None, :], sim, -jnp.inf)
    if causal:
        off = (tk - tq) if q_offset is None else q_offset
        qpos = jnp.arange(tq) + off
        kpos = jnp.arange(tk)
        cmask = kpos[None, :] <= qpos[:, None]
        sim = jnp.where(cmask[None, None], sim, -jnp.inf)
    attn = jax.nn.softmax(sim, axis=-1)
    # fully-masked rows (can happen with padded batches) -> zeros, not NaN
    attn = jnp.where(jnp.isnan(attn), 0.0, attn)
    return jnp.einsum("bhij,bhjd->bhid", attn.astype(v.dtype), v)


def split_heads(x, heads: int):
    b, t, _ = x.shape
    return x.reshape(b, t, heads, -1).transpose(0, 2, 1, 3)


def merge_heads(x):
    b, h, t, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * d)


# ---------------------------------------------------------------------------
# activations


def gelu(x):
    """GELU with dtype-adaptive fidelity.

    Exact erf for f32+ compute (the torch nn.GELU default every parity budget
    is checked against); tanh approximation for sub-f32 compute dtypes. Under
    bf16 the erf/tanh difference (max ~4.7e-4 absolute around |x|~2.7) is
    BELOW bf16's own rounding (eps 7.8e-3),
    while the exact-erf chain costs a measured ~12-15% of the whole acoustic
    flow-stage field eval on v5e (tools/flow_probe.py 2026-08-19: tanh /
    sigmoid / identity activations land within noise of each other; only the
    erf path is slow). For low-precision compute the approximation is
    numerically free and measurably faster; f32 behavior is unchanged."""
    return jax.nn.gelu(x, approximate=jnp.dtype(x.dtype).itemsize < 4)


def geglu(x):
    """GEGLU (text2semantic.py:154-157): chunk last dim, gelu(gate) * x."""
    a, gate = jnp.split(x, 2, axis=-1)
    return gelu(gate) * a


def leaky_relu(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, x * slope)
