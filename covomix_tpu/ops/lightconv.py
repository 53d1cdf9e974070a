"""Lightweight and dynamic convolutions (Wu et al. 2019), TPU-native.

Capability equivalents of the reference fork's CUDA/C++ kernels
(fairseq/modules/lightconv_layer/lightconv_cuda*.cu and
fairseq/modules/dynamicconv_layer/dynamicconv_cuda*.cu, SURVEY §2.5) — unused
by CoVoMix itself, provided so the framework covers the reference's native
surface. The CUDA kernels exist because torch's grouped conv was slow for
tiny per-head kernels; on TPU the same math lowers cleanly through XLA:

  * light_conv: a depthwise conv whose kernel is shared across each of H head
    groups and softmax-normalized over taps
    (fairseq/modules/lightweight_convolution.py:63-135 semantics) —
    one `lax.conv_general_dilated` with the head kernel repeated per channel.
  * dynamic_conv: per-position kernels predicted from the input
    (fairseq/modules/dynamicconv_layer semantics) — a banded contraction,
    expressed as a K-tap window stack + einsum (fuses on the MXU/VPU; no
    gather/scatter).

Both use fairseq's `padding_l` convention (causal: padding_l = K - 1)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def light_conv(x: jnp.ndarray, weights: jnp.ndarray, *, padding_l: int,
               softmax: bool = True) -> jnp.ndarray:
    """x [B, T, C]; weights [H, K] with H | C. Returns [B, T, C].

    Channel c is convolved with the (optionally softmaxed) kernel of head
    c // (C/H); taps are indexed so out[t] = sum_k w[k] * x[t - padding_l + k]."""
    b, t, c = x.shape
    h, k = weights.shape
    assert c % h == 0, (c, h)
    w = jax.nn.softmax(weights.astype(jnp.float32), axis=-1) if softmax else weights
    # depthwise kernel [K, 1, C]: repeat each head's taps over its channels
    kern = jnp.repeat(w.T[:, None, :], c // h, axis=2).astype(x.dtype)  # [K, 1, C]
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1,), padding=[(padding_l, k - 1 - padding_l)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c)


def dynamic_conv(x: jnp.ndarray, dyn_weights: jnp.ndarray, *, padding_l: int,
                 softmax: bool = True) -> jnp.ndarray:
    """x [B, T, C]; dyn_weights [B, T, H, K] (per-position kernels, usually a
    linear projection of x). Returns [B, T, C].

    out[b,t,c] = sum_k w[b,t,head(c),k] * x[b, t - padding_l + k, c]."""
    b, t, c = x.shape
    _, _, h, k = dyn_weights.shape
    assert c % h == 0, (c, h)
    w = jax.nn.softmax(dyn_weights.astype(jnp.float32), axis=-1) if softmax else dyn_weights
    xp = jnp.pad(x, ((0, 0), (padding_l, k - 1 - padding_l), (0, 0)))
    windows = jnp.stack([xp[:, i : i + t] for i in range(k)], axis=2)   # [B, T, K, C]
    win = windows.reshape(b, t, k, h, c // h)
    out = jnp.einsum("bthk,btkhg->bthg", w.astype(x.dtype), win.astype(x.dtype))
    return out.reshape(b, t, c)
