"""light_conv / dynamic_conv vs an independent torch formulation
(fairseq lightconv/dynamicconv CUDA-kernel semantics, SURVEY §2.5)."""

import numpy as np
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F

from covomix_tpu.ops.lightconv import dynamic_conv, light_conv


def _torch_light(x, w, padding_l, softmax):
    # x [B, T, C], w [H, K] -> F.conv1d depthwise with repeated softmaxed taps
    b, t, c = x.shape
    h, k = w.shape
    wt = torch.softmax(w, -1) if softmax else w
    kern = wt.repeat_interleave(c // h, dim=0).unsqueeze(1)  # [C, 1, K]
    xp = F.pad(x.transpose(1, 2), (padding_l, k - 1 - padding_l))
    return F.conv1d(xp, kern, groups=c).transpose(1, 2)


def _torch_dynamic(x, w, padding_l, softmax):
    b, t, c = x.shape
    _, _, h, k = w.shape
    wt = torch.softmax(w, -1) if softmax else w
    xp = F.pad(x, (0, 0, padding_l, k - 1 - padding_l))
    out = torch.zeros_like(x)
    ch = c // h
    for kk in range(k):
        seg = xp[:, kk : kk + t].reshape(b, t, h, ch)
        out += (wt[..., kk].unsqueeze(-1) * seg).reshape(b, t, c)
    return out


@pytest.mark.parametrize("softmax", [True, False])
@pytest.mark.parametrize("padding_l", [3, 1])  # causal (K-1) and mid
def test_light_conv_matches_torch(softmax, padding_l):
    rng = np.random.RandomState(0)
    x = rng.randn(2, 10, 8).astype(np.float32)
    w = rng.randn(2, 4).astype(np.float32)
    ref = _torch_light(torch.from_numpy(x), torch.from_numpy(w), padding_l, softmax).numpy()
    got = np.asarray(light_conv(jnp.asarray(x), jnp.asarray(w), padding_l=padding_l, softmax=softmax))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("softmax", [True, False])
def test_dynamic_conv_matches_torch(softmax):
    rng = np.random.RandomState(1)
    b, t, c, h, k = 2, 9, 8, 4, 3
    x = rng.randn(b, t, c).astype(np.float32)
    w = rng.randn(b, t, h, k).astype(np.float32)
    ref = _torch_dynamic(torch.from_numpy(x), torch.from_numpy(w), k - 1, softmax).numpy()
    got = np.asarray(dynamic_conv(jnp.asarray(x), jnp.asarray(w), padding_l=k - 1, softmax=softmax))
    np.testing.assert_allclose(got, ref, atol=1e-5)


def test_light_conv_causal_does_not_see_future():
    rng = np.random.RandomState(2)
    x = rng.randn(1, 8, 4).astype(np.float32)
    w = rng.randn(1, 3).astype(np.float32)
    y1 = np.asarray(light_conv(jnp.asarray(x), jnp.asarray(w), padding_l=2))
    x2 = x.copy()
    x2[:, 5:] += 100.0   # perturb the future
    y2 = np.asarray(light_conv(jnp.asarray(x2), jnp.asarray(w), padding_l=2))
    np.testing.assert_allclose(y1[:, :5], y2[:, :5], atol=1e-6)
