"""Pallas TPU flash attention for the acoustic transformer.

The acoustic flow-matching model attends over full mel sequences (up to ~2k
frames x 64 NFE per sample); materializing [B,H,T,T] similarity matrices in
HBM is the dominant memory cost of the sampler. This kernel computes
softmax(QK^T)V blockwise in VMEM with the standard online-softmax recurrence:
running max m, running denominator l, rescaled accumulator acc — one pass over
K/V blocks per Q block, no [T,T] intermediate.

MXU discipline (measured on v5e through this tunnel): the dots run in the
INPUT dtype (bf16 on the serving path) with f32 accumulation — upcasting
q/k/v to f32 first quarters the MXU rate; and each kernel instance batches
`head_block` heads per dot_general so the 64-wide head-dim contraction
pipelines better (dh=64 is half the 128-lane MXU; batching heads recovers
issue-level parallelism: 11.9 -> 16.8 TFLOP/s at the VoMix serving shape).

Non-causal; padding tails are masked inside the kernel via the static
valid_len. Falls back to the XLA einsum path off-TPU, for masked/causal
attention, or for shapes that don't tile (covomix_tpu.models.layers.attend)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Measured on v5e at the VoMix serving shape (B=8 CFG-doubled, H=16, T=912,
# dh=64, bf16): 21.1 TFLOP/s at 1024/512/hb=2 with the dynamic valid_len
# mask (within noise of 1024/1024 and of the fully-static kernel's 20.8 on
# the same day — single-dispatch tunnel timings wander a few TFLOP/s).
# The K-block loop is UNROLLED at trace time: a lax.fori_loop body costs
# ~17 TFLOP/s (loop-carried acc defeats Mosaic's cross-block scheduling),
# and instantiating two bodies (masked + unmasked) overflows the 16 MB
# scoped-VMEM stack at 1024-wide blocks. block_k=512 keeps the f32 [hb, bq,
# bk] softmax block at 4 MB. jax's built-in pallas flash kernel measured
# 22.7 on this shape (same-day basis as the old 24.4); the XLA einsum path
# runs 13.3.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 512
DEFAULT_HEAD_BLOCK = 2


def _flash_kernel(valid_ref, q_ref, k_ref, v_ref, o_ref, *, block_k: int, kv_len: int,
                  scale: float):
    # valid_ref: SMEM scalar-prefetch [1] int32 — keys >= valid_len are
    # padding and masked out (dynamic, so bucketed serving reuses ONE
    # compiled kernel across true lengths). q_ref [1, hb, block_q, dh];
    # k_ref/v_ref [1, hb, kv_len, dh]; o_ref [1, hb, block_q, dh].
    _, hb, block_q, dh = q_ref.shape
    q = q_ref[0]
    valid_len = valid_ref[0]

    num_kb = kv_len // block_k
    # The K-block loop is UNROLLED (python range) — a lax.fori_loop runs
    # ~17 vs ~21 TFLOP/s (the loop-carried accumulator defeats Mosaic's
    # cross-block software pipelining), and instantiating separate
    # masked/unmasked loop bodies overflows the 16 MB scoped-VMEM stack at
    # 1024-wide blocks. Masking is applied to p AFTER the exp (not -inf on
    # s): columns >= valid_len contribute 0 to both the accumulator and the
    # denominator, while m_new may include garbage key scores — harmless,
    # any common max >= the true max leaves softmax exact. This also makes
    # fully-masked blocks well-defined (no -inf - -inf NaN path).
    def step(kb, carry):
        acc, m, l = carry
        k = k_ref[0, :, pl.ds(kb * block_k, block_k), :]
        # batched-over-heads [hb, bq, dh] x [hb, bk, dh]^T -> [hb, bq, bk] f32
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32) * scale
        v = v_ref[0, :, pl.ds(kb * block_k, block_k), :]
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_k), 2)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.where(cols < valid_len, jnp.exp(s - m_new), 0.0)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    carry = (jnp.zeros((hb, block_q, dh), jnp.float32),
             jnp.full((hb, block_q, 1), -jnp.inf, jnp.float32),
             jnp.zeros((hb, block_q, 1), jnp.float32))
    for kb in range(num_kb):
        carry = step(kb, carry)
    acc, m, l = carry
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    *, valid_len=None,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    head_block: int = DEFAULT_HEAD_BLOCK,
                    interpret: bool = False) -> jnp.ndarray:
    """q/k/v: [B, H, T, dh] -> [B, H, T, dh]. Arbitrary T: inputs are padded to
    a block multiple and padded key columns are masked inside the kernel.

    `valid_len` (int or traced scalar, default T): keys at positions
    >= valid_len are excluded — the prefix-mask contract of bucket-padded
    serving (pipeline.flow_sample). It is a scalar-prefetch operand, so one
    compiled kernel serves every true length within a bucket. Rows beyond
    valid_len still attend the valid prefix (garbage-in garbage-out; callers
    trim), so valid rows match exact-length attention.

    Differentiable: the backward pass recomputes attention via the XLA
    einsum path (custom_vjp) — the training-time memory/computation profile
    the reference has (torch SDPA training materializes probabilities in
    backward too), while the forward keeps the flash kernel's speed. The
    acoustic training crop (800-1600 frames) hits this path on TPU."""
    b, h, t, dh = q.shape
    if valid_len is None:
        valid_len = t
    valid_arr = jnp.asarray(valid_len, jnp.int32).reshape(1)
    cfg = (block_q, block_k, head_block, interpret)
    return _flash_core(cfg, valid_arr, q, k, v)


def _flash_forward(cfg, valid_arr, q, k, v):
    block_q, block_k, head_block, interpret = cfg
    b, h, t, dh = q.shape
    if q.dtype.itemsize >= 4:
        # f32 q/k/v doubles the VMEM footprint of the in-kernel blocks; the
        # 16 MB scoped-vmem limit fits 1024-wide blocks only for <=2-byte
        # dtypes (bf16 serving path)
        block_q, block_k = min(block_q, 512), min(block_k, 512)
    block_q = min(block_q, _round_up(t, 128))
    block_k = min(block_k, _round_up(t, 128))
    while h % head_block:
        head_block -= 1
    tp = _round_up(t, max(block_q, block_k))
    if tp != t:
        pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    scale = dh ** -0.5

    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=tp, scale=scale)
    grid = (b, h // head_block, tp // block_q)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dh), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, head_block, block_q, dh), lambda bb, hh, i, *_: (bb, hh, i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, head_block, tp, dh), lambda bb, hh, i, *_: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, head_block, tp, dh), lambda bb, hh, i, *_: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, head_block, block_q, dh), lambda bb, hh, i, *_: (bb, hh, i, 0), memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * tp * dh,
            bytes_accessed=(3 * b * h * tp * dh + b * h * tp * dh) * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(valid_arr, q, k, v)
    return out[:, :, :t] if tp != t else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(cfg, valid_arr, q, k, v):
    return _flash_forward(cfg, valid_arr, q, k, v)


def _flash_core_fwd(cfg, valid_arr, q, k, v):
    return _flash_forward(cfg, valid_arr, q, k, v), (valid_arr, q, k, v)


def _flash_core_bwd(cfg, res, g):
    from covomix_tpu.models.layers import attend

    valid_arr, q, k, v = res
    t = q.shape[-2]
    key_mask = jnp.broadcast_to(jnp.arange(t)[None, :] < valid_arr[0], (q.shape[0], t))

    def f(q, k, v):
        return attend(q, k, v, key_mask=key_mask)

    _, vjp = jax.vjp(f, q, k, v)
    dq, dk, dv = vjp(g)
    import numpy as _np

    return _np.zeros(valid_arr.shape, jax.dtypes.float0), dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def attend_flash_or_xla(q, k, v, *, key_mask=None, valid_len=None, causal=False,
                        min_seq_for_flash: int = 512):
    """Dispatch: dense non-causal attention on TPU with T >= threshold and
    tileable shapes goes through the Pallas kernel — including prefix-masked
    bucket padding expressed as `valid_len` (scalar; the production serving
    path). Arbitrary boolean `key_mask`, causal, small-T, and non-TPU cases
    use the XLA einsum path."""
    from covomix_tpu.models.layers import attend

    t = q.shape[-2]
    on_tpu = jax.devices()[0].platform == "tpu"
    if (key_mask is None and not causal and on_tpu and t >= min_seq_for_flash
            and q.shape[-1] <= 256):
        return flash_attention(q, k, v, valid_len=valid_len)
    if key_mask is None and valid_len is not None:
        key_mask = jnp.arange(t)[None, :] < jnp.asarray(valid_len).reshape(-1)[:, None]
        key_mask = jnp.broadcast_to(key_mask, (q.shape[0], t))
    return attend(q, k, v, key_mask=key_mask, causal=causal)
