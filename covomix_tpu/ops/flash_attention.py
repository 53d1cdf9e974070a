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
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from covomix_tpu.util.misc import round_up

# Defaults apply only when the padded row does NOT fit a single K block;
# _resolve_blocks prefers the ONE-SHOT structure (block_k == padded T, no
# online-softmax carry) up to tp=2048, measured fastest at the serving and
# training shapes: 17.2 vs 14.7 TFLOP/s same-day at VoMix T=912
# (tools/attn_opt.py, v5e 2026-08-19 — absolute numbers wander a few TFLOP/s
# day to day through the tunnel; the ~17% structural gap is stable). On the
# multi-block path the K-block loop is UNROLLED at trace time (a
# lax.fori_loop body defeats Mosaic's cross-block scheduling) with scale
# folded into q and pre-exp masking (+12%); two 1024-wide unrolled bodies
# overflow the 16 MB scoped-VMEM stack, hence block_k=512. jax's built-in
# pallas flash kernel measured 22.7 TFLOP/s on an earlier (faster-tunnel)
# day vs 21.1 for this kernel's multi-block path; the XLA einsum path 13.3.
DEFAULT_BLOCK_Q = 1024
DEFAULT_BLOCK_K = 512
DEFAULT_HEAD_BLOCK = 2

# K/Q-block loops unroll fully up to this many blocks (best Mosaic
# scheduling, ~21 vs ~17 TFLOP/s); beyond it they run as a fori_loop over
# unrolled pairs — full unrolling at 4+ blocks interleaves enough f32
# [hb, bq, bk] temporaries to overflow the 16 MB scoped-VMEM stack
# (23.9 MB at tp=2048 in the backward).
MAX_UNROLL = 2


def _blocked_loop(num_blocks: int, body, carry):
    if num_blocks <= MAX_UNROLL:
        for i in range(num_blocks):
            carry = body(i, carry)
        return carry
    main = (num_blocks // MAX_UNROLL) * MAX_UNROLL

    def chunk(ci, c):
        for j in range(MAX_UNROLL):
            c = body(ci * MAX_UNROLL + j, c)
        return c

    carry = jax.lax.fori_loop(0, num_blocks // MAX_UNROLL, chunk, carry)
    for i in range(main, num_blocks):
        carry = body(i, carry)
    return carry


def _read_valid(valid_ref):
    """valid_ref: SMEM scalar-prefetch int32 of shape [1] (one length for the
    whole batch — bucketed serving) or [B] (one per row — batched serving with
    heterogeneous decode lengths; grid dim 0 is the batch)."""
    if valid_ref.shape[0] == 1:
        return valid_ref[0]
    return valid_ref[pl.program_id(0)]


def _fold_scale(q, scale: float):
    """Fold the softmax scale into q when that is EXACT (scale a power of two
    — dh 64 gives 0.125: a pure exponent shift in any float dtype). Kills one
    full [hb, bq, bk] VPU pass per K block (s * scale). Returns
    (q, remaining_scale)."""
    frac = math.log2(scale)
    if frac == round(frac):
        return q * jnp.asarray(scale, q.dtype), 1.0
    return q, scale


# --------------------------------------------------------------------------
# in-kernel rotary (halfsplit convention, acoustic.py:116-137): the separate
# rotary pass over [B, H, T, 64] q and k is pure HBM glue — dh=64 tensors are
# lane-padded 2x in HBM, and applying tables costs several full passes each.
# Measured at the B=64 serving shape (b2=128, T=912, v5e 2026-08-19,
# tools/attn_fuse_probe.py): attention block 42.1 ms/layer with external
# rotary, 30.8 with rotary removed, 32.9 with rotary FUSED into the one-shot
# kernel — and precomputed-table external rotary gains nothing (42.0: XLA
# already hoists table building; the passes are the cost). Fused output is
# BIT-IDENTICAL to layers.rotary_halfsplit + kernel (the production rotary
# multiplies in t.dtype with t.dtype tables — same op sequence).
#
# Mechanics: rotate-half can't be sliced in-kernel (Mosaic rejects both
# x[:, d:] and pltpu.roll on the 64-wide lane dim — remote-compile exit 1),
# so it runs as x @ P with P the [dh, dh] cyclic-shift permutation: native
# MXU work, ~rows*dh^2 FLOPs = noise next to the attention dots, and exact
# (f32 accumulate of a 0/1 matrix). The rotate-half SIGN is folded into the
# sin table (rotary_tables_halfsplit), so rotary(x) = x*cos + (x@P)*sin_s.


def rotary_tables_halfsplit(positions, inv_freq, dtype):
    """[T, dh] (cos, sin_signed) tables for halfsplit rotary at `dtype`.
    sin_signed carries the rotate-half sign (first half negated) so the
    in-kernel rotate is a pure roll: rotary(x) = x*cos + roll(x, d)*sin_s.
    Bit-identical inputs to layers.rotary_halfsplit's cos/sin (same f32
    freqs, cast to compute dtype)."""
    freqs = positions[:, None].astype(jnp.float32) * inv_freq[None, :]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)       # [T, dh]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    d = sin.shape[-1] // 2
    sin_signed = jnp.concatenate([-sin[:, :d], sin[:, d:]], axis=-1)
    return cos.astype(dtype), sin_signed.astype(dtype)


def _roll_matrix(n, dtype):
    """[n, n] permutation with (x @ P)[j] = x[(j - n//2) mod n]."""
    d = n // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((row == col - d) | (row == col + d)).astype(dtype)


def _rot_apply(x, cos, sin_signed):
    """In-kernel halfsplit rotary: x [rows, dh]; tables [rows, dh]."""
    perm = _roll_matrix(x.shape[-1], x.dtype)
    rolled = jax.lax.dot_general(x, perm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(x.dtype)
    return x * cos + rolled * sin_signed


def _rotary_xla(x, cos, sin_signed):
    """XLA-side halfsplit rotary with SIGNED sin tables — the same math as
    layers.rotary_halfsplit (bit-identical: same dtype op sequence). x
    [..., T, dh]; tables [T, dh]."""
    d = x.shape[-1] // 2
    rolled = jnp.concatenate([x[..., d:], x[..., :d]], axis=-1)
    return x * cos + rolled * sin_signed


def _rotary_xla_transpose(g, cos, sin_signed):
    """Exact VJP of _rotary_xla in x: dx = g*cos + roll(g*sin_s, d) — the
    roll-by-half is an involution, so the transpose is the same roll."""
    z = g * sin_signed
    d = g.shape[-1] // 2
    return g * cos + jnp.concatenate([z[..., d:], z[..., :d]], axis=-1)


def _flash_kernel(valid_ref, *refs, block_k: int, kv_len: int,
                  scale: float, causal: bool = False, fused_rotary: bool = False):
    # valid_ref: SMEM scalar-prefetch [1] or [B] int32 — keys >= valid_len
    # are padding and masked out (dynamic, so bucketed serving reuses ONE
    # compiled kernel across true lengths). q_ref [1, hb, block_q, dh];
    # k_ref/v_ref [1, hb, kv_len, dh]; o_ref [1, hb, block_q, dh].
    # Optional lse_ref [1, hb, block_q]: per-row logsumexp (m + log l),
    # saved for the training backward pass.
    # causal (static): additionally mask key j > query i (tq == tk
    # self-attention indexing — the T2S training decoder, attend_t2s.py
    # semantics at q_offset 0). Row 0 always has key 0 live, so no row is
    # ever fully masked.
    # fused_rotary (static): 4 extra leading refs — cq/sq [block_q, dh] and
    # ck/sk [kv_len, dh] halfsplit tables (rotary_tables_halfsplit) applied
    # to q and k in-kernel. ONE-SHOT path only.
    if fused_rotary:
        cq_ref, sq_ref, ck_ref, sk_ref = refs[:4]
        refs = refs[4:]
    q_ref, k_ref, v_ref, o_ref, *lse_ref = refs
    _, hb, block_q, dh = q_ref.shape
    q, scale = _fold_scale(q_ref[0], scale)
    valid_len = _read_valid(valid_ref)
    row_ids = (pl.program_id(2) * block_q
               + jax.lax.broadcasted_iota(jnp.int32, (1, block_q, 1), 1))

    num_kb = kv_len // block_k
    assert not (fused_rotary and num_kb != 1), "fused rotary is one-shot-path only"

    if num_kb == 1:
        # ONE-SHOT path: the whole key row fits one block (serving/training
        # T <= ~2k after padding — see _resolve_blocks), so the online-softmax
        # carry (running m/l, alpha-rescales of acc) is pure overhead. Direct
        # softmax is ~17% faster than the 2-block online kernel at the VoMix
        # serving shape (tools/attn_opt.py, v5e 2026-08-19: 17.2 vs 14.7
        # TFLOP/s). Masking is pre-exp (s -> -1e30): exp then yields exact 0s;
        # a fully-masked row would softmax uniformly instead of to zeros, but
        # valid_len >= 1 always holds on the serving paths and rows past
        # valid_len are garbage-by-contract anyway (callers trim).
        #
        # The heads in the block are UNROLLED as independent 2-D dot/softmax
        # chains rather than one hb-batched 3-D dot: the chains have no data
        # dependence, so Mosaic's scheduler overlaps head i's softmax (VPU)
        # with head i+1's dots (MXU) — the batched dot serializes MXU and VPU
        # phases. Measured at the B=64 serving shape (b2=128, T=1024, v5e
        # 2026-08-19, tools/attn_ctx_probe.py): 55.2 TFLOP/s unrolled
        # (bq=512, hb=4) vs 47.8 for the batched one-shot at the old
        # (bq=256, hb=2) default — bit-identical outputs.
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (1, block_k), 1)
        live2 = cols2 < valid_len
        if causal:
            live2 = live2 & (cols2 <= row_ids[0])  # [bq, 1] x [1, bk]
        if fused_rotary:
            cq, sq = cq_ref[...], sq_ref[...]
            ck, sk = ck_ref[...], sk_ref[...]
        for hh in range(hb):
            qh = q[hh]
            kh = k_ref[0, hh]
            if fused_rotary:
                qh = _rot_apply(qh, cq, sq)
                kh = _rot_apply(kh, ck, sk)
            s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if scale != 1.0:
                s = s * scale
            s = jnp.where(live2, s, -1e30)
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0, hh],
                                      (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            o_ref[0, hh] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            if lse_ref:
                lse_ref[0][0, hh] = m + jnp.log(jnp.maximum(l, 1e-30))
        return

    # The K-block loop unrolls via _blocked_loop (see MAX_UNROLL — full
    # unrolling beats fori_loop ~21 vs ~17 TFLOP/s but overflows VMEM past 2
    # blocks). Masking is pre-exp (s -> -1e30, NOT -inf: keeps the
    # fully-masked-block path NaN-free — exp(-1e30 - m) underflows to an
    # exact 0 contribution to both acc and l), which saves the separate
    # post-exp where pass (+12% with the scale fold, tools/attn_opt.py).
    def step(kb, carry):
        acc, m, l = carry
        k = k_ref[0, :, pl.ds(kb * block_k, block_k), :]
        # batched-over-heads [hb, bq, dh] x [hb, bk, dh]^T -> [hb, bq, bk] f32
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if scale != 1.0:
            s = s * scale
        v = v_ref[0, :, pl.ds(kb * block_k, block_k), :]
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_k), 2)
        live = cols < valid_len
        if causal:
            live = live & (cols <= row_ids)
        s = jnp.where(live, s, -1e30)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        return acc_new, m_new, l_new

    carry = (jnp.zeros((hb, block_q, dh), jnp.float32),
             jnp.full((hb, block_q, 1), -1e30, jnp.float32),
             jnp.zeros((hb, block_q, 1), jnp.float32))
    acc, m, l = _blocked_loop(num_kb, step, carry)
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if lse_ref:
        # lse stored [1, hb, block_q, 1] (trailing singleton keeps the block
        # shape on the (8, 128)-tileable path: lane dim == full array dim)
        lse_ref[0][0] = m + jnp.log(jnp.maximum(l, 1e-30))


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    *, valid_len=None, causal: bool = False, rotary=None,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    head_block: int = DEFAULT_HEAD_BLOCK,
                    interpret: bool = False) -> jnp.ndarray:
    """q/k/v: [B, H, T, dh] -> [B, H, T, dh]. Arbitrary T: inputs are padded to
    a block multiple and padded key columns are masked inside the kernel.

    `valid_len` (int / traced scalar / [B] int array, default T): keys at
    positions >= valid_len are excluded — the prefix-mask contract of
    bucket-padded serving (pipeline.flow_sample: one scalar per bucket;
    serving.BatchedPipeline: one length PER ROW for heterogeneous decode
    lengths). It is a scalar-prefetch operand, so one compiled kernel serves
    every true length within a bucket. Rows beyond valid_len still attend the
    valid prefix (garbage-in garbage-out; callers trim), so valid rows match
    exact-length attention.

    Differentiable: the backward runs dedicated Pallas dQ and dK/dV kernels
    that re-materialize probabilities blockwise from the forward's saved
    per-row logsumexp — no [T, T] matrix ever lands in HBM in either pass
    (the einsum path's f32 probability matrix is e.g. 327 MB per layer at
    the acoustic recipe crop). The acoustic training crop (800-1600 frames)
    hits this path on TPU.

    `rotary`: optional (cos, sin_signed) [>=T, dh] halfsplit tables
    (rotary_tables_halfsplit) applied to q and k INSIDE the kernel —
    bit-identical to layers.rotary_halfsplit applied outside, but skips the
    separate HBM passes over the lane-padded [B, H, T, 64] tensors (attention
    block 42.1 -> 32.9 ms/layer at the B=64 serving shape). One-shot kernel
    path only: callers must guard with one_shot_tp() (attend_flash_or_xla
    does) or the tables fall back to an XLA pre-apply."""
    b, h, t, dh = q.shape
    if valid_len is None:
        valid_len = t
    # Clamp to >= 1: the kernels mask pre-exp (s -> -1e30), so valid_len == 0
    # would softmax UNIFORMLY over garbage keys instead of producing zeros —
    # silently-plausible output on a caller bug. With the clamp a degenerate
    # row attends key 0 only (still garbage-by-contract, but defined).
    valid_arr = jnp.maximum(jnp.asarray(valid_len, jnp.int32).reshape(-1), 1)
    assert valid_arr.shape[0] in (1, b), f"valid_len must be scalar or [B]; got {valid_arr.shape}"
    if causal:
        assert q.shape[-2] == k.shape[-2], "causal flash requires tq == tk (training self-attention)"
    cfg = (block_q, block_k, head_block, interpret, causal)
    if rotary is not None:
        cos, sin = (r.astype(q.dtype) for r in rotary)
        assert cos.shape[-1] == dh and cos.shape[0] >= t, \
            f"rotary tables must be [>=T, dh]; got {cos.shape} for T={t}, dh={dh}"
        if cfg[:3] != (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, DEFAULT_HEAD_BLOCK) \
                or one_shot_tp(t, q.dtype) is None:
            # multi-block shape (or explicit block override): fused rotary
            # unsupported; pre-apply in XLA (bit-identical math — _rotary_xla)
            q = _rotary_xla(q, cos[:t], sin[:t])
            k = _rotary_xla(k, cos[:t], sin[:t])
        else:
            return _flash_core_rot(cfg, valid_arr, cos, sin, q, k, v)
    return _flash_core(cfg, valid_arr, q, k, v)


def one_shot_tp(t: int, dtype):
    """Padded length tp if (t, dtype) resolves to the ONE-SHOT kernel
    structure under default blocks (see _resolve_blocks), else None. The
    fused-rotary path and dispatch decisions key off this."""
    tp1 = round_up(t, 128)
    if tp1 <= (2048 if jnp.dtype(dtype).itemsize <= 2 else 1024):
        return tp1
    return None


def _resolve_blocks(cfg, t, h, dtype):
    """Returns (block_q, block_k, head_block, interpret, tp) with the padded
    length tp a multiple of BOTH block sizes. The divisibility is load-bearing:
    the kernels' block loops compute num_blocks = tp // block, which FLOORS —
    if the smaller block did not divide tp (e.g. t=600 -> block_q=640,
    block_k=512, tp=640), the tail key columns would silently never be
    attended (0.28 max-abs error vs einsum, found by review r3)."""
    block_q, block_k, head_block, interpret = cfg[:4]
    if cfg[:3] == (DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, DEFAULT_HEAD_BLOCK):
        # DEFAULT config + the whole key row fits one block: take the
        # ONE-SHOT kernel path (no online-softmax carry), the fastest
        # structure measured at the serving/training shapes — 17.2 vs 14.7
        # TFLOP/s at VoMix T=912 (tools/attn_opt.py, v5e 2026-08-19).
        # VMEM bound: the f32 [hb, bq, tp] score block at hb=2/bq=256 is
        # tp*2KB -> 4 MB at tp=2048 (8 MB f32 inputs), comfortably inside
        # the 16 MB scope. Explicit caller block configs are respected.
        tp1 = round_up(t, 128)
        if tp1 <= (2048 if dtype.itemsize <= 2 else 1024):
            if t % 128 and t % 16 == 0 and t <= 1024 and dtype.itemsize <= 2:
                # NO-PAD one-shot: Mosaic takes tp == t when t fits the bf16
                # sublane tile (t % 16 == 0) — the [bq, t] f32 score
                # intermediate's 912-wide lane dim resolves via masked vregs.
                # Kills the per-call jnp.pad of q/k/v AND the padded-dot
                # columns: 33.2 -> 25.8 ms/layer-call at the B=64 serving
                # shape (b2=128, T=912, tools/attn_nopad_probe.py, v5e
                # 2026-08-20), output BIT-IDENTICAL to the padded kernel.
                # Single q-block (bq == t) with hb=2 measured best (25.8 vs
                # 27.9 for bq=304/hb=4); f32 scores 2*t*t*4B <= 8.4 MB.
                hb = 2 if h % 2 == 0 else 1
                return t, t, hb, interpret, t
            # block_q 512 when it divides tp (47.8 -> 52.5 TFLOP/s at the B=64
            # serving shape, tools/attn_ctx_probe.py 2026-08-19); past tp=1024
            # the wider per-head f32 score rows overflow scoped VMEM with the
            # unrolled-head chains in flight, so fall back to 256/128.
            if tp1 % 512 == 0 and tp1 <= 1024:
                bq = 512
            else:
                bq = 256 if tp1 % 256 == 0 else 128   # must divide tp (floored loop)
            hb = 4 if h % 4 == 0 else (2 if h % 2 == 0 else 1)
            return min(bq, tp1), tp1, hb, interpret, tp1
    if dtype.itemsize >= 4:
        # f32 q/k/v doubles the VMEM footprint of the in-kernel blocks; the
        # 16 MB scoped-vmem limit fits 1024-wide blocks only for <=2-byte
        # dtypes (bf16 serving path)
        block_q, block_k = min(block_q, 512), min(block_k, 512)
    if t > 1024:
        # past 2 K-blocks the loop runs chunked (MAX_UNROLL) with 2 in-flight
        # [hb, bq, bk] f32 softmax temporaries; 1024-wide q blocks then
        # overflow the 16 MB scoped-VMEM stack (20.1 MB at tp=2048)
        block_q = min(block_q, 512)
    block_q = min(block_q, round_up(t, 128))
    block_k = min(block_k, round_up(t, 128))
    tp = round_up(t, max(block_q, block_k))

    # shrink each block until it DIVIDES tp: the largest divisor of tp that
    # is <= the requested block and a multiple of 16 (the bf16 sublane tile).
    # The old bare -=128 loop hung at trace time for explicit non-128
    # multiple overrides (e.g. a 304 q block against tp=1024: 304, 176, 48,
    # then negative forever); stepping over divisors also admits the no-pad
    # tp==t path (tp=912, block 304).
    def _fit(b):
        b = min(b, tp)
        if tp % b == 0:
            return b
        for c in range(b - b % 16, 15, -16):
            if tp % c == 0:
                return c
        return math.gcd(b, tp)   # degenerate shapes; correct, if slow

    block_q = _fit(block_q)
    block_k = _fit(block_k)
    while h % head_block:
        head_block -= 1
    return block_q, block_k, head_block, interpret, tp


def _flash_forward(cfg, valid_arr, q, k, v, with_lse: bool = False, rotary=None):
    b, h, t, dh = q.shape
    block_q, block_k, head_block, interpret, tp = _resolve_blocks(cfg, t, h, q.dtype)
    if rotary is not None and tp // block_k != 1:
        # fused rotary is one-shot-path only; apply it in XLA instead
        # (callers route through flash_attention, which guards this — kept as
        # a safety net for direct _flash_forward use)
        q = _rotary_xla(q, rotary[0][:t], rotary[1][:t])
        k = _rotary_xla(k, rotary[0][:t], rotary[1][:t])
        rotary = None
    if tp != t:
        pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
        if rotary is not None:
            rotary = tuple(jnp.pad(r[:t], [(0, tp - t), (0, 0)]) for r in rotary)
    elif rotary is not None:
        rotary = tuple(r[:t] for r in rotary)
    scale = dh ** -0.5

    causal = bool(cfg[4]) if len(cfg) > 4 else False
    kernel = functools.partial(_flash_kernel, block_k=block_k, kv_len=tp, scale=scale,
                               causal=causal, fused_rotary=rotary is not None)
    grid = (b, h // head_block, tp // block_q)

    out_shape = jax.ShapeDtypeStruct((b, h, tp, dh), q.dtype)
    out_spec = pl.BlockSpec((1, head_block, block_q, dh), lambda bb, hh, i, *_: (bb, hh, i, 0), memory_space=pltpu.VMEM)
    if with_lse:
        out_shape = (out_shape, jax.ShapeDtypeStruct((b, h, tp, 1), jnp.float32))
        out_spec = (out_spec,
                    pl.BlockSpec((1, head_block, block_q, 1), lambda bb, hh, i, *_: (bb, hh, i, 0), memory_space=pltpu.VMEM))

    in_specs = [
        pl.BlockSpec((1, head_block, block_q, dh), lambda bb, hh, i, *_: (bb, hh, i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, head_block, tp, dh), lambda bb, hh, i, *_: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, head_block, tp, dh), lambda bb, hh, i, *_: (bb, hh, 0, 0), memory_space=pltpu.VMEM),
    ]
    operands = (q, k, v)
    if rotary is not None:
        # table blocks: cq/sq follow the q block, ck/sk the full key row
        in_specs = [
            pl.BlockSpec((block_q, dh), lambda bb, hh, i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_q, dh), lambda bb, hh, i, *_: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, dh), lambda bb, hh, i, *_: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, dh), lambda bb, hh, i, *_: (0, 0), memory_space=pltpu.VMEM),
        ] + in_specs
        cos, sin = rotary
        operands = (cos, sin, cos, sin) + operands

    res = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=out_spec,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * b * h * tp * tp * dh,
            bytes_accessed=(3 * b * h * tp * dh + b * h * tp * dh) * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(valid_arr, *operands)
    if with_lse:
        out, lse = res
        return (out[:, :, :t], lse[:, :, :t]) if tp != t else (out, lse)  # lse [b, h, t, 1]
    return res[:, :, :t] if tp != t else res


# ---------------------------------------------------------------------------
# backward kernels (training): standard flash-attention backward. With the
# saved per-row logsumexp L the probabilities re-materialize blockwise as
# p = exp(s - L); dV = p^T dO; dS = p * (dO V^T - D) with D = rowsum(dO * O);
# dQ = dS K * scale; dK = dS^T Q * scale. No [T, T] intermediate ever lands
# in HBM — the einsum path's f32 probability matrix (e.g. [8,16,800,800] =
# 327 MB per layer at the acoustic recipe crop) is what this removes.


def _flash_bwd_dq_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                         dq_ref, *, block_k: int, kv_len: int, scale: float,
                         causal: bool = False):
    _, hb, block_q, dh = q_ref.shape
    row_ids = (pl.program_id(2) * block_q
               + jax.lax.broadcasted_iota(jnp.int32, (1, block_q, 1), 1))
    # scale folded into q where exact (power of two); s comes out identical
    # and the trailing dq * scale is the chain-rule factor, unchanged
    q, s_scale = _fold_scale(q_ref[0], scale)
    do = do_ref[0]
    # lse/delta ride as [b, h/hb, hb, t] so each grid step's block is its own
    # head pair statically (a [.., t, 1] layout would lane-pad 128x in HBM;
    # slicing a dense [b, h, t] at program_id*hb fails Mosaic's 8-multiple
    # sublane-alignment proof)
    lse = lse_ref[0, 0][..., None]        # [hb, bq, 1]
    delta = delta_ref[0, 0][..., None]    # [hb, bq, 1]
    valid_len = _read_valid(valid_ref)

    num_kb = kv_len // block_k

    def step(kb, dq):
        k = k_ref[0, :, pl.ds(kb * block_k, block_k), :]
        v = v_ref[0, :, pl.ds(kb * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if s_scale != 1.0:
            s = s * s_scale
        cols = kb * block_k + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_k), 2)
        live = cols < valid_len
        if causal:
            live = live & (cols <= row_ids)
        p = jnp.exp(jnp.where(live, s, -1e30) - lse)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        ds = p * (dp - delta)
        return dq + jax.lax.dot_general(ds.astype(k.dtype), k, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)

    dq = _blocked_loop(num_kb, step, jnp.zeros((hb, block_q, dh), jnp.float32))
    dq_ref[0] = (dq * scale).astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(valid_ref, q_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                          dk_ref, dv_ref, *, block_q: int, q_len: int, scale: float,
                          causal: bool = False):
    # grid over KV blocks: k_ref/v_ref [1, hb, block_k, dh]; q/do/lse/delta
    # are full-length.
    _, hb, block_k, dh = k_ref.shape
    # fold the scale into k this time (s^T = k q^T): exact for power-of-two
    # scales; the trailing dk * scale chain-rule factor is unchanged
    k, s_scale = _fold_scale(k_ref[0], scale)
    v = v_ref[0]
    valid_len = _read_valid(valid_ref)
    kb0 = pl.program_id(2) * block_k
    rows = kb0 + jax.lax.broadcasted_iota(jnp.int32, (1, block_k, 1), 1)
    key_live = rows < valid_len        # this block's key positions
    # lse/delta blocks are [1, 1, hb, q_len] — this instance's head pair;
    # the q-block slice rides the (128-multiple-provable) lane dim
    num_qb = q_len // block_q

    def step(qb, carry):
        dk, dv = carry
        q = q_ref[0, :, pl.ds(qb * block_q, block_q), :]
        do = do_ref[0, :, pl.ds(qb * block_q, block_q), :]
        lse = lse_ref[0, 0, :, pl.ds(qb * block_q, block_q)][:, None, :]
        delta = delta_ref[0, 0, :, pl.ds(qb * block_q, block_q)][:, None, :]
        # s^T [hb, bk, bq]
        st = jax.lax.dot_general(k, q, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        if s_scale != 1.0:
            st = st * s_scale
        live = key_live
        if causal:
            # transposed layout: rows (dim 1) are KEY positions, cols (dim 2)
            # are QUERY positions — key row attends only queries >= it
            q_pos = qb * block_q + jax.lax.broadcasted_iota(jnp.int32, (1, 1, block_q), 2)
            live = live & (q_pos >= rows)
        pt = jnp.exp(jnp.where(live, st, -1e30) - lse)
        dv_new = dv + jax.lax.dot_general(pt.astype(do.dtype), do, (((2,), (1,)), ((0,), (0,))),
                                          preferred_element_type=jnp.float32)
        dpt = jax.lax.dot_general(v, do, (((2,), (2,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        dst = pt * (dpt - delta)
        dk_new = dk + jax.lax.dot_general(dst.astype(q.dtype), q, (((2,), (1,)), ((0,), (0,))),
                                          preferred_element_type=jnp.float32)
        return dk_new, dv_new

    dk, dv = _blocked_loop(num_qb, step, (jnp.zeros((hb, block_k, dh), jnp.float32),
                                          jnp.zeros((hb, block_k, dh), jnp.float32)))
    dk_ref[0] = (dk * scale).astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _flash_backward(cfg, valid_arr, q, k, v, out, lse, g):
    b, h, t, dh = q.shape
    # the backward keeps ~4 f32 [hb, bq, bk] intermediates live (s/p, dp,
    # ds) x MAX_UNROLL in-flight: 512-wide blocks fit the 16 MB VMEM scope
    # up to 2 K-blocks; past that (chunked loop + full-length q/do resident
    # in the dkv kernel) drop to 256
    cap = 512 if t <= 1024 else 256
    causal = bool(cfg[4]) if len(cfg) > 4 else False
    block_q, block_k, head_block, interpret, tp = _resolve_blocks(
        (min(cfg[0], cap), min(cfg[1], cap), cfg[2], cfg[3]), t, h, q.dtype)
    if tp != t:
        pad = [(0, 0), (0, 0), (0, tp - t), (0, 0)]
        q, k, v, g = (jnp.pad(x, pad) for x in (q, k, v, g))
        out = jnp.pad(out, pad)
        lse = jnp.pad(lse, [(0, 0), (0, 0), (0, tp - t)])
    scale = dh ** -0.5
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32), axis=-1)  # [b, h, tp]
    # [b, h/hb, hb, tp]: each grid step's lse/delta block is statically its
    # own head pair (see kernel comments)
    lse = lse.reshape(b, h // head_block, head_block, tp)
    delta = delta.reshape(b, h // head_block, head_block, tp)

    blk4 = lambda bs: pl.BlockSpec((1, head_block, bs, dh), lambda bb, hh, i, *_: (bb, hh, i, 0), memory_space=pltpu.VMEM)
    full4 = pl.BlockSpec((1, head_block, tp, dh), lambda bb, hh, i, *_: (bb, hh, 0, 0), memory_space=pltpu.VMEM)
    blk3 = lambda bs: pl.BlockSpec((1, 1, head_block, bs), lambda bb, hh, i, *_: (bb, hh, 0, i), memory_space=pltpu.VMEM)
    full3 = pl.BlockSpec((1, 1, head_block, tp), lambda bb, hh, i, *_: (bb, hh, 0, 0), memory_space=pltpu.VMEM)

    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, block_k=block_k, kv_len=tp, scale=scale,
                          causal=causal),
        out_shape=jax.ShapeDtypeStruct((b, h, tp, dh), q.dtype),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // head_block, tp // block_q),
            in_specs=[blk4(block_q), full4, full4, blk4(block_q), blk3(block_q), blk3(block_q)],
            out_specs=blk4(block_q),
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * b * h * tp * tp * dh,
            bytes_accessed=6 * b * h * tp * dh * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(valid_arr, q, k, v, g, lse, delta)

    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, block_q=block_q, q_len=tp, scale=scale,
                          causal=causal),
        out_shape=(jax.ShapeDtypeStruct((b, h, tp, dh), q.dtype),
                   jax.ShapeDtypeStruct((b, h, tp, dh), q.dtype)),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b, h // head_block, tp // block_k),
            in_specs=[full4, blk4(block_k), blk4(block_k), full4, full3, full3],
            out_specs=(blk4(block_k), blk4(block_k)),
        ),
        cost_estimate=pl.CostEstimate(
            flops=8 * b * h * tp * tp * dh,
            bytes_accessed=6 * b * h * tp * dh * q.dtype.itemsize,
            transcendentals=b * h * tp * tp,
        ),
        interpret=interpret,
    )(valid_arr, q, k, v, g, lse, delta)

    if tp != t:
        dq, dk, dv = dq[:, :, :t], dk[:, :, :t], dv[:, :, :t]
    return dq, dk, dv


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core(cfg, valid_arr, q, k, v):
    return _flash_forward(cfg, valid_arr, q, k, v)


def _pack_heads(x):
    b, h, t, dh = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dh)


def _unpack_heads(x, h):
    b, t, hdh = x.shape
    return x.reshape(b, t, h, hdh // h).transpose(0, 2, 1, 3)


def _flash_core_fwd(cfg, valid_arr, q, k, v):
    out, lse = _flash_forward(cfg, valid_arr, q, k, v, with_lse=True)
    # Residuals are stored head-MERGED [b, t, h*dh] and lse dense [b, h, t]:
    # XLA:TPU lane-pads the trailing dim to 128 in HBM, so [.., dh=64]
    # tensors held across the whole backward would cost 2x (and a [.., 1]
    # lse 128x — 536 MB per layer at the recipe-max batch).
    return out, (valid_arr, _pack_heads(q), _pack_heads(k), _pack_heads(v),
                 _pack_heads(out), lse[..., 0])


def _flash_core_bwd(cfg, res, g):
    import numpy as _np

    valid_arr, qp, kp, vp, outp, lse = res
    h = lse.shape[1]
    dq, dk, dv = _flash_backward(cfg, valid_arr, _unpack_heads(qp, h), _unpack_heads(kp, h),
                                 _unpack_heads(vp, h), _unpack_heads(outp, h), lse, g)
    return _np.zeros(valid_arr.shape, jax.dtypes.float0), dq, dk, dv


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _flash_core_rot(cfg, valid_arr, cos, sin, q, k, v):
    """Fused-rotary core: forward applies halfsplit rotary to q/k inside the
    one-shot kernel. Differentiable in q/k/v (tables are constants): the
    backward rotates q/k in XLA (bit-identical to the in-kernel rotation),
    runs the standard flash backward for d(rotated q/k), then counter-rotates
    — the rotate-half roll is an involution, so the VJP of the rotation is
    the same roll with cos/sin swapped in (see _rotary_xla_transpose)."""
    return _flash_forward(cfg, valid_arr, q, k, v, rotary=(cos, sin))


def _flash_core_rot_fwd(cfg, valid_arr, cos, sin, q, k, v):
    out, lse = _flash_forward(cfg, valid_arr, q, k, v, with_lse=True, rotary=(cos, sin))
    # Residuals save the UNROTATED q/k (see _flash_core_fwd for the
    # head-merged layout rationale); the backward re-rotates them.
    return out, (valid_arr, cos, sin, _pack_heads(q), _pack_heads(k), _pack_heads(v),
                 _pack_heads(out), lse[..., 0])


def _flash_core_rot_bwd(cfg, res, g):
    import numpy as _np

    valid_arr, cos, sin, qp, kp, vp, outp, lse = res
    h = lse.shape[1]
    q, k, v = _unpack_heads(qp, h), _unpack_heads(kp, h), _unpack_heads(vp, h)
    t = q.shape[-2]
    qr = _rotary_xla(q, cos[:t], sin[:t])
    kr = _rotary_xla(k, cos[:t], sin[:t])
    dqr, dkr, dv = _flash_backward(cfg, valid_arr, qr, kr, v, _unpack_heads(outp, h), lse, g)
    dq = _rotary_xla_transpose(dqr, cos[:t], sin[:t])
    dk = _rotary_xla_transpose(dkr, cos[:t], sin[:t])
    return (_np.zeros(valid_arr.shape, jax.dtypes.float0),
            jnp.zeros_like(cos), jnp.zeros_like(sin), dq, dk, dv)


_flash_core_rot.defvjp(_flash_core_rot_fwd, _flash_core_rot_bwd)



def attend_flash_or_xla(q, k, v, *, key_mask=None, valid_len=None, causal=False,
                        min_seq_for_flash: int = 512, rotary=None):
    """Dispatch: dense attention on TPU with T >= threshold and tileable
    shapes goes through the Pallas kernel — non-causal (the acoustic flow
    stack) AND causal self-attention (tq == tk, the T2S training decoder) —
    with prefix masking expressed as `valid_len` (scalar, or [B] per-row; the
    production serving/training paths). Arbitrary boolean `key_mask`,
    causal-with-cache (tq != tk), small-T, and non-TPU cases use the XLA
    einsum path.

    `rotary`: optional (positions [T], inv_freq [dh/2]) — halfsplit rotary
    applied to q and k, fused INTO the flash kernel when the one-shot path
    is taken, and applied via layers.rotary_halfsplit (bit-identical)
    otherwise. Passing it here instead of pre-rotating lets the serving path
    skip the HBM-bound rotary passes (see rotary_tables_halfsplit)."""
    from covomix_tpu.models.layers import attend, rotary_halfsplit

    t = q.shape[-2]
    on_tpu = jax.devices()[0].platform == "tpu"
    use_flash = (key_mask is None and on_tpu and t >= min_seq_for_flash
                 and q.shape[-1] <= 256 and (not causal or t == k.shape[-2]))
    if rotary is not None:
        positions, inv_freq = rotary
        if use_flash:
            tables = rotary_tables_halfsplit(positions, inv_freq, q.dtype)
            return flash_attention(q, k, v, valid_len=valid_len, causal=causal,
                                   rotary=tables)
        q = rotary_halfsplit(positions, inv_freq, q)
        k = rotary_halfsplit(positions, inv_freq, k)
    if use_flash:
        return flash_attention(q, k, v, valid_len=valid_len, causal=causal)
    if key_mask is None and valid_len is not None:
        key_mask = jnp.arange(t)[None, :] < jnp.asarray(valid_len).reshape(-1)[:, None]
        key_mask = jnp.broadcast_to(key_mask, (q.shape[0], t))
    return attend(q, k, v, key_mask=key_mask, causal=causal)
