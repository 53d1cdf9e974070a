"""Flow-sag deep dive part 2 (VERDICT r5 work): why does in-context attention
cost 2.2x the isolated kernel at b2=128, and how fast can the kernel itself go?

flow_sag_probe.py measured (v5e, 2026-08-19):
  b2=128: attention in-context 301 ms/eval vs isolated kernel 137 ms (32.2
  TFLOP/s); dense side healthy (167 TFLOP/s ff chain).

Experiments here (b2=128 unless noted):
  A. ctx-*: the attention BLOCK as it appears in layer_core (qkv matmul ->
     split -> rotary -> kernel -> merge -> out proj), 8 reps in one jit:
       ctx-full      T=912 (per-call pad to 1024 inside flash_attention)
       ctx-noattn    kernel replaced by v (block overhead baseline)
       ctx-pad1024   T=1024 input + valid_len=912 (NO per-call pad/unpad)
     -> separates pad/layout overhead from kernel time.
  B. iso one-shot config sweep at T=1024: (block_q, head_block) grid.
  C. iso experimental kernels at T=1024:
       unroll        per-head unrolled chains (Mosaic can overlap head i's
                     softmax (VPU) with head i+1's dots (MXU) — the batched
                     dot_general serializes them)
       nomax         constant-shift softmax exp(s-20) (drops the max-reduce
                     + broadcast-subtract VPU passes; EXPERIMENT ONLY — relies
                     on bounded scores)
       unroll+nomax  both
       lmxu          denominator via MXU (ones column appended to v)
  D. iso jax built-in pallas flash kernel (reference point).

Run: python tools/attn_ctx_probe.py  (real TPU, ~15 min)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from covomix_tpu.models import layers as L
from covomix_tpu.ops import flash_attention as FA

B2 = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H, DH, D = 16, 64, 1024
T = 912
TP = 1024
DTYPE = jnp.bfloat16


def retry(fn, what, attempts=6):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a == attempts - 1:
                print(f"{what}: FAILED {str(e)[:160]}", flush=True)
                return None
            print(f"# {what} attempt {a} failed ({str(e)[:100]}); retrying", flush=True)
            time.sleep(20 * (a + 1))


def timeit(loop_fn, args, iters, flops=None, tag=""):
    r = loop_fn(*args)
    float(jnp.float32(r.ravel()[0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop_fn(*args)
        float(jnp.float32(r.ravel()[0]))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    msg = f"{tag}: {per * 1e3:.3f} ms/call"
    if flops:
        msg += f"  {flops / per / 1e12:.1f} TFLOP/s"
    print(msg, flush=True)
    return per


# --------------------------------------------------------------------- A: ctx
def attn_block(p, x, t_len, mode):
    """The attention block exactly as layer_core runs it."""
    inv_freq = L.rotary_freqs(DH)
    positions = jnp.arange(x.shape[1])
    qkv = L.linear(p["qkv"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (L.split_heads(t, H) for t in (q, k, v))
    q = L.rotary_halfsplit(positions, inv_freq, q)
    k = L.rotary_halfsplit(positions, inv_freq, k)
    if mode == "noattn":
        attn = v
    elif mode == "pad1024":
        attn = FA.flash_attention(q, k, v, valid_len=t_len)
    else:
        attn = FA.flash_attention(q, k, v)
    return L.linear(p["attn_out"], L.merge_heads(attn))


def ctx_probe(mode, t_in, iters=6):
    key = jax.random.PRNGKey(0)
    p = {"qkv": L.linear_init(key, D, H * DH * 3, bias=False),
         "attn_out": L.linear_init(jax.random.fold_in(key, 1), H * DH, D, bias=False)}
    p = jax.tree.map(lambda a: a.astype(DTYPE), p)
    x = jax.random.normal(jax.random.fold_in(key, 2), (B2, t_in, D)).astype(DTYPE)

    @jax.jit
    def loop(p, x):
        def body(i, c):
            out = attn_block(p, c, T, mode)
            return out.astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    return timeit(loop, (p, x), iters, tag=f"ctx-{mode} t={t_in} (x8={'%.1f' % 0.0})")


# ------------------------------------------------- B/C/D: isolated kernels
def make_qkv(t):
    key = jax.random.PRNGKey(7)
    q = jax.random.normal(key, (B2, H, t, DH)).astype(DTYPE)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B2, H, t, DH)).astype(DTYPE)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B2, H, t, DH)).astype(DTYPE)
    return q, k, v


ISO_FLOPS = 4 * B2 * H * TP * TP * DH


def iso(kernel_call, tag, iters=20):
    q, k, v = make_qkv(TP)

    @jax.jit
    def loop(q, k, v):
        def body(i, o):
            return kernel_call(q + o[0, 0, 0, 0] * 1e-12, k, v)
        return jax.lax.fori_loop(0, iters, body, q)

    return retry(lambda: timeit(loop, (q, k, v), iters, ISO_FLOPS, tag), tag)


# experimental one-shot kernels -------------------------------------------
def _exp_kernel(q_ref, k_ref, v_ref, o_ref, *, unroll: bool, nomax: bool, lmxu: bool):
    hb = q_ref.shape[1]
    q = q_ref[0] * jnp.asarray(DH ** -0.5, q_ref.dtype)

    def one_head(qh, kh, vh):
        # qh [bq, dh]; kh/vh [tp, dh]
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if nomax:
            p = jnp.exp(s - 20.0)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        pb = p.astype(vh.dtype)
        if lmxu:
            ones = jnp.ones((vh.shape[0], 1), vh.dtype)
            vext = jnp.concatenate([vh, ones], axis=-1)
            acc = jax.lax.dot_general(pb, vext, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            return acc[:, :DH] / jnp.maximum(acc[:, DH:], 1e-30)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(pb, vh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        return acc / jnp.maximum(l, 1e-30)

    if unroll:
        for hh in range(hb):
            o_ref[0, hh] = one_head(q[hh], k_ref[0, hh], v_ref[0, hh]).astype(o_ref.dtype)
    else:
        s = jax.lax.dot_general(q, k_ref[0], (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        if nomax:
            p = jnp.exp(s - 20.0)
        else:
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[0],
                                  (((2,), (1,)), ((0,), (0,))),
                                  preferred_element_type=jnp.float32)
        o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def exp_flash(q, k, v, *, block_q, head_block, unroll=False, nomax=False, lmxu=False):
    b, h, t, dh = q.shape
    kern = functools.partial(_exp_kernel, unroll=unroll, nomax=nomax, lmxu=lmxu)
    grid = (b, h // head_block, t // block_q)
    blk = lambda bs: pl.BlockSpec((1, head_block, bs, dh), lambda bb, hh, i: (bb, hh, i, 0),
                                  memory_space=pltpu.VMEM)
    full = pl.BlockSpec((1, head_block, t, dh), lambda bb, hh, i: (bb, hh, 0, 0),
                        memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((b, h, t, dh), q.dtype),
        grid=grid,
        in_specs=[blk(block_q), full, full],
        out_specs=blk(block_q),
        cost_estimate=pl.CostEstimate(flops=4 * b * h * t * t * dh,
                                      bytes_accessed=4 * b * h * t * dh * q.dtype.itemsize,
                                      transcendentals=b * h * t * t),
    )(q, k, v)


if __name__ == "__main__":
    retry(lambda: float(jnp.float32(jax.random.normal(jax.random.PRNGKey(0), (8, 8))[0, 0])),
          "first op", attempts=10)
    print(f"# platform={jax.devices()[0].platform} b2={B2}", flush=True)

    print("== A: attention block in context ==", flush=True)
    retry(lambda: ctx_probe("full", T), "ctx-full")
    retry(lambda: ctx_probe("noattn", T), "ctx-noattn")
    retry(lambda: ctx_probe("pad1024", TP), "ctx-pad1024")

    print("== B: one-shot config sweep (current kernel, T=1024) ==", flush=True)
    for bq, hb in ((256, 2), (512, 2), (128, 2), (256, 4), (512, 4), (128, 8), (256, 8), (1024, 2)):
        iso(lambda q, k, v, bq=bq, hb=hb: FA.flash_attention(
            q, k, v, block_q=bq, block_k=TP, head_block=hb), f"oneshot bq={bq} hb={hb}")

    print("== C: experimental kernels (T=1024) ==", flush=True)
    for tag, kw in (
        ("unroll bq=256 hb=2", dict(block_q=256, head_block=2, unroll=True)),
        ("unroll bq=256 hb=4", dict(block_q=256, head_block=4, unroll=True)),
        ("unroll bq=512 hb=2", dict(block_q=512, head_block=2, unroll=True)),
        ("unroll bq=512 hb=4", dict(block_q=512, head_block=4, unroll=True)),
        ("unroll+nomax bq=256 hb=4", dict(block_q=256, head_block=4, unroll=True, nomax=True)),
        ("unroll+nomax bq=512 hb=4", dict(block_q=512, head_block=4, unroll=True, nomax=True)),
        ("unroll+lmxu bq=256 hb=4", dict(block_q=256, head_block=4, unroll=True, lmxu=True)),
        ("unroll+nomax+lmxu bq=512 hb=4", dict(block_q=512, head_block=4, unroll=True, nomax=True, lmxu=True)),
        ("batched+nomax bq=256 hb=2", dict(block_q=256, head_block=2, nomax=True)),
    ):
        iso(lambda q, k, v, kw=kw: exp_flash(q, k, v, **kw), tag)

    print("== D: jax built-in pallas flash (T=1024) ==", flush=True)
    try:
        from jax.experimental.pallas.ops.tpu.flash_attention import (
            BlockSizes, flash_attention as jax_flash)

        def jf(q, k, v):
            return jax_flash(q, k, v, causal=False, sm_scale=DH ** -0.5,
                             block_sizes=BlockSizes.get_default())
        iso(jf, "jax-builtin default")
    except Exception as e:  # noqa: BLE001
        print(f"jax-builtin unavailable: {str(e)[:160]}", flush=True)
