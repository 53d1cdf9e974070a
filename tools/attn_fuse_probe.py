"""Flow-sag fix candidates: fuse rotary (and head-layout) into the one-shot
flash kernel (VERDICT r5 item 1, follow-up to attn_ctx_probe.py).

Measured so far (v5e 2026-08-19, b2=128, T=912, bf16):
  attention BLOCK in layer_core: 45.3 ms/layer-call
    = qkv+out-proj 7.5 + kernel ~10.0 (bq512/hb4 unrolled) + pad ~3.2
      + rotary/layout residual ~24.6  <- this probe attacks the residual
  flow field eval 440 ms (attn 68.4%); dense ff healthy at 167 TFLOP/s.

Variants (attention block exactly as acoustic.layer_core runs it, 8 reps
in one jit, min-of-3):
  prod         production block (rotary_halfsplit outside, pad-to-1024 in
               flash_attention)                       [baseline 45.3]
  norot        production minus rotary               [rotary total cost]
  tabrot       rotary outside via PRecomputed bf16 cos/sin tables (no
               transcendentals in the hot pass, bf16 math)
  fused-bhtd   rotary fused INTO the one-shot kernel; [B,H,T,dh] I/O
               (split_heads transposes stay outside)
  fused-bthd   rotary fused in + [B,T,H,dh] I/O: qkv matmul output feeds
               the kernel via FREE reshape views (no head transposes at
               all); one pad of the packed qkv tensor
Run: python tools/attn_fuse_probe.py [b2]   (real TPU, ~10 min)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from covomix_tpu.models import layers as L
from covomix_tpu.ops import flash_attention as FA

B2 = int(sys.argv[1]) if len(sys.argv) > 1 else 128
H, DH, D = 16, 64, 1024
T, TP = 912, 1024
DTYPE = jnp.bfloat16
SCALE = DH ** -0.5


def retry(fn, what, attempts=6):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a == attempts - 1:
                print(f"{what}: FAILED {str(e)[:200]}", flush=True)
                return None
            print(f"# {what} attempt {a} failed ({str(e)[:100]}); retrying", flush=True)
            time.sleep(20 * (a + 1))


def rotary_tables(tp, dtype=jnp.float32, signed=False):
    """[tp, dh] cos/sin for the halfsplit convention (freqs concatenated).

    signed=True: sin table with the rotate-half sign FOLDED IN
    (sin[:, :d] negated) so the in-kernel rotate is a pure lane roll:
      rotary(x) = x*cos + roll(x, d)*sin_signed
    — Mosaic can't slice the 64-wide lane dim at offset 32
    (concatenate([-x[:, d:], x[:, :d]]) fails to compile), but pltpu.roll
    is a native lane rotation."""
    inv = L.rotary_freqs(DH)
    freqs = jnp.arange(tp)[:, None].astype(jnp.float32) * inv[None, :]
    freqs = jnp.concatenate([freqs, freqs], axis=-1)
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    if signed:
        d = DH // 2
        sin = jnp.concatenate([-sin[:, :d], sin[:, d:]], axis=-1)
    return cos.astype(dtype), sin.astype(dtype)


def apply_tab_rotary(t, cos, sin):
    """t [..., T, dh] (bf16); cos/sin [T, dh] (bf16). Halfsplit rotate."""
    d = t.shape[-1] // 2
    rot = jnp.concatenate([-t[..., d:], t[..., :d]], axis=-1)
    return t * cos + rot * sin


# ---------------------------------------------------------------- fused kernel
def _rot_in_kernel(x, cos, sin_signed):
    """x [rows, dh]; cos/sin_signed [rows, dh] (sign folded into sin — see
    rotary_tables). rotate-half = x @ P with P the 64x64 cyclic-shift
    permutation: Mosaic can't slice or roll the 64-wide lane dim (both fail
    to compile), but a [rows,64]x[64,64] dot is native MXU work and costs
    ~rows*8K FLOPs — noise next to the attention dots."""
    n = x.shape[-1]
    d = n // 2
    row = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    perm = ((row == col - d) | (row == col + d)).astype(x.dtype)
    rolled = jax.lax.dot_general(x, perm, (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.float32).astype(x.dtype)
    return x * cos + rolled * sin_signed


def _fused_kernel(cq_ref, sq_ref, ck_ref, sk_ref, q_ref, k_ref, v_ref, o_ref,
                  *, valid: int, bthd: bool, scale: float):
    cq, sq = cq_ref[...], sq_ref[...]                     # [bq, dh]
    ck, sk = ck_ref[...], sk_ref[...]                     # [tp, dh]
    hb = q_ref.shape[2] if bthd else q_ref.shape[1]
    tp = k_ref.shape[1] if bthd else k_ref.shape[2]
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, tp), 1)
    live = cols < valid
    sc = jnp.asarray(scale, jnp.float32)
    for h in range(hb):
        if bthd:
            qh, kh, vh = q_ref[0, :, h, :], k_ref[0, :, h, :], v_ref[0, :, h, :]
        else:
            qh, kh, vh = q_ref[0, h], k_ref[0, h], v_ref[0, h]
        qh = _rot_in_kernel(qh, cq, sq)
        kh = _rot_in_kernel(kh, ck, sk)
        s = jax.lax.dot_general(qh, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * sc
        s = jnp.where(live, s, -1e30)
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        out = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
        if bthd:
            o_ref[0, :, h, :] = out
        else:
            o_ref[0, h] = out


def fused_flash(q, k, v, cos, sin, *, valid, bthd, block_q=512, head_block=4):
    """q/k/v: bthd -> [B, T, H, dh]; else [B, H, T, dh]. cos/sin [T, dh]."""
    if bthd:
        b, tp, h, dh = q.shape
        # Pallas tiling: the 2nd-to-last block dim must be sublane-aligned or
        # equal the array dim — head_block=4 < 8 fails, so keep ALL heads in
        # the block (H == array dim is always legal) and grid over (b, t).
        head_block = h
    else:
        b, h, tp, dh = q.shape
    kern = functools.partial(_fused_kernel, valid=valid, bthd=bthd, scale=SCALE)
    grid = (b, h // head_block, tp // block_q)
    if bthd:
        qspec = pl.BlockSpec((1, block_q, head_block, dh),
                             lambda bb, hh, i: (bb, i, hh, 0), memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, tp, head_block, dh),
                             lambda bb, hh, i: (bb, 0, hh, 0), memory_space=pltpu.VMEM)
    else:
        qspec = pl.BlockSpec((1, head_block, block_q, dh),
                             lambda bb, hh, i: (bb, hh, i, 0), memory_space=pltpu.VMEM)
        kspec = pl.BlockSpec((1, head_block, tp, dh),
                             lambda bb, hh, i: (bb, hh, 0, 0), memory_space=pltpu.VMEM)
    tabq = pl.BlockSpec((block_q, dh), lambda bb, hh, i: (i, 0), memory_space=pltpu.VMEM)
    tabk = pl.BlockSpec((tp, dh), lambda bb, hh, i: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct(q.shape, q.dtype),
        grid=grid,
        in_specs=[tabq, tabq, tabk, tabk, qspec, kspec, kspec],
        out_specs=qspec,
        cost_estimate=pl.CostEstimate(flops=4 * b * h * tp * tp * dh,
                                      bytes_accessed=4 * b * h * tp * dh * q.dtype.itemsize,
                                      transcendentals=b * h * tp * tp),
    )(cos, sin, cos, sin, q, k, v)


# ------------------------------------------------------------- block variants
def attn_block(p, x, mode, tabs, stabs):
    inv_freq = L.rotary_freqs(DH)
    positions = jnp.arange(x.shape[1])
    qkv = L.linear(p["qkv"], x)                            # [B, T, 3HD]
    if mode == "fused-bthd":
        qkv = jnp.pad(qkv, ((0, 0), (0, TP - T), (0, 0)))  # ONE pad, packed
        q, k, v = (r.reshape(B2, TP, H, DH) for r in jnp.split(qkv, 3, axis=-1))
        cos, sin = stabs
        attn = fused_flash(q, k, v, cos, sin, valid=T, bthd=True)
        attn = attn[:, :T].reshape(B2, T, H * DH)          # free reshape back
        return L.linear(p["attn_out"], attn)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (L.split_heads(r, H) for r in (q, k, v))
    if mode == "prod":
        q = L.rotary_halfsplit(positions, inv_freq, q)
        k = L.rotary_halfsplit(positions, inv_freq, k)
        attn = FA.flash_attention(q, k, v, valid_len=T)
    elif mode == "norot":
        attn = FA.flash_attention(q, k, v, valid_len=T)
    elif mode == "tabrot":
        cos, sin = tabs
        q = apply_tab_rotary(q, cos[:T], sin[:T])
        k = apply_tab_rotary(k, cos[:T], sin[:T])
        attn = FA.flash_attention(q, k, v, valid_len=T)
    elif mode == "fused-bhtd":
        pad = ((0, 0), (0, 0), (0, TP - T), (0, 0))
        q, k, v = (jnp.pad(r, pad) for r in (q, k, v))
        cos, sin = stabs
        attn = fused_flash(q, k, v, cos, sin, valid=T, bthd=False)[:, :, :T]
    else:
        raise ValueError(mode)
    return L.linear(p["attn_out"], L.merge_heads(attn))


def run(mode, iters=8):
    key = jax.random.PRNGKey(0)
    p = {"qkv": L.linear_init(key, D, H * DH * 3, bias=False),
         "attn_out": L.linear_init(jax.random.fold_in(key, 1), H * DH, D, bias=False)}
    p = jax.tree.map(lambda a: a.astype(DTYPE), p)
    x = jax.random.normal(jax.random.fold_in(key, 2), (B2, T, D)).astype(DTYPE)
    tabs = rotary_tables(TP, DTYPE)
    stabs = rotary_tables(TP, DTYPE, signed=True)

    @jax.jit
    def loop(p, x):
        def body(i, c):
            return attn_block(p, c, mode, tabs, stabs).astype(c.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    r = loop(p, x)
    float(jnp.float32(r[0, 0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(p, x)
        float(jnp.float32(r[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    print(f"{mode}: {best / iters * 1e3:.3f} ms/layer-call", flush=True)
    return best / iters


def _parity_inputs():
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (2, H, T, DH)).astype(DTYPE)
    k = jax.random.normal(jax.random.fold_in(key, 1), (2, H, T, DH)).astype(DTYPE)
    v = jax.random.normal(jax.random.fold_in(key, 2), (2, H, T, DH)).astype(DTYPE)
    inv = L.rotary_freqs(DH)
    pos = jnp.arange(T)
    qr = L.rotary_halfsplit(pos, inv, q)
    kr = L.rotary_halfsplit(pos, inv, k)
    ref = np.asarray(FA.flash_attention(qr, kr, v, valid_len=T), np.float32)
    return q, k, v, ref


def parity_bhtd():
    """Fused kernel must match the production block bitwise-closely (bf16)."""
    q, k, v, ref = _parity_inputs()
    cos, sin = rotary_tables(TP, DTYPE, signed=True)
    pad = ((0, 0), (0, 0), (0, TP - T), (0, 0))
    outh = fused_flash(jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad),
                       cos, sin, valid=T, bthd=False)[:, :, :T]
    d1 = np.abs(np.asarray(outh, np.float32) - ref).max()
    print(f"parity fused-bhtd max|d| {d1:.2e} "
          f"(bf16-table rotary vs f32 rotary: expect ~bf16 eps * |o|)", flush=True)


def parity_bthd():
    q, k, v, ref = _parity_inputs()
    cos, sin = rotary_tables(TP, DTYPE, signed=True)
    qt = jnp.pad(q.transpose(0, 2, 1, 3), ((0, 0), (0, TP - T), (0, 0), (0, 0)))
    kt = jnp.pad(k.transpose(0, 2, 1, 3), ((0, 0), (0, TP - T), (0, 0), (0, 0)))
    vt = jnp.pad(v.transpose(0, 2, 1, 3), ((0, 0), (0, TP - T), (0, 0), (0, 0)))
    outt = fused_flash(qt, kt, vt, cos, sin, valid=T, bthd=True)[:, :T]
    d2 = np.abs(np.asarray(outt.transpose(0, 2, 1, 3), np.float32) - ref).max()
    print(f"parity fused-bthd max|d| {d2:.2e}", flush=True)


if __name__ == "__main__":
    retry(lambda: float(jnp.float32(jax.random.normal(jax.random.PRNGKey(0), (8, 8))[0, 0])),
          "first op", attempts=10)
    print(f"# platform={jax.devices()[0].platform} b2={B2}", flush=True)
    retry(parity_bhtd, "parity-bhtd", attempts=2)
    retry(parity_bthd, "parity-bthd", attempts=2)
    for mode in ("prod", "norot", "tabrot", "fused-bhtd", "fused-bthd"):
        retry(lambda m=mode: run(m), mode, attempts=2)
