"""Attribute the flow-stage MFU sag from B=4 to B=64 (VERDICT r4 item 1).

BENCH_r04 batch_scaling: flow_mfu 0.4766 (B=4, i.e. CFG-doubled b2=8) ->
0.3596 (B=64, b2=128); flow is 92% of the B=64 fused wall, so BASELINE
config 5 pays the whole sag. FLOPs scale exactly linearly in B at fixed T,
and matmuls should get MORE efficient as M grows — so some component's RATE
drops with batch. This probe measures, at b2 in {8, 128}:

  field ablations (in-jit fori_loop over A.forward, min-of-3):
    full       the production bf16 field eval
    no-attn    attend_flash_or_xla -> v (upper bound of ANY attention win)
    id-act     L.gelu -> identity (all activation cost)
    no-conv    L.depthwise_conv1d -> identity  (NOTE: round-4's flow_probe
               patched LY.conv1d, which forward no longer calls — its
               "conv-pos is free" reading was a no-op patch)
    no-norm    adaptive_rmsnorm -> x (all norm cost)

  isolated rates (same in-jit loop methodology):
    flash kernel TFLOP/s at [b2, 16, 912, 64] (the default one-shot config)
    dense FF chain (M x 1024 -> 4096 -> 1024, gelu between) TFLOP/s at
    M = b2*912 — the dominant matmul shape

Run: python tools/flow_sag_probe.py   (real TPU; ~15 min with compiles)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.models import acoustic as A
from covomix_tpu.models import layers as L
from covomix_tpu.ops import flash_attention as FA

T = 912
DTYPE = jnp.bfloat16
B2S = tuple(int(x) for x in (sys.argv[1].split(",") if len(sys.argv) > 1 else ("8", "128")))


def retry(fn, what, attempts=8):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a == attempts - 1:
                raise
            print(f"# {what} attempt {a} failed ({str(e)[:100]}); retrying", flush=True)
            time.sleep(20 * (a + 1))


ac_cfg = A.AcousticConfig(dim_in=160, dim=1024, depth=8, heads=16, dim_head=64,
                          num_phoneme_tokens=502, mode="two_one")
params = retry(lambda: jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), ac_cfg),
               "init")
print(f"# platform={jax.devices()[0].platform} kind={jax.devices()[0].device_kind}",
      flush=True)

# FLOPs of one field eval per unit b2 (from BENCH_r04 cost analysis:
# 61.07 TFLOP / 32 evals at b2=8 -> 0.2386 TFLOP per b2-row)
FLOPS_PER_B2 = 61.07e12 / 32 / 8
PEAK = 197e12


def fwd_wall(b2, tag, iters=6):
    x = jax.random.normal(jax.random.PRNGKey(2), (b2, T, 80), jnp.float32)
    ph = jax.random.randint(jax.random.PRNGKey(3), (b2, T, 2), 0, 502)
    cond = jax.random.normal(jax.random.PRNGKey(4), (b2, T, 160), jnp.float32)
    tms = jnp.full((b2,), 0.4, jnp.float32)

    @jax.jit
    def loop(params, x):
        def body(i, c):
            out = A.forward(params, ac_cfg, c, ph, cond, tms, dtype=DTYPE)
            return out.astype(x.dtype)
        return jax.lax.fori_loop(0, iters, body, x)

    r = loop(params, x)
    float(jnp.float32(r[0, 0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(params, x)
        float(jnp.float32(r[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    mfu = FLOPS_PER_B2 * b2 / per / PEAK
    print(f"{tag}: b2={b2} {per * 1e3:.2f} ms/eval  full-flop-MFU {mfu:.3f}", flush=True)
    return per


def flash_iso(b2, iters=20):
    """Isolated default-config flash kernel at the serving shape."""
    H, DH = 16, 64
    q = jax.random.normal(jax.random.PRNGKey(5), (b2, H, T, DH)).astype(DTYPE)
    k = jax.random.normal(jax.random.PRNGKey(6), (b2, H, T, DH)).astype(DTYPE)
    v = jax.random.normal(jax.random.PRNGKey(7), (b2, H, T, DH)).astype(DTYPE)

    @jax.jit
    def loop(q, k, v):
        def body(i, o):
            return FA.flash_attention(q + o[0, 0, 0, 0] * 1e-12, k, v)
        return jax.lax.fori_loop(0, iters, body, q)

    r = loop(q, k, v)
    float(jnp.float32(r[0, 0, 0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(q, k, v)
        float(jnp.float32(r[0, 0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    fl = 4 * b2 * H * 1024 * 1024 * DH  # padded T=1024
    print(f"flash-iso: b2={b2} {per * 1e3:.3f} ms/call  {fl / per / 1e12:.1f} TFLOP/s "
          f"(per-layer share of field eval: {per * 8 * 1e3:.1f} ms x8)", flush=True)
    return per


def ff_iso(b2, iters=20):
    """Isolated dense FF chain at M = b2*T (the dominant matmul shape)."""
    M, K, N = b2 * T, 1024, 4096
    a = jax.random.normal(jax.random.PRNGKey(8), (M, K)).astype(DTYPE)
    w1 = jax.random.normal(jax.random.PRNGKey(9), (K, N)).astype(DTYPE)
    w2 = jax.random.normal(jax.random.PRNGKey(10), (N, K)).astype(DTYPE)

    @jax.jit
    def loop(a):
        def body(i, c):
            return (L.gelu(c @ w1) @ w2) * 1e-3
        return jax.lax.fori_loop(0, iters, body, a)

    r = loop(a)
    float(jnp.float32(r[0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(a)
        float(jnp.float32(r[0, 0]))
        best = min(best, time.perf_counter() - t0)
    per = best / iters
    fl = 2 * 2 * M * K * N
    print(f"ff-iso: b2={b2} M={M} {per * 1e3:.3f} ms  {fl / per / 1e12:.1f} TFLOP/s",
          flush=True)
    return per


for b2 in B2S:
    print(f"== b2={b2} ==", flush=True)
    w_full = retry(lambda b=b2: fwd_wall(b, "full"), "full")

    orig_attend = A.attend_flash_or_xla
    A.attend_flash_or_xla = lambda q, k, v, **kw: v
    try:
        w_noattn = retry(lambda b=b2: fwd_wall(b, "no-attn"), "no-attn")
    finally:
        A.attend_flash_or_xla = orig_attend

    orig_gelu = L.gelu
    L.gelu = lambda x: x
    try:
        w_noact = retry(lambda b=b2: fwd_wall(b, "id-act"), "id-act")
    finally:
        L.gelu = orig_gelu

    orig_dw = L.depthwise_conv1d
    L.depthwise_conv1d = lambda p, x, padding: x
    try:
        w_noconv = retry(lambda b=b2: fwd_wall(b, "no-conv"), "no-conv")
    finally:
        L.depthwise_conv1d = orig_dw

    orig_norm = L.adaptive_rmsnorm
    L.adaptive_rmsnorm = lambda p, x, cond: x
    try:
        w_nonorm = retry(lambda b=b2: fwd_wall(b, "no-norm"), "no-norm")
    finally:
        L.adaptive_rmsnorm = orig_norm

    print(f"b2={b2} shares: attn {(w_full - w_noattn) / w_full:.1%}  "
          f"act {(w_full - w_noact) / w_full:.1%}  "
          f"conv {(w_full - w_noconv) / w_full:.1%}  "
          f"norm {(w_full - w_nonorm) / w_full:.1%}", flush=True)

    retry(lambda b=b2: flash_iso(b), "flash-iso")
    retry(lambda b=b2: ff_iso(b), "ff-iso")
