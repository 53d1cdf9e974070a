"""Flow-stage bottleneck attribution on the real chip.

attn_sweep showed the flash kernel config moves flow wall 0% at B=4 and
B=16, so the time goes elsewhere. This probe times ONE CFG field eval
(A.forward at the serving shape) under targeted ablations:

  full        the production forward (bf16)
  no-attn     attention replaced by identity (upper bound on what ANY
              attention speedup could save)
  tanh-gelu   jax.nn.gelu patched to approximate=True (erf -> tanh; the
              VPU-transcendental suspect — 8 layers x [2B,912,4096] erf
              evals per field eval)
  sig-gelu    gelu replaced by x*sigmoid(1.702x) (quick-gelu: ONE cheap
              transcendental instead of erf's polynomial chain)
  id-act      gelu replaced by identity (upper bound on ALL activation cost)
  no-conv     depthwise conv-pos embed replaced by identity (k=31 depthwise
              runs on the VPU, not the MXU — the layout suspect)
  matmul-sol  a bare bf16 matmul chain moving the same FLOPs (the
              speed-of-light reference for this stack)

Run: python tools/flow_probe.py  (TPU; ~2 min)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.models import acoustic as A
from covomix_tpu.ops import flash_attention as FA

T = 912
DTYPE = jnp.bfloat16


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


def fwd_wall(b2, tag, iters=8):
    """One field eval: forward on the CFG-doubled batch, looped in-jit."""
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
    print(f"{tag}: b2={b2} {per * 1e3:.2f} ms/eval ({per * 32:.3f} s per 16-step sample)",
          flush=True)
    return per


for b2 in (8, 32):
    w_full = retry(lambda b=b2: fwd_wall(b, "full"), "full")

    # --- attention ablated (identity): upper bound of ANY attention speedup
    orig_attend = A.attend_flash_or_xla
    A.attend_flash_or_xla = lambda q, k, v, **kw: v
    try:
        w_noattn = retry(lambda b=b2: fwd_wall(b, "no-attn"), "no-attn")
    finally:
        A.attend_flash_or_xla = orig_attend

    # --- activation variants (patch jax.nn.gelu, which every call site uses)
    orig_gelu = jax.nn.gelu
    acts = {
        "tanh-gelu": lambda x, approximate=True: orig_gelu(x, approximate=True),
        "sig-gelu": lambda x, approximate=True: x * jax.nn.sigmoid(1.702 * x),
        "id-act": lambda x, approximate=True: x,
    }
    w_act = {}
    for tag, fn in acts.items():
        jax.nn.gelu = fn
        try:
            w_act[tag] = retry(lambda b=b2, t=tag: fwd_wall(b, t), tag)
        finally:
            jax.nn.gelu = orig_gelu

    # --- depthwise conv-pos embed ablated
    import covomix_tpu.models.layers as LY
    orig_conv = LY.conv1d
    LY.conv1d = lambda p, x, **kw: x
    try:
        w_noconv = retry(lambda b=b2: fwd_wall(b, "no-conv"), "no-conv")
    finally:
        LY.conv1d = orig_conv

    print(f"b2={b2}: attention share {(w_full - w_noattn) / w_full:.1%}, "
          f"gelu-exact-vs-tanh {(w_full - w_act['tanh-gelu']) / w_full:.1%}, "
          f"gelu-exact-vs-sig {(w_full - w_act['sig-gelu']) / w_full:.1%}, "
          f"all-activation {(w_full - w_act['id-act']) / w_full:.1%}, "
          f"conv-pos {(w_full - w_noconv) / w_full:.1%}", flush=True)

# --- speed-of-light: bare bf16 matmul chain at the dominant shape
M, K, N = 32 * 912, 1024, 4096


def matmul_sol():
    a = jax.random.normal(jax.random.PRNGKey(5), (M, K)).astype(DTYPE)
    w1 = jax.random.normal(jax.random.PRNGKey(6), (K, N)).astype(DTYPE)
    w2 = jax.random.normal(jax.random.PRNGKey(7), (N, K)).astype(DTYPE)

    @jax.jit
    def loop(a):
        def body(i, c):
            return (c @ w1 @ w2) * 1e-3
        return jax.lax.fori_loop(0, 20, body, a)

    r = loop(a)
    float(jnp.float32(r[0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = loop(a)
        float(jnp.float32(r[0, 0]))
        best = min(best, time.perf_counter() - t0)
    fl = 2 * 2 * M * K * N * 20
    print(f"matmul-sol: {fl / best / 1e12:.1f} TFLOP/s "
          f"({fl / best / 1e12 / 197 * 100:.0f}% of v5e bf16 peak)", flush=True)


retry(matmul_sol, "matmul sol")
