"""Flash-attention config sweep at the serving shape + full flow-stage A/B.

Run on the real TPU (`python tools/attn_sweep.py`): measures TFLOP/s of the
isolated kernel for candidate (block_q, block_k, head_block) configs at the
VoMix serving shape (B=8 CFG-doubled, H=16, T=912, dh=64, bf16), then times
the full flow stage with the best config vs the committed defaults
(ops/flash_attention.py DEFAULT_*). Retries first device ops through tunnel
flakes. Methodology notes live in NOTES_r2/r3.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax, jax.numpy as jnp, numpy as np
from covomix_tpu.ops import flash_attention as FA

B, H, T, DH = 8, 16, 912, 64
dtype = jnp.bfloat16


def retry(fn, what, attempts=8):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:
            if a == attempts - 1:
                raise
            print(f"# {what} attempt {a} failed ({str(e)[:100]}); retrying", flush=True)
            time.sleep(20 * (a + 1))


def _first_ops():
    q = jax.device_put(np.random.RandomState(0).randn(B, H, T, DH).astype(np.float32)).astype(dtype)
    k = jax.device_put(np.random.RandomState(1).randn(B, H, T, DH).astype(np.float32)).astype(dtype)
    v = jax.device_put(np.random.RandomState(2).randn(B, H, T, DH).astype(np.float32)).astype(dtype)
    float(jnp.float32(q[0, 0, 0, 0]))  # force the transfer now, inside the retry
    return q, k, v

q, k, v = retry(_first_ops, "first ops", attempts=12)
key = jax.random.PRNGKey(0)
valid = jnp.array([T], jnp.int32)

ITERS = 30
flops = 4 * B * H * 1024 * 1024 * DH  # padded T -> 1024


def bench_cfg(bq, bk, hb):
    @jax.jit
    def loop(q, k, v):
        def body(i, carry):
            qq = q + carry[0, 0, 0, 0] * 1e-12  # taint so XLA can't hoist
            o = FA.flash_attention(qq, k, v, valid_len=valid, block_q=bq, block_k=bk, head_block=hb)
            return o
        return jax.lax.fori_loop(0, ITERS, body, q)

    try:
        r = loop(q, k, v)
        float(jnp.float32(r[0, 0, 0, 0]))  # sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(q, k, v)
            float(jnp.float32(r[0, 0, 0, 0]))
            best = min(best, time.perf_counter() - t0)
        tf = flops * ITERS / best / 1e12
        print(f"bq={bq} bk={bk} hb={hb}: {best*1e3/ITERS:.3f} ms/call, {tf:.1f} TFLOP/s", flush=True)
        return tf
    except Exception as e:
        print(f"bq={bq} bk={bk} hb={hb}: FAILED {str(e)[:200]}", flush=True)
        return 0.0


if "--flow-only" in sys.argv:
    # isolated sweep already captured (2026-08-18: best (512,512,4) at
    # 20.3 TFLOP/s vs default (1024,512,2) 18.4 same-day; hb=8 and
    # (1024,256,4) overflow scoped VMEM and fail to compile)
    best_cfg = (512, 512, 4)
else:
    print("== isolated kernel sweep (B=8 H=16 T=912 dh=64 bf16) ==", flush=True)
    results = {}
    for cfg in [(1024, 512, 2), (512, 512, 2), (512, 512, 4), (512, 256, 4), (512, 256, 8),
                (1024, 256, 2), (1024, 256, 4), (512, 128, 8), (256, 256, 8), (256, 512, 4)]:
        results[cfg] = retry(lambda c=cfg: bench_cfg(*c), f"cfg {cfg}")

    best_cfg = max(results, key=results.get)
    print(f"best: {best_cfg} at {results[best_cfg]:.1f} TFLOP/s", flush=True)

# --- full flow stage A/B: current defaults vs best config
from covomix_tpu.models import acoustic as A

print(f"platform={jax.devices()[0].platform} kind={jax.devices()[0].device_kind}",
      flush=True)

ac_cfg = A.AcousticConfig(dim_in=160, dim=1024, depth=8, heads=16, dim_head=64,
                          num_phoneme_tokens=502, mode="two_one")
params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), ac_cfg)

def flow_wall(tag, B=4):
    ph = jax.random.randint(key, (B, T, 2), 0, 502)
    cond = jax.random.normal(key, (B, T, 160), jnp.float32)
    fn = jax.jit(functools.partial(A.sample, cfg=ac_cfg, cond_scale=0.7, dtype=dtype))
    r = fn(params, key=jax.random.PRNGKey(2), phoneme_ids=ph, cond=cond)
    float(jnp.float32(r[0, 0, 0]))
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        r = fn(params, key=jax.random.PRNGKey(3), phoneme_ids=ph, cond=cond)
        float(jnp.float32(r[0, 0, 0]))
        best = min(best, time.perf_counter() - t0)
    print(f"flow stage B={B} ({tag}): {best:.3f} s", flush=True)
    return best

# A/B at the bench headline (B=4) AND at B=16, where flow MFU drops from
# 0.42 to 0.35 (BENCH_LAST_GOOD batch_scaling) — checks whether the
# degradation tracks the attention kernel or the surrounding matmuls
_orig = FA.flash_attention
for B in (4, 16):
    w0 = retry(lambda B=B: flow_wall(
        f"defaults {FA.DEFAULT_BLOCK_Q}/{FA.DEFAULT_BLOCK_K}/hb{FA.DEFAULT_HEAD_BLOCK}", B),
        "flow default")
    # flash_attention's defaults bind at call sites through the module global;
    # patch it so attend_flash_or_xla picks up the candidate config
    FA.flash_attention = functools.partial(_orig, block_q=best_cfg[0], block_k=best_cfg[1],
                                           head_block=best_cfg[2])
    w1 = retry(lambda B=B: flow_wall(f"best {best_cfg}", B), "flow best")
    FA.flash_attention = _orig
    print(f"flow delta B={B}: {w0:.3f} -> {w1:.3f} s ({(w0-w1)/w0*100:.1f}%)", flush=True)
