"""Depthwise-conv + attention fwd/bwd micro-probe at the acoustic train shape.

train_probe.py attributed ~30% of the train step to the k=31 depthwise
conv-pos embed (whose FORWARD is ~0% of the flow eval — so its XLA BACKWARD
must be pathological: depthwise conv grads lower to grouped convs that TPU
handles badly) and ~42% to attention fwd+bwd. This isolates both:

  conv-xla        lax.conv_general_dilated feature_group_count=D, fwd and vjp
  conv-shift      shift-and-add formulation: out = sum_k xp[:, k:k+T] * w[k]
                  — 31 fused VPU FMAs, whose autodiff is again shift-and-add
  attn fwd/bwd    production flash kernel at [8,16,800,64]

Run: python tools/conv_probe.py  (TPU, ~3 min)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp

B, T, D, K = 8, 800, 1024, 31
DTYPE = jnp.bfloat16


def retry(fn, what, attempts=6):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a == attempts - 1:
                raise
            print(f"# {what} attempt {a} failed ({str(e)[:120]}); retrying", flush=True)
            time.sleep(15 * (a + 1))


def bench(fn, args, tag, iters=32):
    @jax.jit
    def loop(*args):
        def body(i, c):
            r = fn(*((a + c * 1e-12 if a.dtype != jnp.int32 else a) for a in args))
            leaf = jax.tree_util.tree_leaves(r)[0]
            return jnp.float32(leaf.ravel()[0])
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    retry(lambda: float(loop(*args)), tag)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{tag}: {ms:.2f} ms", flush=True)
    return ms


def conv_xla(w, x):
    return jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), window_strides=(1,), padding=[(K // 2, K // 2)],
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=D)


def conv_shift(w, x):
    # w [K, 1, D] -> per-tap scale; xp padded along T
    xp = jnp.pad(x, ((0, 0), (K // 2, K // 2), (0, 0)))
    out = jnp.zeros_like(x)
    for kk in range(K):
        out = out + jax.lax.dynamic_slice_in_dim(xp, kk, T, axis=1) * w[kk, 0].astype(x.dtype)
    return out


def main():
    print(f"platform={jax.devices()[0].platform}", flush=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, T, D), jnp.float32).astype(DTYPE)
    w = jax.random.normal(jax.random.PRNGKey(1), (K, 1, D), jnp.float32) * 0.1

    import numpy as np
    d = np.abs(np.asarray(conv_xla(w, x) - conv_shift(w, x), np.float32)).max()
    print(f"conv parity max|Δ| = {d:.2e}", flush=True)

    for name, f in (("conv-xla", conv_xla), ("conv-shift", conv_shift)):
        bench(lambda w, x, f=f: f(w, x), (w, x), f"{name} fwd")

        def vg(w, x, f=f):
            loss, grads = jax.value_and_grad(
                lambda w, x: jnp.sum(jnp.square(f(w, x))), argnums=(0, 1))(w, x)
            return grads

        bench(vg, (w, x), f"{name} fwd+bwd")

    # attention at the train shape
    from covomix_tpu.ops.flash_attention import flash_attention

    q = jax.random.normal(key, (B, 16, T, 64), jnp.float32).astype(DTYPE)

    bench(lambda q: flash_attention(q, q, q), (q,), "attn fwd")
    bench(lambda q: jax.grad(lambda q: jnp.sum(jnp.square(
        flash_attention(q, q, q).astype(jnp.float32))))(q), (q,), "attn fwd+bwd")


if __name__ == "__main__":
    main()
