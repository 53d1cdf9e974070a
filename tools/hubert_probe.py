"""Attribute HuBERT MFU 0.16 (VERDICT r5 item 4; BASELINE config 3).

The bench shape is B=8 x 20 s 16 kHz chunks -> conv frontend (7 strided
convs, 320x downsample) -> 12-layer/768 post-LN encoder (T=999) -> k-means
argmin, bf16. hubert_mfu read 0.16 in BENCH_r04. Suspects:

  * encoder attention runs L.attend (XLA einsum) — materializes the f32
    [B, 12, 999, 999] probability tensor (~383 MB/layer at B=8) in HBM;
    the flow stage's one-shot Pallas kernel never sees these shapes.
  * the conv frontend's first layers run at the 16 kHz sample rate with
    tiny channel counts (1->512 @ k=10 s=5): low arithmetic intensity,
    possibly poorly tiled.

Sections (each an in-jit fori_loop, min-of-3, carry-tainted input):
  A  stage walls at the bench shape: full wav2units / frontend(+LN+proj) /
     encoder 12 layers / kmeans
  B  encoder attention: production einsum vs Pallas flash (valid_len=T)
     vs flash at padded bucket with per-row valid_len
  C  frontend conv-by-conv walls (which of the 7 convs dominates)

Run: python tools/hubert_probe.py   (real TPU, ~10 min)
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.models import hubert as H
from covomix_tpu.models import layers as L
from covomix_tpu.ops.flash_attention import flash_attention

B, SECONDS = 8, 20
DTYPE = jnp.bfloat16
cfg = H.HubertConfig()


def retry(fn, what, attempts=8):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a == attempts - 1:
                print(f"{what}: FAILED {str(e)[:200]}", flush=True)
                return None
            print(f"# {what} attempt {a} failed ({str(e)[:100]}); retrying", flush=True)
            time.sleep(15 * (a + 1))


def timed(fn, *args, iters=8, label=""):
    """fn(carry_scalar, *args) -> scalar; loops inside ONE jit."""

    @jax.jit
    def loop(*a):
        def body(i, c):
            return fn(c, *a)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))

    r = loop(*args)
    float(r)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        float(loop(*args))
        best = min(best, time.perf_counter() - t0)
    ms = best / iters * 1e3
    print(f"{label}: {ms:.2f} ms", flush=True)
    return ms


def flops_of(jitted, *args, **kw):
    return jitted.lower(*args, **kw).compile().cost_analysis()["flops"]


def main():
    retry(lambda: float(jnp.float32(jax.random.normal(jax.random.PRNGKey(0), (8, 8))[0, 0])),
          "first op", attempts=10)
    print(f"# platform={jax.devices()[0].platform} B={B} seconds={SECONDS} dtype=bf16",
          flush=True)
    params = retry(lambda: jax.jit(H.init, static_argnums=1)(jax.random.PRNGKey(3), cfg),
                   "init")
    wav = jax.random.normal(jax.random.PRNGKey(1), (B, SECONDS * 16000), jnp.float32)
    frames = H.num_output_frames(cfg, wav.shape[1])
    print(f"# frames={frames}", flush=True)

    # ---------------- A: stage walls ----------------------------------------
    def full(c, p, w):
        ids = H.wav2units_jit(p, cfg, w + c, dtype=DTYPE)
        return ids.ravel()[0].astype(jnp.float32) * 1e-9

    def frontend(c, p, w):
        f = H.conv_frontend(p, cfg, w + c, DTYPE)
        f = L.layernorm(p["layer_norm"], f)
        x = L.linear(p["post_extract_proj"], f)
        return x.ravel()[0].astype(jnp.float32) * 1e-9

    feats = jax.jit(lambda p, w: L.linear(
        p["post_extract_proj"], L.layernorm(p["layer_norm"], H.conv_frontend(p, cfg, w, DTYPE))))(params, wav)
    print(f"# feats {feats.shape} {feats.dtype}", flush=True)

    def encoder(c, p, x):
        h = x + c
        pos = L.conv1d(p["pos_conv"], h, padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
        if cfg.conv_pos % 2 == 0:
            pos = pos[:, :-1]
        h = h + L.gelu(pos)
        h = L.layernorm(p["encoder_layer_norm"], h)
        for li in range(cfg.output_layer):
            h = H._encoder_layer(p["layers"][li], h, cfg.encoder_heads)
        return h.ravel()[0].astype(jnp.float32) * 1e-9

    def kmeans(c, p, x):
        ids = H.kmeans_assign(p, x + c)
        return ids.ravel()[0].astype(jnp.float32) * 1e-9

    w_full = retry(lambda: timed(full, params, wav, label="A full wav2units"), "full")
    retry(lambda: timed(frontend, params, wav, label="A frontend+LN+proj"), "frontend")
    retry(lambda: timed(encoder, params, feats, label="A encoder x12"), "encoder")
    retry(lambda: timed(kmeans, params, feats, label="A kmeans"), "kmeans")
    if w_full:
        one = jax.jit(lambda p, w: H.wav2units_jit(p, cfg, w, dtype=DTYPE))
        fl = flops_of(one, params, wav)
        print(f"A model flops/call {fl/1e9:.1f} GF -> full MFU "
              f"{fl / (w_full/1e3) / 1e12 / 197:.3f} (v5e 197 peak)", flush=True)

    # ---------------- B: encoder attention variants --------------------------
    d, hds = cfg.encoder_embed_dim, cfg.encoder_heads
    lp = params["layers"][0]
    x = feats

    def attn_einsum(c, lp, x):
        h = x + c
        q = L.split_heads(L.linear(lp["q"], h), hds)
        k = L.split_heads(L.linear(lp["k"], h), hds)
        v = L.split_heads(L.linear(lp["v"], h), hds)
        a = L.merge_heads(L.attend(q, k, v))
        return a.ravel()[0].astype(jnp.float32) * 1e-9

    def attn_flash(c, lp, x):
        h = x + c
        q = L.split_heads(L.linear(lp["q"], h), hds)
        k = L.split_heads(L.linear(lp["k"], h), hds)
        v = L.split_heads(L.linear(lp["v"], h), hds)
        a = L.merge_heads(flash_attention(q, k, v, valid_len=h.shape[1]))
        return a.ravel()[0].astype(jnp.float32) * 1e-9

    retry(lambda: timed(attn_einsum, lp, x, label="B attn block einsum (prod)"), "einsum")
    retry(lambda: timed(attn_flash, lp, x, label="B attn block flash"), "flash")

    # ---------------- C: frontend conv-by-conv -------------------------------
    xs = wav.astype(DTYPE)[..., None]
    for i, ((dim, k, s), clp) in enumerate(zip(cfg.conv_layers, params["conv_layers"])):
        def conv_i(c, clp, xin, s=s):
            y = L.conv1d(clp, xin + c, stride=s, padding="VALID")
            return y.ravel()[0].astype(jnp.float32) * 1e-9

        retry(lambda cl=clp, xi=xs: timed(conv_i, cl, xi,
                                          label=f"C conv{i} {xs.shape[1]}x{xs.shape[2]}->k{k}s{s}x{dim}"),
              f"conv{i}")
        xs = jax.jit(functools.partial(L.conv1d, stride=s, padding="VALID"))(clp, xs)
        xs = jax.block_until_ready(xs)


if __name__ == "__main__":
    main()
