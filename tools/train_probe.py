"""Acoustic training-step bottleneck attribution on the real chip
(VERDICT r3 item 5: raise training MFU from the unaudited ~0.34).

Measurements at recipe scale (running_command/Acous_VoMix.sh: VoMix two_one,
bs8 x 800 frames, bf16 compute):

  dispatch    bench.py-style: one host dispatch per step (what the official
              82.5 ms/step number measured). Through the axon tunnel each
              dispatch serializes at ~34 ms (CLAUDE.md), so this OVERSTATES
              the device time whenever exec < dispatch gap.
  in-jit      N steps inside ONE jitted lax.fori_loop carrying the train
              state — the true device ms/step, no tunnel in the loop.
  tanh-gelu / id-act / no-attn / no-conv ablations (same patches as
              flow_probe.py) on the in-jit loop: fwd+bwd attribution.

Run: python tools/train_probe.py  (TPU; ~3 min)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp

from covomix_tpu.models import acoustic as A
from covomix_tpu.train.loop import (TrainConfig, TrainState, acoustic_loss_fn,
                                    ema_update, init_train_state, make_optimizer,
                                    make_train_step)

DTYPE = jnp.bfloat16
B, T = 8, 800
NLOOP = 8


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
tcfg = TrainConfig(lr=1e-4)
loss_fn = acoustic_loss_fn(ac_cfg, cond_drop_prob=0.3, dtype=DTYPE)

key = jax.random.PRNGKey(0)
batch = {"x": jax.random.normal(key, (B, T, 240), jnp.float32),
         "phonemes": jax.random.randint(key, (B, T, 2), 0, 502),
         "mask": jnp.ones((B, T), bool)}
params = retry(lambda: A.init(jax.random.PRNGKey(5), ac_cfg), "init")
state0 = init_train_state(params, tcfg)

# model FLOPs for MFU (XLA cost analysis of ONE step)
step_one = make_train_step(loss_fn, tcfg, donate=False)
try:
    flops = step_one.lower(state0, batch, key).compile().cost_analysis()["flops"]
except Exception:  # noqa: BLE001
    flops = None


def mfu(ms):
    return flops / (ms / 1e3) / 197e12 if flops else float("nan")


# ---- dispatch-per-step (the bench.py pattern) -------------------------------
def dispatch_loop():
    st = init_train_state(params, tcfg)
    st, m = step_one(st, batch, jax.random.PRNGKey(6))
    float(m["loss"])
    t0 = time.time()
    for i in range(NLOOP):
        st, m = step_one(st, batch, jax.random.PRNGKey(7 + i))
    float(m["loss"])
    ms = (time.time() - t0) / NLOOP * 1e3
    print(f"dispatch: {ms:.1f} ms/step  (MFU {mfu(ms):.2f})", flush=True)
    return ms


# ---- in-jit loop: true device time ------------------------------------------
def make_injit(tag):
    tx = make_optimizer(tcfg)
    vg = jax.value_and_grad(loss_fn)

    def one(st, k):
        loss, grads = vg(st.params, batch, k)
        updates, opt_state = tx.update(grads, st.opt_state, st.params)
        p = __import__("optax").apply_updates(st.params, updates)
        ema = ema_update(st.ema_params, p, st.ema_num_updates, tcfg.ema_decay)
        return TrainState(p, opt_state, ema, st.ema_num_updates + 1, st.step + 1)

    @jax.jit
    def loop(st, k):
        def body(i, s):
            return one(s, jax.random.fold_in(k, i))
        return jax.lax.fori_loop(0, NLOOP, body, st)

    def run():
        st = init_train_state(params, tcfg)
        st = loop(st, jax.random.PRNGKey(6))
        float(jnp.float32(st.step))
        best = 1e9
        for _ in range(3):
            st = init_train_state(params, tcfg)
            t0 = time.perf_counter()
            st = loop(st, jax.random.PRNGKey(6))
            float(jnp.float32(st.step))
            best = min(best, time.perf_counter() - t0)
        ms = best / NLOOP * 1e3
        print(f"{tag}: {ms:.1f} ms/step  (MFU {mfu(ms):.2f})", flush=True)
        return ms

    return run


w_disp = retry(dispatch_loop, "dispatch")
w_full = retry(make_injit("in-jit full"), "in-jit full")

orig_gelu = jax.nn.gelu
acts = {
    "tanh-gelu": lambda x, approximate=True: orig_gelu(x, approximate=True),
    "id-act": lambda x, approximate=True: x,
}
w_act = {}
for tag, fn in acts.items():
    jax.nn.gelu = fn
    try:
        w_act[tag] = retry(make_injit(f"in-jit {tag}"), tag)
    finally:
        jax.nn.gelu = orig_gelu

orig_attend = A.attend_flash_or_xla
A.attend_flash_or_xla = lambda q, k, v, **kw: v
try:
    w_noattn = retry(make_injit("in-jit no-attn"), "no-attn")
finally:
    A.attend_flash_or_xla = orig_attend


# flash-vs-XLA at the TRAINING shape: attention is ~1.5% of step FLOPs but
# ~22% of step time, i.e. the flash fwd+bwd runs at single-digit TFLOP/s
# here (vs 18-20 isolated at serving shape). If the plain einsum bwd is
# faster at B=8/T=800, training should take the XLA path.
def xla_attend(q, k, v, key_mask=None, valid_len=None, causal=False, **kw):
    t = q.shape[-2]
    if key_mask is None and valid_len is not None:
        key_mask = jnp.arange(t)[None, :] < jnp.asarray(valid_len).reshape(-1)[:, None]
        key_mask = jnp.broadcast_to(key_mask, (q.shape[0], t))
    return LY.attend(q, k, v, key_mask=key_mask, causal=causal)


import covomix_tpu.models.layers as LY  # noqa: E402

A.attend_flash_or_xla = xla_attend
try:
    w_xlaattn = retry(make_injit("in-jit xla-attn"), "xla-attn")
finally:
    A.attend_flash_or_xla = orig_attend

import covomix_tpu.models.layers as LY

orig_conv = LY.conv1d
LY.conv1d = lambda p, x, **kw: x
try:
    w_noconv = retry(make_injit("in-jit no-conv"), "no-conv")
finally:
    LY.conv1d = orig_conv

print(f"\nsummary: dispatch-overhead {(w_disp - w_full):.1f} ms/step, "
      f"gelu-exact-vs-tanh {(w_full - w_act['tanh-gelu']) / w_full:.1%}, "
      f"all-activation {(w_full - w_act['id-act']) / w_full:.1%}, "
      f"attention(fwd+bwd) {(w_full - w_noattn) / w_full:.1%}, "
      f"xla-attn-vs-flash {(w_full - w_xlaattn) / w_full:+.1%}, "
      f"conv-pos {(w_full - w_noconv) / w_full:.1%}", flush=True)
