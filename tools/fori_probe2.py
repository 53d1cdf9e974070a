"""fori_probe follow-up: capture the FULL fori_loop failure + run remaining
variants individually (VERDICT r5 item 5). See tools/fori_probe.py for the
hypothesis list; this script exists because the TPU backend rejected the
fori_loop variant with a bare InvalidArgument and we need the whole message.

Run: python tools/fori_probe2.py [variant ...]   (default: all)
"""
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import optax

from covomix_tpu.models import acoustic as A
from covomix_tpu.train.loop import (TrainConfig, TrainState, acoustic_loss_fn,
                                    ema_update, init_train_state, make_optimizer)

NSTEPS = 4
DTYPE = jnp.bfloat16


def main():
    variants = sys.argv[1:] or ["fori", "fori-noema", "scan", "unroll"]
    float(jnp.float32(jax.random.normal(jax.random.PRNGKey(0), (4, 4))[0, 0]))
    print(f"# platform={jax.devices()[0].platform} nsteps={NSTEPS} variants={variants}",
          flush=True)

    ac_cfg = A.AcousticConfig(dim_in=160, dim=1024, depth=8, heads=16, dim_head=64,
                              num_phoneme_tokens=502, mode="two_one")
    tcfg = TrainConfig(lr=1e-4)
    loss_fn = acoustic_loss_fn(ac_cfg, cond_drop_prob=0.3, dtype=DTYPE)
    key = jax.random.PRNGKey(5)
    params = jax.jit(A.init, static_argnums=1)(key, ac_cfg)
    batch = {
        "x": jax.random.normal(key, (8, 800, 240), jnp.float32),
        "phonemes": jax.random.randint(key, (8, 800, 2), 0, 502),
        "mask": jnp.ones((8, 800), bool),
    }
    tx = make_optimizer(tcfg)
    vg = jax.value_and_grad(loss_fn)

    def step_math(state, key):
        loss, grads = vg(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, p, state.ema_num_updates, tcfg.ema_decay)
        return TrainState(p, opt_state, ema, state.ema_num_updates + 1, state.step + 1), loss

    def bench_injit(mk_loop, label):
        state = init_train_state(params, tcfg)
        loop = jax.jit(mk_loop)
        try:
            r = loop(state, jax.random.PRNGKey(6))
            float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        except Exception:
            print(f"{label}: FAILED\n{traceback.format_exc()}", flush=True)
            return
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(state, jax.random.PRNGKey(6))
            float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        print(f"{label}: {best / NSTEPS * 1e3:.1f} ms/step", flush=True)

    def fori_full(state, key):
        def body(i, carry):
            st, _ = carry
            return step_math(st, jax.random.fold_in(key, i))
        st, loss = jax.lax.fori_loop(0, NSTEPS, body, (state, jnp.float32(0)))
        return loss, st.step

    def fori_noema(state, key):
        def body(i, carry):
            p, opt, _ = carry
            loss, grads = vg(p, batch, jax.random.fold_in(key, i))
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss
        p, opt, loss = jax.lax.fori_loop(
            0, NSTEPS, body, (state.params, state.opt_state, jnp.float32(0)))
        return loss, jax.tree_util.tree_leaves(p)[0].ravel()[0]

    def scan_full(state, key):
        def body(st, k):
            st2, loss = step_math(st, k)
            return st2, loss
        st, losses = jax.lax.scan(body, state, jax.random.split(key, NSTEPS))
        return losses[-1], st.step

    def unroll(state, key):
        loss = jnp.float32(0)
        for i in range(NSTEPS):
            state, loss = step_math(state, jax.random.fold_in(key, i))
        return loss, state.step

    def bench_multi():
        """The PRODUCTION make_multi_step (train/loop.py) at NSTEPS, fed
        stacked copies of the batch — validates the committed feature, not
        just the probe's hand-rolled unroll."""
        from covomix_tpu.train.loop import make_multi_step
        state = init_train_state(params, tcfg)
        stepK = make_multi_step(loss_fn, tcfg, NSTEPS)
        stacked = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(x[None], (NSTEPS,) + x.shape), batch)
        try:
            state, m = stepK(state, stacked, jax.random.PRNGKey(6))
            float(m["loss"][-1])
        except Exception:
            print(f"multi: FAILED\n{traceback.format_exc()}", flush=True)
            return
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            state, m = stepK(state, stacked, jax.random.PRNGKey(6))
            float(m["loss"][-1])
            best = min(best, time.perf_counter() - t0)
        print(f"multi (make_multi_step, donated): {best / NSTEPS * 1e3:.1f} ms/step", flush=True)

    table = {"fori": fori_full, "fori-noema": fori_noema,
             "scan": scan_full, "unroll": unroll}
    for v in variants:
        if v == "multi":
            bench_multi()
        else:
            bench_injit(table[v], v)


if __name__ == "__main__":
    main()
