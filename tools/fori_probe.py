"""Explain the dispatch-vs-fori_loop 38% training anomaly (VERDICT r5 item 5).

NOTES_r4.md:97-101: the acoustic train step measures 74 ms dispatch-style but
102 ms as an in-jit lax.fori_loop carrying TrainState. Hypotheses:

  H_copy    while-loop carries can't alias in-place like donated dispatch
            buffers -> a full TrainState copy (params + adam m/v + ema,
            ~4x model bytes f32) every iteration.
            Split: carry (params, opt) WITHOUT ema / WITHOUT opt -> the gap
            should shrink proportionally to carried bytes if H_copy.
  H_loop    the while-loop construct itself compiles the body worse
            (layout pinning across the loop boundary, lost fusions).
            Split: python-UNROLLED steps inside one jit (no lax loop): if
            unrolled matches dispatch, the loop construct is the cost; if
            unrolled is also slow, in-jit sequencing generally is.
  H_scan    scan vs fori_loop codegen difference.

Variants (acoustic recipe shape bs8 x 800, bf16 compute, min-of-3):
  disp          per-step dispatch, donate=False  [bench baseline ~74 ms]
  disp-donate   per-step dispatch, donate=True
  fori          lax.fori_loop, full TrainState carry [~102 ms in r4]
  fori-noema    fori_loop carrying (params, opt) only; ema math removed
  fori-nometr   fori_loop, no loss/gnorm in carry (state only)
  scan          lax.scan over steps, full carry
  unroll        python-unrolled nsteps inside ONE jit, full state threaded

Run: python tools/fori_probe.py   (real TPU, ~15 min with compiles)
"""
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import optax

from covomix_tpu.models import acoustic as A
from covomix_tpu.train.loop import (TrainConfig, TrainState, acoustic_loss_fn,
                                    ema_update, init_train_state, make_optimizer,
                                    make_train_step)

NSTEPS = 4
DTYPE = jnp.bfloat16


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


def main():
    retry(lambda: float(jnp.float32(jax.random.normal(jax.random.PRNGKey(0), (4, 4))[0, 0])),
          "first op", attempts=10)
    print(f"# platform={jax.devices()[0].platform} nsteps={NSTEPS}", flush=True)

    ac_cfg = A.AcousticConfig(dim_in=160, dim=1024, depth=8, heads=16, dim_head=64,
                              num_phoneme_tokens=502, mode="two_one")
    tcfg = TrainConfig(lr=1e-4)
    loss_fn = acoustic_loss_fn(ac_cfg, cond_drop_prob=0.3, dtype=DTYPE)
    key = jax.random.PRNGKey(5)
    params = retry(lambda: jax.jit(A.init, static_argnums=1)(key, ac_cfg), "init")
    batch = {
        "x": jax.random.normal(key, (8, 800, 240), jnp.float32),
        "phonemes": jax.random.randint(key, (8, 800, 2), 0, 502),
        "mask": jnp.ones((8, 800), bool),
    }
    nbytes = sum(x.nbytes for x in jax.tree_util.tree_leaves(params))
    print(f"# params {nbytes/1e6:.0f} MB -> TrainState ~{4*nbytes/1e6:.0f} MB f32", flush=True)
    tx = make_optimizer(tcfg)
    vg = jax.value_and_grad(loss_fn)

    def bench_dispatch(donate):
        state = init_train_state(params, tcfg)
        step = make_train_step(loss_fn, tcfg, donate=donate)
        state, m = step(state, batch, jax.random.PRNGKey(6))
        float(m["loss"])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            for i in range(NSTEPS):
                state, m = step(state, batch, jax.random.PRNGKey(7 + i))
            float(m["loss"])
            best = min(best, time.perf_counter() - t0)
        del state
        return best / NSTEPS * 1e3

    def step_math(state, key):
        loss, grads = vg(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        p = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, p, state.ema_num_updates, tcfg.ema_decay)
        return TrainState(p, opt_state, ema, state.ema_num_updates + 1, state.step + 1), loss

    def bench_injit(mk_loop, label):
        state = init_train_state(params, tcfg)
        loop = jax.jit(mk_loop)
        r = loop(state, jax.random.PRNGKey(6))
        jax.tree_util.tree_map(lambda x: None, r)
        float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = loop(state, jax.random.PRNGKey(6))
            float(jnp.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0])
            best = min(best, time.perf_counter() - t0)
        del state, r
        return best / NSTEPS * 1e3

    for donate in (False, True):
        ms = retry(lambda d=donate: bench_dispatch(d), f"disp donate={donate}")
        if ms:
            print(f"disp donate={donate}: {ms:.1f} ms/step", flush=True)

    # ---- fori full carry ----------------------------------------------------
    def fori_full(state, key):
        def body(i, carry):
            st, _ = carry
            return step_math(st, jax.random.fold_in(key, i))
        st, loss = jax.lax.fori_loop(0, NSTEPS, body, (state, jnp.float32(0)))
        return loss, st.step

    ms = retry(lambda: bench_injit(fori_full, "fori"), "fori")
    if ms:
        print(f"fori full-carry: {ms:.1f} ms/step", flush=True)

    # ---- fori without EMA (smaller carry; ema math removed) -----------------
    def fori_noema(state, key):
        def body(i, carry):
            p, opt, _ = carry
            loss, grads = vg(p, batch, jax.random.fold_in(key, i))
            updates, opt = tx.update(grads, opt, p)
            return optax.apply_updates(p, updates), opt, loss
        p, opt, loss = jax.lax.fori_loop(
            0, NSTEPS, body, (state.params, state.opt_state, jnp.float32(0)))
        return loss, jax.tree_util.tree_leaves(p)[0].ravel()[0]

    ms = retry(lambda: bench_injit(fori_noema, "fori-noema"), "fori-noema")
    if ms:
        print(f"fori no-ema carry: {ms:.1f} ms/step", flush=True)

    # ---- scan ---------------------------------------------------------------
    def scan_full(state, key):
        def body(st, k):
            st2, loss = step_math(st, k)
            return st2, loss
        st, losses = jax.lax.scan(body, state, jax.random.split(key, NSTEPS))
        return losses[-1], st.step

    ms = retry(lambda: bench_injit(scan_full, "scan"), "scan")
    if ms:
        print(f"scan full-carry: {ms:.1f} ms/step", flush=True)

    # ---- python-unrolled in one jit ------------------------------------------
    def unroll(state, key):
        loss = jnp.float32(0)
        for i in range(NSTEPS):
            state, loss = step_math(state, jax.random.fold_in(key, i))
        return loss, state.step

    ms = retry(lambda: bench_injit(unroll, "unroll"), "unroll")
    if ms:
        print(f"unrolled in-jit: {ms:.1f} ms/step", flush=True)


if __name__ == "__main__":
    main()
