"""Speculative-decode acceptance + tokens/s vs greedy `generate` on the chip.

VERDICT r3 item 6's measurement half: the two-output (CoMix) speculative
decoder's output equals greedy generate exactly (tests/test_speculative.py),
so the only open question is throughput — which depends on draft acceptance,
i.e. on how well the early-exit head is trained. This tool measures BOTH ends:

  floor    random weights (acceptance near 1/vocab — every verify round
           accepts just the bonus token, the worst case);
  realistic a short self-supervised fit on a synthetic text->token pattern
           (a few hundred steps, trained with the same forward_loss that
           trains the production ee heads) so the full model and the draft
           heads agree on a peaked distribution, standing in for a
           converged checkpoint's agreement rate.

Reference scale (running_command/TTS_CoMix.sh shapes): dim 512, 4+4 depth,
two_output, early-exit at layer 2, gamma 4. Run on the real TPU:
    python tools/spec_bench.py [--skip-train]
Results land in NOTES_r4.md's speedup table.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")
import covomix_tpu.util.jaxcache  # noqa: F401
import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.models import text2semantic as T

DTYPE = jnp.bfloat16
MAXLEN = 512
GAMMA = 4


def retry(fn, what, attempts=8):
    for a in range(attempts):
        try:
            return fn()
        except Exception as e:  # noqa: BLE001
            if a == attempts - 1:
                raise
            print(f"# {what} attempt {a} failed ({str(e)[:100]}); retrying", flush=True)
            time.sleep(20 * (a + 1))


def wall(fn, *args, n=3, **kw):
    r = fn(*args, **kw)
    int(np.asarray(r.num_steps))  # host fetch = sync (block_until_ready lies here)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        r = fn(*args, **kw)
        int(np.asarray(r.num_steps))
        best = min(best, time.perf_counter() - t0)
    return best, r


def ee_agreement(params, cfg, text, tgt):
    """Teacher-forced argmax agreement between the early-exit draft heads and
    the full-depth heads — the direct upper bound on draft acceptance."""
    from covomix_tpu.models import layers as L

    t1 = tgt[..., 0]
    t2 = tgt[..., 1]
    src = T.S.set_eos_id(text, cfg.text_eos_id, cfg.text_pad_id)
    smask = src != cfg.text_pad_id
    context = T.encode_source(params, cfg, T.embed_source(params, cfg, src, DTYPE), smask, DTYPE)
    start = jnp.broadcast_to(params["start_speech"].astype(DTYPE), (t1.shape[0], 1, cfg.target_dim))
    x = jnp.concatenate([start, T._embed_target(params, cfg, t1, t2, DTYPE)], axis=1)
    dec_mask = jnp.ones(x.shape[:2], bool)
    hiddens = []
    for lp in params["target_layers"]:
        x = T._self_attn_full(lp["self_attn"], x, cfg.heads, mask=dec_mask, causal=True) + x
        ckv = T._context_kv(lp["cross_attn"], context, cfg.heads)
        x = T._cross_attn(lp["cross_attn"], x, ckv, cfg.heads, context_mask=smask) + x
        x = T._ff(lp["ff"], x) + x
        hiddens.append(x)
    xf = L.rmsnorm(params["target_final_norm"], x)
    half = cfg.target_dim // 2
    f1 = jnp.argmax(T._sem_logits(params, xf[..., :half], DTYPE), axis=-1)
    f2 = jnp.argmax(T._sem_logits(params, xf[..., half:], DTYPE), axis=-1)
    early = hiddens[cfg.target_early_exit_layer - 1]
    ee = params["early_exit"]
    hn = L.rmsnorm(ee["norm"], early + T._ff(ee["ff"], early))
    d1 = jnp.argmax(L.linear(ee["to_logits"], hn).astype(jnp.float32), axis=-1)
    d2 = jnp.argmax(L.linear(ee["to_logits2"], hn).astype(jnp.float32), axis=-1)
    a1 = float(jnp.mean((d1 == f1).astype(jnp.float32)))
    a2 = float(jnp.mean((d2 == f2).astype(jnp.float32)))
    print(f"# ee-vs-full teacher-forced argmax agreement: stream1 {a1:.1%} stream2 {a2:.1%}",
          flush=True)


def measure(params, cfg, src, tag, gamma=GAMMA, dtype=None):
    dtype = DTYPE if dtype is None else dtype
    b = src.shape[0]
    # same stopping rule for both paths (greedy EOS) — min_length would force
    # greedy to decode MAXLEN while spec stops at EOS, skewing the comparison
    gen = jax.jit(functools.partial(
        T.generate, cfg=cfg, max_length=MAXLEN, temperature=1e-10, top_k_thres=1.0,
        dtype=dtype))
    spec = jax.jit(functools.partial(
        T.generate_speculative, cfg=cfg, max_length=MAXLEN, gamma=gamma, dtype=dtype))

    wg, rg = retry(lambda: wall(lambda: gen(params, key=jax.random.PRNGKey(0), source_ids=src)),
                   f"{tag} greedy")
    ws, rs = retry(lambda: wall(lambda: spec(params, source_ids=src)), f"{tag} spec")
    # decoded positions per row (min over streams — the usable dialogue length)
    lens = np.minimum(np.asarray(rs.lengths), np.asarray(rs.lengths2)).astype(np.float64)
    iters = float(np.asarray(rs.num_steps))
    # per verify round each ACTIVE row advances n_acc+1 positions; average
    # accepted drafts per round (the acceptance-rate proxy):
    per_round = float(lens.mean()) / max(iters, 1.0)
    acc_rate = max(0.0, (per_round - 1.0) / gamma)
    gtoks = float(np.minimum(np.asarray(rg.lengths), np.asarray(rg.lengths2)).sum())
    stoks = float(lens.sum())
    print(f"{tag}: B={b} greedy {wg:.3f}s ({gtoks / wg:.0f} tok/s, "
          f"{int(np.asarray(rg.num_steps))} steps) | spec {ws:.3f}s "
          f"({stoks / ws:.0f} tok/s, {iters:.0f} rounds, {per_round:.2f} tok/round, "
          f"acceptance {acc_rate:.1%}) | speedup x{(gtoks / wg and (stoks / ws) / (gtoks / wg)):.2f}",
          flush=True)


def synthetic_batch(key, cfg, b, s, t, length=None):
    """Deterministic, fully DECODABLE pattern: token[i] = (7 + i) % vocab for
    i < `length`, then pad — so forward_loss's set_eos_id trains an EOS at the
    fixed position `length`, which is also purely positional, hence decodable —
    same on both streams. Purely positional on purpose — an earlier variant
    derived the start offset from sum(text), which greedy decode cannot infer
    at position 0; the decode then leaves the training distribution at step 0
    and ee/full argmax diverge on the degenerate trajectory, reading as 0%
    acceptance even though the decoder is exact (verified: the positional
    pattern reaches 5.00 tok/round = gamma+1, i.e. 100% acceptance).

    The trained EOS is the fix for the r4 CHIP-SCALE anomaly (0% acceptance at
    MAXLEN=512): the earlier task had no pad anywhere, so no EOS was ever
    trained, greedy could not stop, and the decode ran MAXLEN >> trained-length
    steps — every position past t is rotary EXTRAPOLATION where the draft and
    full heads have no reason to agree, so measured acceptance collapsed
    toward 0 (~1.2 tok/round) even though in-distribution teacher-forced
    agreement read 98%. Scale (bench MAXLEN 512 vs CPU-diagnostic 96) was the
    whole difference between the 'contradictory' readings."""
    ktxt, = jax.random.split(key, 1)
    length = t - 16 if length is None else length
    text = jax.random.randint(ktxt, (b, s), 1, 100)
    tgt = (7 + jnp.arange(t)) % cfg.num_semantic_tokens
    tgt = jnp.where(jnp.arange(t) < length, tgt, cfg.semantic_pad_id)
    tgt = jnp.broadcast_to(tgt[None, :], (b, t))
    return text, jnp.stack([tgt, tgt], axis=-1).astype(jnp.int32)


def main():
    cfg = T.T2SConfig(dim=512, source_depth=4, target_depth=4, heads=8, dim_head=64,
                      num_text_tokens=30528, num_semantic_tokens=501, target_dim=1024,
                      two_output=True, target_early_exit_layer=2)
    params = retry(lambda: jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(0), cfg),
                   "init")
    src = jax.random.randint(jax.random.PRNGKey(1), (8, 64), 1, 30000)
    print(f"platform={jax.devices()[0].platform} kind={jax.devices()[0].device_kind}",
          flush=True)

    measure(params, cfg, src, "floor (random weights)")

    if "--skip-train" in sys.argv:
        return
    # short fit: same forward_loss that trains the production early-exit heads
    import optax

    tx = optax.adam(3e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, key):
        text, tgt = synthetic_batch(key, cfg, 16, 24, 96)

        def loss_fn(p):
            return T.forward_loss(p, cfg, text, tgt, dtype=jnp.float32)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, opt = tx.update(g, opt, params)
        return optax.apply_updates(params, up), opt, loss

    steps = 400
    t0 = time.time()
    for i in range(steps):
        params, opt, loss = step(params, opt, jax.random.PRNGKey(100 + i))
        if i % 100 == 0:
            print(f"# fit step {i}: loss {float(loss):.4f}", flush=True)
    print(f"# fit {steps} steps in {time.time() - t0:.0f}s, final loss {float(loss):.4f}",
          flush=True)

    text, tgt = synthetic_batch(jax.random.PRNGKey(7), cfg, 8, 24, 96)
    retry(lambda: ee_agreement(params, cfg, text, tgt), "ee agreement")
    for g in (2, 4, 8):
        measure(params, cfg, text, f"realistic gamma={g}", gamma=g)
    # dtype bisect for the r4 chip anomaly (0% acceptance at bench scale with
    # bf16 decode while CPU/f32 diagnostics read ~80%): same weights, same
    # task, f32 decode — if acceptance recovers, the collapse is bf16 decode
    # numerics (ee/full argmax ties broken differently), not a decoder bug.
    measure(params, cfg, text, "realistic gamma=4 f32-decode", gamma=4, dtype=jnp.float32)


if __name__ == "__main__":
    main()
