"""Benchmark: end-to-end dialogue synthesis RTF on one TPU chip.

Measures the full CoVoMix serving pipeline at reference scale —
CoMix T2S dual-stream AR decode -> VoMix flow matching (16 midpoint steps x
2 evals x CFG = 64 transformer forwards) -> HiFi-GAN vocoder — batched over
concurrent dialogues, and reports real-time factor per chip
(wall seconds / generated audio seconds). Baseline target: RTF < 0.05
(BASELINE.md). Models run at the released config sizes (T2S dim 512/1024
dual-stream; acoustic dim 1024 depth 8; vocoder 500-ch) with random weights —
RTF depends only on compute, not weight values. The T2S decode is forced to
run ALL DECODE_LEN steps via min_length (random weights would otherwise
sample EOS early and flatter the RTF).

The HEADLINE value is the fused serving path (serving.BatchedPipeline
fused=True, the production default): the whole cascade as ONE jitted program,
one dispatch + one fetch per batch. The staged path (three programs with a
host-fetch sync between stages, each paying a ~34 ms tunnel round trip) is
also measured for the per-stage breakdown, reported as rtf_staged +
t2s/flow/vocoder_wall_s.

Flake-proofing: the axon tunnel sporadically fails backend init on the FIRST
device op (round-2 post-mortem: the retry only wrapped the T2S warmup, so a
first-touch flake zeroed the round). The real measurement therefore runs in a
CHILD process; this parent never imports jax, retries the whole child with
backoff, and on final failure still emits a JSON line with an "error" key so
the round is never blank. Round-3 post-mortem additions (VERDICT r3 item 1):
(a) a hung backend init is detected FAST — the child touches a sentinel file
the moment its first device op completes; if the sentinel hasn't appeared
within BENCH_INIT_TIMEOUT (default 270 s) the parent SIGKILLs the child and
retries (observed hangs ran 25 min and never succeeded, NOTES_r3.md), so
many more attempts fit the driver window; (b) a LAST-KNOWN-GOOD cache —
every successful measurement persists its full JSON to BENCH_LAST_GOOD.json
(committed to the repo by the build loop), and when all live attempts fail
the parent emits that cache with "stale": true + its capture timestamp
instead of value: null, so a healthy-day measurement taken mid-round is
never thrown away.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} plus extra
keys: per-stage wall seconds, a batch-scaling table (B in BENCH_SWEEP,
default 4,16,64 — BASELINE config 5 is 64 concurrent dialogues),
vocoder_samples_per_sec_per_chip (BASELINE metric 2) and
hubert_tokens_per_sec_per_chip (BASELINE config 3)."""

import json
import os
import signal
import subprocess
import sys
import time

HEADLINE_UNIT = "wall_s_per_audio_s"
BASELINE_RTF = 0.05
LAST_GOOD_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                              "BENCH_LAST_GOOD.json")


def _emit_failure(error: str):
    """On total live failure, fall back to the committed last-known-good
    measurement (VERDICT r3 item 1b) marked "stale": true, instead of
    blanking the round with value: null."""
    try:
        with open(LAST_GOOD_PATH) as f:
            cached = json.load(f)
        cached["stale"] = True
        cached["stale_error"] = error[:400]
        print(json.dumps(cached), flush=True)
        return
    except (OSError, ValueError):
        pass
    print(json.dumps({
        "metric": "dialogue_rtf_per_chip", "value": None, "unit": HEADLINE_UNIT,
        "vs_baseline": None, "error": error[:400],
    }), flush=True)


def _run_child_watched(init_timeout: int, total_timeout: int):
    """Run one child attempt with a fast hung-init watchdog (VERDICT r3
    item 1a): the child touches a sentinel file the moment its first device
    op completes. Observed tunnel hangs block backend init ~25 min inside C
    code and never succeed, so waiting BENCH_TIMEOUT on them wastes the
    driver window — if the sentinel hasn't appeared after `init_timeout`
    seconds, SIGKILL and report "init hung" so the parent retries promptly.

    Returns (returncode|None, stdout_text, fail_reason|None)."""
    sentinel = f"/tmp/bench_init_ok_{os.getpid()}_{time.time_ns()}"
    env = dict(os.environ, BENCH_INIT_SENTINEL=sentinel)
    proc = subprocess.Popen(
        [sys.executable, os.path.abspath(__file__), "--child"],
        stdout=subprocess.PIPE, text=True, env=env)
    deadline_init = time.time() + init_timeout
    deadline_total = time.time() + total_timeout
    init_ok = False
    try:
        while True:
            rc = proc.poll()
            if rc is not None:
                break
            now = time.time()
            if not init_ok and os.path.exists(sentinel):
                init_ok = True
            if not init_ok and now > deadline_init:
                proc.kill()
                proc.wait()
                return None, "", f"backend init hung > {init_timeout}s"
            if now > deadline_total:
                proc.kill()
                proc.wait()
                return None, "", f"child timed out > {total_timeout}s"
            time.sleep(2)
        out = proc.stdout.read() if proc.stdout else ""
        return proc.returncode, out, None
    finally:
        if os.path.exists(sentinel):
            try:
                os.unlink(sentinel)
            except OSError:
                pass


def parent():
    """Retry the measurement child; never blank the round (VERDICT r2 item 1,
    r3 item 1).

    Also guards the driver-kill path: if the harness times this process out
    with SIGTERM/SIGINT while a child attempt is still retrying, emit the
    last-known-good (or error) JSON line before dying so the round's record
    is parseable either way."""
    attempts = int(os.environ.get("BENCH_ATTEMPTS", 6))
    init_timeout = int(os.environ.get("BENCH_INIT_TIMEOUT", 270))
    total_timeout = int(os.environ.get("BENCH_TIMEOUT", 3000))
    last_tail = ""

    def _on_signal(signum, frame):
        _emit_failure(f"killed by signal {signum} while retrying: {last_tail}")
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_signal)
    signal.signal(signal.SIGINT, _on_signal)
    for attempt in range(attempts):
        rc, out, fail = _run_child_watched(init_timeout, total_timeout)
        if fail is not None:
            last_tail = fail
            print(f"# bench child attempt {attempt + 1}/{attempts}: {fail}", file=sys.stderr)
            if attempt < attempts - 1:
                time.sleep(20)
            continue
        lines = [ln for ln in out.strip().splitlines() if ln.strip()]
        if rc == 0 and lines:
            try:
                parsed = json.loads(lines[-1])
            except ValueError:
                last_tail = lines[-1][:400]
            else:
                if not (os.environ.get("BENCH_TINY") or os.environ.get("BENCH_CPU")):
                    try:  # persist last-known-good so a future dead-tunnel round
                        # still has a real number to emit (stale-marked);
                        # never cache CPU/tiny smoke-test numbers
                        parsed["captured_at"] = time.strftime(
                            "%Y-%m-%dT%H:%M:%SZ", time.gmtime())
                        with open(LAST_GOOD_PATH, "w") as f:
                            json.dump(parsed, f, indent=1)
                    except OSError:
                        pass
                print(lines[-1])
                return 0
        last_tail = (lines[-1][:400] if lines else f"rc={rc}, no output")
        print(f"# bench child attempt {attempt + 1}/{attempts} failed: {last_tail}",
              file=sys.stderr)
        if attempt < attempts - 1:
            time.sleep(20 * (attempt + 1))
    _emit_failure(f"all {attempts} attempts failed: {last_tail}")
    return 0  # the JSON line itself flags the failure


# bf16 peak TFLOP/s per chip, by jax device_kind (public spec sheets);
# override with BENCH_CHIP_PEAK_TFLOPS for unlisted chips
_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,   # v5e
    "TPU v5": 459.0,        # v5p
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,   # v6e / Trillium
    "TPU v6e": 918.0,
    "cpu": None,
}


def child():
    import dataclasses
    import functools

    import covomix_tpu.util.jaxcache  # noqa: F401
    import jax

    if os.environ.get("BENCH_CPU"):
        # smoke-test the bench plumbing without the tunnel (JAX_PLATFORMS is
        # ignored by this axon build — config.update is the only override,
        # CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V

    def _touch_sentinel():
        """Tell the parent's hung-init watchdog the backend is alive."""
        p = os.environ.get("BENCH_INIT_SENTINEL")
        if p:
            try:
                open(p, "w").close()
            except OSError:
                pass

    def _cost_flops(jitted, *args, **kwargs):
        """Model FLOPs of one application via XLA's compiled cost analysis
        (compile hits the jit cache after warmup). Only valid for programs
        without data-dependent loops — HloCostAnalysis visits a while/scan
        body ONCE, so callers multiply by known trip counts themselves."""
        try:
            ca = jitted.lower(*args, **kwargs).compile().cost_analysis()
            if isinstance(ca, (list, tuple)):
                ca = ca[0]
            f = float(ca.get("flops", 0.0))
            return f if f > 0 else None
        except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
            print(f"# cost_analysis unavailable: {str(e)[:120]}", file=sys.stderr)
            return None

    dtype = jnp.bfloat16
    DECODE_LEN = int(os.environ.get("BENCH_DECODE_LEN", 512))  # 512 frames = 10.24 s/dialogue
    PROMPT = 400
    sweep = [int(x) for x in os.environ.get("BENCH_SWEEP", "4,16,64").split(",") if x]
    headline_b = sweep[0]

    # reference-scale configs (running_command/*.sh)
    t2s_cfg = T.T2SConfig(dim=512, source_depth=4, target_depth=4, heads=8, dim_head=64,
                          num_text_tokens=30528, num_semantic_tokens=501, target_dim=1024,
                          two_output=True)
    ac_cfg = A.AcousticConfig(dim_in=160, dim=1024, depth=8, heads=16, dim_head=64,
                              num_phoneme_tokens=502, mode="two_one")
    voc_cfg = V.VocoderConfig()
    if os.environ.get("BENCH_TINY"):
        # plumbing smoke test only (CPU CI) — numbers are meaningless
        t2s_cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                              num_text_tokens=30528, num_semantic_tokens=501, target_dim=64,
                              two_output=True)
        ac_cfg = A.AcousticConfig(dim_in=160, dim=32, depth=2, heads=2, dim_head=16,
                                  dim_phoneme_emb=16, num_phoneme_tokens=502, mode="two_one")
        voc_cfg = V.VocoderConfig(upsample_initial_channel=16)

    def retry(fn, what, attempts=5):
        """In-child retry for sporadic tunnel flakes mid-run (first-touch
        failures are handled by the parent's whole-child retry)."""
        for attempt in range(attempts):
            try:
                return fn()
            except Exception as e:  # noqa: BLE001 — tunnel raises RuntimeError/XlaRuntimeError
                if attempt == attempts - 1:
                    raise
                print(f"# {what} attempt {attempt} failed ({str(e)[:120]}); retrying",
                      file=sys.stderr)
                time.sleep(15 * (attempt + 1))

    key = retry(lambda: jax.block_until_ready(jax.random.PRNGKey(0)), "first device op")
    _touch_sentinel()
    chip = jax.devices()[0].device_kind
    peak_tflops = (float(os.environ.get("BENCH_CHIP_PEAK_TFLOPS", 0))
                   or _PEAK_TFLOPS.get(chip))
    t2s_params = retry(lambda: jax.jit(T.init, static_argnums=1)(key, t2s_cfg), "t2s init")
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), ac_cfg)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), voc_cfg)

    # min_length == max_length: decode runs every step (honest full-length AR cost)
    gen_fn = jax.jit(functools.partial(T.generate, cfg=t2s_cfg, max_length=DECODE_LEN,
                                       min_length=DECODE_LEN, dtype=dtype))
    sample_fn = jax.jit(functools.partial(A.sample, cfg=ac_cfg, cond_scale=0.7, dtype=dtype))
    voc_fn = jax.jit(functools.partial(V.generator, cfg=voc_cfg, dtype=dtype))

    def sync(x):
        np.asarray(x[:1].ravel()[:8])  # axon tunnel: block_until_ready doesn't block

    total_frames = PROMPT + DECODE_LEN

    from covomix_tpu.serving import BatchedPipeline
    fused_pipe = BatchedPipeline(
        t2s_params, t2s_cfg, ac_params, ac_cfg, voc_params, voc_cfg,
        decode_len=DECODE_LEN, cond_scale=0.7, dtype=dtype,
        min_length=DECODE_LEN)  # EOS masked for all steps: honest full-length AR cost

    def measure_fused(B, runs):
        """Production serving path: the whole T2S -> pack -> flow -> vocoder
        cascade as ONE jitted program (serving.BatchedPipeline fused=True) —
        one dispatch + one fetch per batch instead of a ~34 ms tunnel round
        trip per stage. Inputs are pre-placed device-side (pipe.place()), the
        same methodology as the staged measurement (which always timed
        device-resident inputs); the one-time prompt upload is reported
        separately as upload_s. A server keeps enrolled prompts resident."""
        text_ids = np.asarray(jax.random.randint(key, (B, 64), 1, 30000))
        prompt_tok = np.random.RandomState(0).randint(0, 500, (B, PROMPT)).astype(np.int32)
        prompt_mel = (np.random.RandomState(1).randn(B, PROMPT, 160) * 0.1).astype(np.float32)
        t0 = time.time()
        placed = retry(lambda: fused_pipe.place(text_ids, prompt_tok, prompt_mel),
                       f"B={B} prompt upload")
        sync(placed[2])
        upload_s = time.time() - t0
        wav, gen = retry(lambda: fused_pipe(jax.random.PRNGKey(10), *placed),
                         f"B={B} fused warmup")
        sync(wav)
        best = 1e9
        for i in range(runs):
            t0 = time.time()
            wav, gen = fused_pipe(jax.random.PRNGKey(100 + i), *placed)
            sync(wav)
            best = min(best, time.time() - t0)
        audio_s = B * DECODE_LEN * 0.02
        rtf = best / audio_s
        print(f"# B={B} fused: best wall {best:.4f} s RTF {rtf:.5f} "
              f"upload {upload_s:.3f} s "
              f"decoded_steps={int(np.asarray(gen.num_steps))}/{DECODE_LEN}", file=sys.stderr)
        return {"rtf_fused": round(rtf, 5), "fused_wall_s": round(best, 4),
                "upload_s": round(upload_s, 4)}

    def measure_pipeline(B, runs):
        """Per-stage best wall at batch B (min over runs = steady state,
        excluding sporadic tunnel stalls)."""
        text_ids = jax.random.randint(key, (B, 64), 1, 30000)
        ph = jax.random.randint(key, (B, total_frames, 2), 0, 502)
        cond = jax.random.normal(key, (B, total_frames, 160), jnp.float32)
        # warmup / compile
        gen = retry(lambda: gen_fn(t2s_params, key=jax.random.PRNGKey(10), source_ids=text_ids),
                    f"B={B} t2s warmup")
        sync(gen.tokens)
        mel = sample_fn(ac_params, key=jax.random.PRNGKey(11), phoneme_ids=ph, cond=cond)
        sync(mel)
        wav = voc_fn(voc_params, mel=mel)
        sync(wav)
        walls = {"t2s": [], "flow": [], "vocoder": []}
        num_steps = 0
        for i in range(runs):
            k1, k2 = jax.random.split(jax.random.PRNGKey(100 + i))
            t0 = time.time()
            gen = gen_fn(t2s_params, key=k1, source_ids=text_ids)
            num_steps = int(np.asarray(gen.num_steps))  # sync via host fetch
            walls["t2s"].append(time.time() - t0)
            t0 = time.time()
            mel = sample_fn(ac_params, key=k2, phoneme_ids=ph, cond=cond)
            sync(mel)
            walls["flow"].append(time.time() - t0)
            t0 = time.time()
            wav = voc_fn(voc_params, mel=mel)
            sync(wav)
            walls["vocoder"].append(time.time() - t0)
        best = {k: min(v) for k, v in walls.items()}
        audio_s = B * DECODE_LEN * 0.02
        rtf = sum(best.values()) / audio_s
        print(f"# B={B}: best walls { {k: round(v, 4) for k, v in best.items()} } "
              f"RTF {rtf:.5f} decoded_steps={num_steps}/{DECODE_LEN}", file=sys.stderr)
        return {"rtf": round(rtf, 5),
                "t2s_wall_s": round(best["t2s"], 4),
                "flow_wall_s": round(best["flow"], 4),
                "vocoder_wall_s": round(best["vocoder"], 4),
                "audio_s": audio_s, "decoded_steps": num_steps}, mel

    def flow_field_flops(B):
        """Model FLOPs of ONE CFG field evaluation (A.forward on the
         2B-doubled cond+null batch) at the serving shape, via XLA cost
        analysis of an unrolled single forward (no scan — HloCostAnalysis
        counts loop bodies once, so we multiply by the known 16 midpoint
        steps x 2 evals = 32 ourselves). Used for flow-stage MFU
        (VERDICT r3 item 3)."""
        b2 = 2 * B
        x = jnp.zeros((b2, total_frames, ac_cfg.mel_dim), jnp.float32)
        ph = jnp.zeros((b2, total_frames, 2) if ac_cfg.n_phoneme_streams == 2
                       else (b2, total_frames), jnp.int32)
        c = jnp.zeros((b2, total_frames, ac_cfg.dim_in), jnp.float32)
        tms = jnp.zeros((b2,), jnp.float32)
        fwd = jax.jit(lambda p, x_, ph_, c_, t_: A.forward(
            p, ac_cfg, x_, ph_, c_, t_, dtype=dtype))
        return _cost_flops(fwd, ac_params, x, ph, c, tms)

    def _mfu(flops, wall_s):
        if flops is None or not peak_tflops or not wall_s:
            return None
        return round(flops / wall_s / (peak_tflops * 1e12), 4)

    def vocoder_throughput(mel, B, nloop):
        """Device-resident: N generator applications inside ONE jit
        (lax.fori_loop, carry-tainted input so XLA cannot hoist the body).
        Host dispatches do not pipeline through the axon tunnel (~34 ms round
        trip each, measured r2), which would understate the generator compute
        ~2x; a production server keeps the queue device-side.
        Returns (samples/sec, wall s per generator application)."""
        @jax.jit
        def voc_loop(params, mel):
            def body(i, c):
                w = V.generator(params, voc_cfg, mel + c, dtype=dtype)
                return w.ravel()[0].astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, nloop, body, jnp.float32(0))

        float(voc_loop(voc_params, mel))  # compile + warm (host fetch = sync)
        t0 = time.time()
        float(voc_loop(voc_params, mel))
        wall = (time.time() - t0) / nloop
        return B * mel.shape[1] * voc_cfg.total_upsample / wall, wall

    def train_throughput():
        """Training step walls at recipe scale (running_command/*.sh shapes;
        in-jit loop — host dispatches don't pipeline through the tunnel):
        VoMix acoustic bs8 x 800 frames (flash fwd+bwd kernels) and CoMix T2S
        bs6 x 1024 two-stream tokens. Returns ms/step for each."""
        from covomix_tpu.train.loop import TrainConfig, acoustic_loss_fn, init_train_state, make_train_step, t2s_loss_fn

        tcfg = TrainConfig(lr=1e-4)
        nloop = int(os.environ.get("BENCH_TRAIN_LOOP", 4))
        out = {}
        tiny = bool(os.environ.get("BENCH_TINY"))
        ab, at = (2, 64) if tiny else (8, 800)     # acoustic bs x frames
        tb, tt = (2, 32) if tiny else (6, 1024)    # t2s bs x tokens
        for name, cfg_, loss_fn, batch in (
            ("acoustic", ac_cfg, acoustic_loss_fn(ac_cfg, cond_drop_prob=0.3, dtype=dtype), {
                "x": jax.random.normal(key, (ab, at, 240), jnp.float32),
                "phonemes": jax.random.randint(key, (ab, at, 2), 0, 502),
                "mask": jnp.ones((ab, at), bool)}),
            ("t2s", t2s_cfg, t2s_loss_fn(t2s_cfg, dtype=dtype), {
                "text_ids": jax.random.randint(key, (tb, 32 if tiny else 128), 1, 30000),
                "semantic_ids": jax.random.randint(key, (tb, tt, 2), 0, 501)}),
        ):
            params = (A if name == "acoustic" else T).init(jax.random.PRNGKey(5), cfg_)
            state = init_train_state(params, tcfg)
            step = make_train_step(loss_fn, tcfg, donate=False)
            flops = _cost_flops(step, state, batch, jax.random.PRNGKey(6))
            state, m = step(state, batch, jax.random.PRNGKey(6))  # compile
            float(m["loss"])
            t0 = time.time()
            for i in range(nloop):
                state, m = step(state, batch, jax.random.PRNGKey(7 + i))
            float(m["loss"])  # host fetch = sync
            ms = round((time.time() - t0) / nloop * 1e3, 1)
            out[f"{name}_train_ms_per_step"] = ms
            mfu = _mfu(flops, ms / 1e3)
            if mfu is not None:
                out[f"{name}_train_mfu"] = mfu
                out[f"{name}_train_tflops_per_step"] = round(flops / 1e12, 2)
        return out

    def spec_decode_stats():
        """Speculative-decode speedup/acceptance at reference T2S scale
        (VERDICT r4 item 2: put a number on record in the official JSON).

        Random weights give ~1/vocab acceptance (the floor), so the draft
        heads are first FIT for a few hundred steps on a fully-decodable
        synthetic pattern with a trained EOS (tools/spec_bench.py
        methodology — the same forward_loss that trains the production
        early-exit heads, text2semantic.py:1037-1046 semantics), standing in
        for a converged checkpoint's draft/full agreement. Both paths use
        greedy EOS stopping (min_length would force greedy to decode
        max_length while spec stops at EOS, skewing the ratio)."""
        import optax

        cfg = T.T2SConfig(dim=512, source_depth=4, target_depth=4, heads=8,
                          dim_head=64, num_text_tokens=30528,
                          num_semantic_tokens=501, target_dim=1024,
                          two_output=True, target_early_exit_layer=2)
        fit_steps, fit_t = int(os.environ.get("BENCH_SPEC_FIT", 400)), 96
        gamma = int(os.environ.get("BENCH_SPEC_GAMMA", 4))
        if os.environ.get("BENCH_TINY"):
            cfg = dataclasses.replace(t2s_cfg, target_early_exit_layer=1)
            fit_steps, fit_t = 8, 32
        params = jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(21), cfg)

        def synth(k, b, t):
            # positional pattern + trained EOS at t-16 (decodable by greedy)
            text = jax.random.randint(k, (b, 24), 1, 100)
            tgt = (7 + jnp.arange(t)) % cfg.num_semantic_tokens
            tgt = jnp.where(jnp.arange(t) < t - 16, tgt, cfg.semantic_pad_id)
            tgt = jnp.broadcast_to(tgt[None, :], (b, t))
            return text, jnp.stack([tgt, tgt], axis=-1).astype(jnp.int32)

        tx = optax.adam(3e-4)
        opt = tx.init(params)

        @jax.jit
        def fit_step(params, opt, k):
            text, tgt = synth(k, 16, fit_t)
            loss, g = jax.value_and_grad(
                lambda p: T.forward_loss(p, cfg, text, tgt, dtype=jnp.float32))(params)
            up, opt = tx.update(g, opt, params)
            return optax.apply_updates(params, up), opt, loss

        for i in range(fit_steps):
            params, opt, loss = fit_step(params, opt, jax.random.PRNGKey(100 + i))
        print(f"# spec fit {fit_steps} steps, final loss {float(loss):.4f}", file=sys.stderr)

        text, _ = synth(jax.random.PRNGKey(7), 8, fit_t)
        gen = jax.jit(functools.partial(T.generate, cfg=cfg, max_length=DECODE_LEN,
                                        temperature=1e-10, top_k_thres=1.0, dtype=dtype))
        spec = jax.jit(functools.partial(T.generate_speculative, cfg=cfg,
                                         max_length=DECODE_LEN, gamma=gamma, dtype=dtype))

        def wall(fn):
            r = fn()
            int(np.asarray(r.num_steps))  # host fetch = sync
            best = 1e9
            for _ in range(3):
                t0 = time.time()
                r = fn()
                int(np.asarray(r.num_steps))
                best = min(best, time.time() - t0)
            return best, r

        wg, rg = wall(lambda: gen(params, key=jax.random.PRNGKey(0), source_ids=text))
        ws, rs = wall(lambda: spec(params, source_ids=text))
        lens = np.minimum(np.asarray(rs.lengths), np.asarray(rs.lengths2)).astype(np.float64)
        rounds = float(np.asarray(rs.num_steps))
        per_round = float(lens.mean()) / max(rounds, 1.0)
        gtok = float(np.minimum(np.asarray(rg.lengths), np.asarray(rg.lengths2)).sum())
        stok = float(lens.sum())
        out = {
            "t2s_spec_gamma": gamma,
            "t2s_spec_tokens_per_round": round(per_round, 2),
            "t2s_spec_acceptance": round(max(0.0, (per_round - 1.0) / gamma), 3),
            "t2s_greedy_tok_per_s": round(gtok / wg) if wg else None,
            "t2s_spec_tok_per_s": round(stok / ws) if ws else None,
            "t2s_spec_speedup": round((stok / ws) / (gtok / wg), 2) if wg and ws and gtok else None,
        }
        print(f"# spec decode: {out}", file=sys.stderr)
        return out

    def hubert_throughput():
        """BASELINE config 3: semantic-token extraction rate at reference
        scale (12-layer/768 HuBERT + 500-unit k-means argmin,
        get_fisher_semantic_tokens_parallel.py:21-61). Tokens/sec/chip over
        an in-jit loop on [B, 20 s] 16 kHz chunks."""
        from covomix_tpu.models import hubert as H
        hcfg = H.HubertConfig()
        hparams = jax.jit(H.init, static_argnums=1)(jax.random.PRNGKey(3), hcfg)
        B = int(os.environ.get("BENCH_HUBERT_BATCH", 8))
        seconds = int(os.environ.get("BENCH_HUBERT_SECONDS", 20))
        wav = jax.random.normal(key, (B, seconds * 16000), jnp.float32)
        frames = H.num_output_frames(hcfg, wav.shape[1])
        nloop = int(os.environ.get("BENCH_HUBERT_LOOP", 8))

        @jax.jit
        def loop(params, wav):
            def body(i, c):
                ids = H.wav2units_jit(params, hcfg, wav + c, dtype=dtype)
                return ids.ravel()[0].astype(jnp.float32) * 1e-9
            return jax.lax.fori_loop(0, nloop, body, jnp.float32(0))

        one = jax.jit(lambda p, w: H.wav2units_jit(p, hcfg, w, dtype=dtype))
        flops = _cost_flops(one, hparams, wav)
        float(loop(hparams, wav))
        t0 = time.time()
        float(loop(hparams, wav))
        wall = (time.time() - t0) / nloop
        return B * frames / wall, B * seconds / wall, _mfu(flops, wall)

    # ---- measure -----------------------------------------------------------
    scaling = {}
    headline = None
    mel_by_b = {}
    for B in sweep:
        runs = int(os.environ.get("BENCH_RUNS", 3 if B == headline_b else 2))
        try:
            stats, mel = measure_pipeline(B, runs)
            scaling[str(B)] = stats
            mel_by_b[B] = mel
            if B == headline_b:
                headline = stats
        except Exception as e:  # noqa: BLE001
            if B == headline_b:
                raise
            scaling[str(B)] = {"error": str(e)[:200]}
            print(f"# B={B} sweep failed: {str(e)[:200]}", file=sys.stderr)
        try:
            scaling[str(B)].update(measure_fused(B, runs))
        except Exception as e:  # noqa: BLE001
            print(f"# B={B} fused failed: {str(e)[:200]}", file=sys.stderr)
            scaling[str(B)]["fused_error"] = str(e)[:200]

    # flow-stage MFU: one field eval's FLOPs at the headline shape; FLOPs
    # scale exactly linearly in B (T fixed), so per-B MFU derives from one
    # cost analysis. 32 evals per sample() (16 midpoint steps x 2).
    try:
        ff = flow_field_flops(headline_b)
    except Exception as e:  # noqa: BLE001
        ff = None
        print(f"# flow flops failed: {str(e)[:200]}", file=sys.stderr)
    flow_flops_hb = None if ff is None else ff * 32
    for Bs, stats in scaling.items():
        if flow_flops_hb and peak_tflops and stats.get("flow_wall_s"):
            fl = flow_flops_hb * int(Bs) / headline_b
            stats["flow_mfu"] = _mfu(fl, stats["flow_wall_s"])
            # fused program = flow (dominant) + t2s AR + vocoder; quoting
            # flow-only FLOPs gives a LOWER bound on the fused MFU
            if stats.get("fused_wall_s"):
                stats["fused_mfu_lb"] = _mfu(fl, stats["fused_wall_s"])

    voc_tp, voc_wall = retry(
        lambda: vocoder_throughput(mel_by_b[headline_b], headline_b,
                                   int(os.environ.get("BENCH_VOC_LOOP", 10))),
        "vocoder throughput")
    voc_flops = _cost_flops(voc_fn, voc_params, mel=mel_by_b[headline_b])
    voc_tp_big = None
    big = max(b for b in mel_by_b)
    if big != headline_b:
        try:
            voc_tp_big, _ = vocoder_throughput(mel_by_b[big], big, 4)
        except Exception as e:  # noqa: BLE001
            print(f"# vocoder throughput B={big} failed: {str(e)[:200]}", file=sys.stderr)
    try:
        hub_tok, hub_audio, hub_mfu = hubert_throughput()
    except Exception as e:  # noqa: BLE001
        hub_tok = hub_audio = hub_mfu = None
        print(f"# hubert throughput failed: {str(e)[:200]}", file=sys.stderr)
    train_ms = {}
    if not os.environ.get("BENCH_NO_TRAIN"):
        try:
            train_ms = train_throughput()
        except Exception as e:  # noqa: BLE001
            print(f"# train throughput failed: {str(e)[:200]}", file=sys.stderr)
    spec_stats = {}
    if not os.environ.get("BENCH_NO_SPEC"):
        try:
            spec_stats = retry(spec_decode_stats, "spec decode", attempts=2)
        except Exception as e:  # noqa: BLE001
            print(f"# spec decode failed: {str(e)[:200]}", file=sys.stderr)

    # headline = the fused single-program serving path (the production
    # default); fall back to the staged per-stage sum if fused failed
    rtf = headline.get("rtf_fused", headline["rtf"])
    out = {
        "metric": "dialogue_rtf_per_chip",
        "value": rtf,
        "unit": HEADLINE_UNIT,
        "vs_baseline": round(rtf / BASELINE_RTF, 3),
        "chip": chip,
        "chip_peak_bf16_tflops": peak_tflops,
        "rtf_staged": headline["rtf"],
        "t2s_wall_s": headline["t2s_wall_s"],
        "flow_wall_s": headline["flow_wall_s"],
        "vocoder_wall_s": headline["vocoder_wall_s"],
        "t2s_decoded_steps": headline["decoded_steps"],
        "decode_len": DECODE_LEN,
        "batch": headline_b,
        "batch_scaling": scaling,
        "vocoder_samples_per_sec_per_chip": round(voc_tp),
        "hubert_tokens_per_sec_per_chip": round(hub_tok) if hub_tok else None,
        "hubert_audio_s_per_sec_per_chip": round(hub_audio, 1) if hub_audio else None,
    }
    if flow_flops_hb:
        out["flow_model_tflops"] = round(flow_flops_hb / 1e12, 2)
        out["flow_mfu"] = _mfu(flow_flops_hb, headline["flow_wall_s"])
    vm = _mfu(voc_flops, voc_wall)
    if vm is not None:
        out["vocoder_mfu"] = vm
    if hub_mfu is not None:
        out["hubert_mfu"] = hub_mfu
    if voc_tp_big is not None:
        out[f"vocoder_samples_per_sec_b{big}"] = round(voc_tp_big)
    out.update(train_ms)
    out.update(spec_stats)
    b64 = scaling.get("64", {})
    if "rtf" in b64 or "rtf_fused" in b64:
        # BASELINE config 5: 64 concurrent dialogues (fused serving path)
        out["rtf_b64"] = b64.get("rtf_fused", b64.get("rtf"))
    print(json.dumps(out))


if __name__ == "__main__":
    if "--child" in sys.argv:
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        child()
    else:
        sys.exit(parent())
