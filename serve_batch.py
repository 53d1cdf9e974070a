"""Batched dialogue serving CLI: N scripts -> N wavs through one fixed-shape
pipeline, data-parallel over all available chips.

The serving configuration from SURVEY §7 step 6 / BASELINE config 5: batched
concurrent dialogues (default 64) through T2S -> flow-matching -> vocoder,
sharded over a device mesh with pjit (data-parallel axis; no TP needed at
dim <= 1024). Scripts use the same file conventions as dialogue_generation.py
(`<name>.txt` + `<name>_1/.2.hubert_code.npy` prompts)."""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--t2s_ckpt", required=True)
    p.add_argument("--acous_ckpt", required=True)
    p.add_argument("--hifigan_ckpt", required=True)
    p.add_argument("--text_dir", required=True)
    p.add_argument("--prompt_dir", required=True)
    p.add_argument("--saved_dir", default="served")
    p.add_argument("--batch", type=int, default=64)
    p.add_argument("--decode_len", type=int, default=512)
    p.add_argument("--max_text_tokens", type=int, default=128)
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--bert_vocab", type=str, default=None)
    p.add_argument("--allow_fallback_vocab", action="store_true",
                   help="permit the checkpoint-incompatible char-level fallback vocab")
    p.add_argument("--bf16", action="store_true", help="force bfloat16 compute (default on TPU)")
    p.add_argument("--f32", action="store_true", help="force float32 compute")
    p.add_argument("--staged", action="store_true",
                   help="run the cascade as three per-stage programs instead of the "
                        "default single fused jit (debugging / per-stage timing)")
    p.add_argument("--speculative", action="store_true",
                   help="greedy self-speculative T2S decode (needs a checkpoint trained "
                        "with the early-exit draft head(s); output == greedy decode)")
    p.add_argument("--spec_gamma", type=int, default=4,
                   help="speculative drafts per verify round")
    p.add_argument("--multihost", action="store_true",
                   help="multi-host serving: jax.distributed rendezvous, then each "
                        "host serves its rank-strided slice of the scripts on its "
                        "LOCAL chips (serving is embarrassingly data-parallel — no "
                        "cross-host collectives needed)")
    args = p.parse_args()

    import jax

    from covomix_tpu.parallel import multihost as MH

    if args.multihost:
        MH.initialize(requested=True)

    import numpy as np

    from covomix_tpu.audio import save_wav
    from covomix_tpu.parallel.mesh import make_mesh
    from covomix_tpu.serving import BatchedPipeline
    from monologue_generation import load_models

    synth = load_models(args)  # reuse checkpoint loading (npz or torch)
    # dp must divide the serving batch (rows are sharded over 'dp'); use the
    # largest divisor of the batch that fits the local device count
    local_devices = jax.local_devices()
    n_dev = len(local_devices)
    dp = max(d for d in range(1, n_dev + 1) if args.batch % d == 0)
    if dp < n_dev:
        print(f"note: batch {args.batch} not divisible by {n_dev} devices; using dp={dp}")
    mesh = make_mesh(dp=dp, tp=1, devices=local_devices[:dp]) if dp > 1 else None
    pipe = BatchedPipeline(
        synth.t2s_params, synth.t2s_cfg, synth.acoustic_params, synth.acoustic_cfg,
        synth.vocoder_params, synth.vocoder_cfg, mesh=mesh,
        decode_len=args.decode_len, dtype=synth.dtype, fused=not args.staged,
        speculative=args.speculative, spec_gamma=args.spec_gamma)

    os.makedirs(args.saved_dir, exist_ok=True)
    scripts = sorted(glob.glob(os.path.join(args.text_dir, "*.txt")))
    if jax.process_count() > 1:
        scripts = scripts[jax.process_index():: jax.process_count()]
        print(f"process {jax.process_index()}/{jax.process_count()}: {len(scripts)} scripts")
    print(f"{len(scripts)} scripts, batch {args.batch}, devices {n_dev}")

    key = jax.random.PRNGKey(args.seed)
    hop = synth.mel_cfg.hop_size
    for start in range(0, len(scripts), args.batch):
        chunk = scripts[start : start + args.batch]
        b = len(chunk)
        # pad the batch to the static size with repeats (trimmed after)
        padded = chunk + [chunk[-1]] * (args.batch - b)
        texts, prompts_tok, prompts_mel, plens = [], [], [], []
        for path in padded:
            with open(path, encoding="utf-8") as f:
                texts.append(f.read())
            base = os.path.basename(path).replace(".txt", "")
            s1, m1 = synth.prepare_prompt(os.path.join(args.prompt_dir, base + "_1.hubert_code.npy"))
            s2, m2 = synth.prepare_prompt(os.path.join(args.prompt_dir, base + "_2.hubert_code.npy"))
            n = min(len(s1), len(s2))
            prompts_tok.append(np.stack([s1[:n], s2[:n]], -1))
            prompts_mel.append(np.concatenate([m1[:n], m2[:n]], -1))
            plens.append(n)
        pmax = max(plens)
        tok = np.full((args.batch, pmax, 2), 157, np.int32)
        mel = np.zeros((args.batch, pmax, prompts_mel[0].shape[-1]), np.float32)
        for i, (t, m) in enumerate(zip(prompts_tok, prompts_mel)):
            tok[i, : len(t)] = t
            mel[i, : len(m)] = m
        from covomix_tpu.data.tokenizer import remove_punctuation

        ids, _ = synth.tokenizer.batch_encode([remove_punctuation(t).lower() for t in texts],
                                              max_length=args.max_text_tokens)
        if ids.shape[1] < args.max_text_tokens:
            ids = np.pad(ids, ((0, 0), (0, args.max_text_tokens - ids.shape[1])))
        key, sub = jax.random.split(key)
        t0 = time.time()
        wav, gen = pipe(sub, ids, tok, mel, prompt_lens=np.asarray(plens, np.int32))
        wav = np.asarray(wav)
        lengths = np.asarray(np.minimum(gen.lengths, gen.lengths2))  # frames per row pre-EOS
        wall = time.time() - t0
        for i, path in enumerate(chunk):
            out = os.path.join(args.saved_dir, os.path.basename(path).replace(".txt", ".wav"))
            # trim post-EOS fill: only the decoded region is product audio
            n_samples = int(lengths[i]) * hop
            save_wav(out, wav[i, : max(n_samples, hop)], synth.mel_cfg.sample_rate)
        # honest RTF: count only pre-EOS decoded frames, not post-EOS silence
        audio_s = float(lengths[:b].sum()) * hop / synth.mel_cfg.sample_rate
        audio_s = max(audio_s, 1e-6)
        print(f"batch of {b}: {wall:.2f}s wall for {audio_s:.0f}s audio (RTF {wall / audio_s:.4f})")


if __name__ == "__main__":
    main()
