"""Dialogue synthesis CLI — TPU-native port of the reference entry point.

Same flags and conventions as the reference dialogue_generation.py: scripts
contain `[spkchange]` turn markers; prompts are `<name>_1.hubert_code.npy` /
`<name>_2.hubert_code.npy` (+ sibling .wav) per speaker
(dialogue_generation.py:150-152, :284-286). Modes:
  covosingle — per-turn synthesis alternating prompts, waveform concat (:158-192)
  covosinx   — per-turn T2S routed into 2 token streams, one VoMix pass (:234-268)
  covomix    — full script through CoMix dual-stream decode + VoMix (:272-329)"""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401 — compile cache + COVOMIX_FORCE_CPU


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--t2s_ckpt", type=str, required=True)
    parser.add_argument("--acous_ckpt", type=str, required=True)
    parser.add_argument("--hifigan_ckpt", type=str, required=True)
    parser.add_argument("--text_dir", type=str, default="test/test_dir")
    parser.add_argument("--prompt_dir", type=str, default="test/dialogue_prompt_dir")
    parser.add_argument("--saved_dir", type=str, default=".saved_dir")
    parser.add_argument("--seed", type=int, default=30)
    parser.add_argument("--mode", type=str, choices=["covosingle", "covosinx", "covomix"], default="covomix")
    parser.add_argument("--bert_vocab", type=str, default=None)
    parser.add_argument("--allow_fallback_vocab", action="store_true",
                        help="permit the checkpoint-incompatible char-level fallback vocab")
    parser.add_argument("--fuse_tail", action="store_true",
                        help="vocode with the fused Pallas tail kernel (tail approximation)")
    parser.add_argument("--speculative", action="store_true",
                        help="greedy self-speculative T2S decode (needs a checkpoint trained "
                             "with an early-exit head; CoMix two-stream needs this "
                             "framework's stream-2 draft head)")
    parser.add_argument("--bf16", action="store_true", help="force bfloat16 compute (default on TPU)")
    parser.add_argument("--f32", action="store_true", help="force float32 compute")
    args = parser.parse_args()

    import jax
    import numpy as np

    from covomix_tpu.audio import save_wav
    from monologue_generation import load_models

    os.makedirs(args.saved_dir, exist_ok=True)
    synth = load_models(args)

    with open(os.path.join(args.saved_dir, "config.txt"), "w") as f:
        f.write(f"Vocoder: {args.hifigan_ckpt}\n")
        f.write(f"t2s_ckpt: {args.t2s_ckpt}\n")
        f.write(f"acoustic model: {args.acous_ckpt}\n")

    key = jax.random.PRNGKey(args.seed)
    text_list = sorted(glob.glob(os.path.join(args.text_dir, "*.txt")))
    print(f"{len(text_list)} dialogue scripts; mode={args.mode}")
    for text_file in text_list:
        base = os.path.basename(text_file)
        p1 = os.path.join(args.prompt_dir, base.replace(".txt", "_1.hubert_code.npy"))
        p2 = os.path.join(args.prompt_dir, base.replace(".txt", "_2.hubert_code.npy"))
        with open(text_file, encoding="utf-8") as f:
            text = f.read()
        key, sub = jax.random.split(key)
        t0 = time.time()
        wav = synth.dialogue(args.mode, text, p1, p2, sub)
        dur = len(wav) / synth.mel_cfg.sample_rate
        out = os.path.join(args.saved_dir, base.replace(".txt", ".wav"))
        save_wav(out, np.asarray(wav), synth.mel_cfg.sample_rate)
        print(f"saved {out}  ({dur:.1f}s audio, RTF {(time.time() - t0) / max(dur, 1e-6):.3f})")


if __name__ == "__main__":
    main()
