"""Monologue synthesis CLI — TPU-native port of the reference entry point.

Same flags, modes (covosingle / covosinx / covomix), and on-disk conventions as
the reference monologue_generation.py: per `.txt` file in --text_dir, a prompt
`<name>.hubert_code.npy` (+ sibling `.wav`) in --prompt_dir, output
`<name>.wav` at 8 kHz int16 in --saved_dir, plus a config.txt provenance file
(monologue_generation.py:146-177, :190-244, :248-319, :396-399).

Checkpoints: accepts either covomix_tpu .npz params (with .json sidecar) or
original PyTorch checkpoints (.ckpt / HiFi-GAN dicts), converted on the fly.
The vocoder config is discovered as vocoder_config.json next to the HiFi-GAN
checkpoint (monologue_generation.py:368)."""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401 — compile cache + COVOMIX_FORCE_CPU


def load_models(args):
    import dataclasses

    import jax.numpy as jnp

    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V
    from covomix_tpu.data.tokenizer import load_covomix_tokenizer
    from covomix_tpu.pipeline import Synthesizer, _tupled  # recursive: nested
    # lists (resblock_dilation_sizes) must become tuples-of-tuples or the
    # frozen config is unhashable as a static jit arg
    from covomix_tpu.audio import MelConfig

    def load_any(path, cfg_cls, kind):
        if path.endswith(".npz"):
            params = cio.load_params(path)
            meta = cio.load_meta(path)
            fields = {f.name for f in dataclasses.fields(cfg_cls)}
            cfg = cfg_cls(**{k: _tupled(v) for k, v in meta.get("config", {}).items() if k in fields})
            return params, cfg
        # torch formats
        from covomix_tpu.checkpoint import torch_convert as tc

        if kind == "t2s" or kind == "acoustic":
            params, hp = tc.convert_lightning_ckpt(path)
            # hparams->config mapping shared with verify_reference_ckpts.py
            kw = tc.cfg_kwargs_from_hparams(hp, kind=kind)
            cfg = T.T2SConfig(**kw) if kind == "t2s" else A.AcousticConfig(**kw)
            return params, cfg
        # vocoder: read vocoder_config.json beside the ckpt
        cfg_file = os.path.join(os.path.dirname(path), "vocoder_config.json")
        h = {}
        if os.path.isfile(cfg_file):
            with open(cfg_file) as f:
                h = json.load(f)
        cfg = V.VocoderConfig(
            num_mels=int(h.get("num_mels", 80)),
            upsample_initial_channel=int(h.get("upsample_initial_channel", 500)),
            upsample_rates=tuple(h.get("upsample_rates", [5, 4, 4, 2])),
            upsample_kernel_sizes=tuple(h.get("upsample_kernel_sizes", [8, 8, 4, 4])),
            resblock_kernel_sizes=tuple(h.get("resblock_kernel_sizes", [3, 7, 11])),
            resblock_dilation_sizes=tuple(tuple(d) for d in h.get("resblock_dilation_sizes", [[1, 3, 5]] * 3)),
            resblock=str(h.get("resblock", "1")),
            sampling_rate=int(h.get("sampling_rate", 8000)),
        )
        params = tc.convert_hifigan_ckpt(path, h)
        return params, cfg

    t2s_params, t2s_cfg = load_any(args.t2s_ckpt, T.T2SConfig, "t2s")
    ac_params, ac_cfg = load_any(args.acous_ckpt, A.AcousticConfig, "acoustic")
    voc_params, voc_cfg = load_any(args.hifigan_ckpt, V.VocoderConfig, "vocoder")
    tok = load_covomix_tokenizer(args.bert_vocab,
                                 strict=not getattr(args, "allow_fallback_vocab", False))
    mel_cfg = MelConfig(sample_rate=voc_cfg.sampling_rate)
    import jax

    # bf16 is the serving precision on TPU (MXU-native; f32 also halves the
    # flash kernel's usable block sizes); --f32 forces full precision.
    # getattr: other CLIs (serve_batch) reuse load_models with their own
    # parsers that may not define both flags.
    if getattr(args, "f32", False):
        dtype = jnp.float32
    elif getattr(args, "bf16", False) or jax.devices()[0].platform == "tpu":
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32
    return Synthesizer(t2s_params, t2s_cfg, ac_params, ac_cfg, voc_params, voc_cfg, tok,
                       mel_cfg=mel_cfg, dtype=dtype,
                       fuse_tail=getattr(args, "fuse_tail", False),
                       speculative=getattr(args, "speculative", False))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--t2s_ckpt", type=str, required=True, help="text2semantic checkpoint (.npz or PL .ckpt)")
    parser.add_argument("--acous_ckpt", type=str, required=True, help="acoustic model checkpoint")
    parser.add_argument("--hifigan_ckpt", type=str, required=True, help="HiFi-GAN vocoder checkpoint")
    parser.add_argument("--text_dir", type=str, default="test/test_dir")
    parser.add_argument("--prompt_dir", type=str, default="test/monologue_prompt_dir")
    parser.add_argument("--saved_dir", type=str, default=".saved_dir")
    parser.add_argument("--seed", type=int, default=30)
    parser.add_argument("--mode", type=str, choices=["covosingle", "covosinx", "covomix"], default="covosingle")
    parser.add_argument("--bert_vocab", type=str, default=None, help="path to bert-base-uncased vocab.txt")
    parser.add_argument("--allow_fallback_vocab", action="store_true",
                        help="permit the checkpoint-incompatible char-level fallback vocab "
                             "(random-weight smoke runs only)")
    parser.add_argument("--fuse_tail", action="store_true",
                        help="vocode with the fused Pallas tail kernel (~2.7x faster tail; "
                             "the last ~0.3 s of each wav approximates exact-length inference)")
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

    os.makedirs(args.saved_dir, exist_ok=True)
    synth = load_models(args)

    # provenance file (monologue_generation.py:396-399)
    with open(os.path.join(args.saved_dir, "config.txt"), "w") as f:
        f.write(f"Vocoder: {args.hifigan_ckpt}\n")
        f.write(f"t2s_ckpt: {args.t2s_ckpt}\n")
        f.write(f"acoustic model: {args.acous_ckpt}\n")

    key = jax.random.PRNGKey(args.seed)
    text_list = sorted(glob.glob(os.path.join(args.text_dir, "*.txt")))
    print(f"{len(text_list)} scripts; mode={args.mode}")
    for text_file in text_list:
        base = os.path.basename(text_file)
        prompt = os.path.join(args.prompt_dir, base.replace(".txt", ".hubert_code.npy"))
        with open(text_file, encoding="utf-8") as f:
            text = f.read()
        key, sub = jax.random.split(key)
        t0 = time.time()
        wav = synth.monologue(args.mode, text, prompt, sub)
        dur = len(wav) / synth.mel_cfg.sample_rate
        out = os.path.join(args.saved_dir, base.replace(".txt", ".wav"))
        save_wav(out, np.asarray(wav), synth.mel_cfg.sample_rate)
        wall = time.time() - t0
        print(f"saved {out}  ({dur:.1f}s audio, RTF {wall / max(dur, 1e-6):.3f})")


if __name__ == "__main__":
    main()
