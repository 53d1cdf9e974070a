"""Convert reference PyTorch checkpoints to covomix_tpu .npz format.

Handles all three reference formats (SURVEY §5 checkpoint/resume):
  * PL .ckpt (acoustic / T2S) — EMA shadow params selected by default
  * HiFi-GAN {'generator': sd} / g_<step> — weight norm folded
  * fairseq HuBERT .pt + joblib k-means .bin

Usage:
  python convert_checkpoint.py lightning model.ckpt out.npz [--no-ema]
  python convert_checkpoint.py hifigan g_00400000 out.npz [--config vocoder_config.json]
  python convert_checkpoint.py hubert hubert_fisher.pt out.npz --km hubert_fisher_km_500.bin
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: E402,F401 — compile cache + COVOMIX_FORCE_CPU


def main():
    p = argparse.ArgumentParser()
    p.add_argument("kind", choices=["lightning", "hifigan", "hubert"])
    p.add_argument("src")
    p.add_argument("dst")
    p.add_argument("--no-ema", action="store_true", help="use raw (non-EMA) weights")
    p.add_argument("--config", default=None, help="vocoder_config.json for hifigan")
    p.add_argument("--km", default=None, help="k-means .bin for hubert")
    args = p.parse_args()

    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.checkpoint import torch_convert as tc

    if args.kind == "lightning":
        params, hparams = tc.convert_lightning_ckpt(args.src, use_ema=not args.no_ema)
        # single source of truth for the hparams->config mapping (shared with
        # the generation CLIs and verify_reference_ckpts.py)
        cfg = tc.cfg_kwargs_from_hparams(hparams)
        kind = "t2s" if hparams.get("text2semantic") else "acoustic"
        cio.save_params(args.dst, params, meta={"kind": kind, "config": cfg, "source": args.src,
                                                "ema": not args.no_ema})
    elif args.kind == "hifigan":
        h = {}
        cfg_file = args.config or os.path.join(os.path.dirname(args.src), "vocoder_config.json")
        if os.path.isfile(cfg_file):
            with open(cfg_file) as f:
                h = json.load(f)
        ckpt = tc.load_torch_file(args.src)
        if "mpd" in ckpt and "msd" in ckpt:
            # do_<step> discriminator checkpoint (hifi-gan/train.py:183-190):
            # convert to the training parametrization ((v,g) weight norm +
            # MSD[0] spectral buffers) so a reference GAN run resumes here
            mpd, msd = tc.convert_hifigan_discriminators(ckpt)
            cio.save_params(args.dst, {"mpd": mpd, "msd": msd},
                            meta={"kind": "hifigan_discriminators", "source": args.src,
                                  "steps": int(ckpt.get("steps", 0))})
            print(f"converted MPD+MSD (do_ checkpoint, step {ckpt.get('steps', '?')}) -> {args.dst}")
            return
        params = tc.convert_hifigan_ckpt(args.src, h)
        cfg = {
            "num_mels": h.get("num_mels", 80),
            "upsample_initial_channel": h.get("upsample_initial_channel", 500),
            "upsample_rates": h.get("upsample_rates", [5, 4, 4, 2]),
            "upsample_kernel_sizes": h.get("upsample_kernel_sizes", [8, 8, 4, 4]),
            "resblock_kernel_sizes": h.get("resblock_kernel_sizes", [3, 7, 11]),
            "resblock_dilation_sizes": h.get("resblock_dilation_sizes", [[1, 3, 5]] * 3),
            "resblock": h.get("resblock", "1"),
            "sampling_rate": h.get("sampling_rate", 8000),
        }
        cio.save_params(args.dst, params, meta={"kind": "vocoder", "config": cfg, "source": args.src})
    else:
        params = tc.convert_hubert_ckpt(args.src, args.km)
        cio.save_params(args.dst, params, meta={"kind": "hubert", "config": {}, "source": args.src, "km": args.km})
    print(f"wrote {args.dst} (+ .json)")


if __name__ == "__main__":
    main()
