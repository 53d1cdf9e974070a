"""HiFi-GAN inference + copy-synthesis eval — ports hifi-gan/inference.py and
hifi-gan/inference_e2e.py.

Modes:
  --input_wavs_dir : wav -> mel -> wav copy synthesis, with SI-SNR / STOI /
                     ESTOI / MCD vs the input (hifi-gan/inference.py:44-80)
  --input_mels_dir : mel.npy -> wav (hifi-gan/inference_e2e.py:35-62)
"""

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--checkpoint_file", required=True, help=".npz or torch g_<step>")
    p.add_argument("--config", default=None)
    p.add_argument("--input_wavs_dir", default=None)
    p.add_argument("--input_mels_dir", default=None)
    p.add_argument("--output_dir", default="generated_files")
    p.add_argument("--metrics_csv", default=None)
    p.add_argument("--fuse_tail", action="store_true",
                   help="use the fused Pallas tail kernel (fastest steady-state "
                        "throughput, but a long Mosaic first-compile per mel-length "
                        "bucket; worthwhile for large batch jobs, not one-offs)")
    args = p.parse_args()
    assert args.input_wavs_dir or args.input_mels_dir

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.audio import MelConfig, load_wav, mel_spectrogram, save_wav
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import vocoder as V
    from covomix_tpu.util.metrics import estoi, mcd, si_sdr, stoi
    from covomix_tpu.util.pesq_nb import pesq_nb

    if args.checkpoint_file.endswith(".npz"):
        params = cio.load_params(args.checkpoint_file)
        meta = cio.load_meta(args.checkpoint_file)
        c = dict(meta.get("config", {}))
        if args.config:
            # npz meta carries model-structure keys but not always the mel
            # analysis params (n_fft/hop/win/fmin/fmax) — --config overlays
            # them, else a non-default vocoder would copy-synthesize at the
            # covomix defaults with no error
            with open(args.config) as f:
                c.update(json.load(f))
    else:
        from covomix_tpu.checkpoint.torch_convert import convert_hifigan_ckpt

        cfg_file = args.config or os.path.join(os.path.dirname(args.checkpoint_file), "vocoder_config.json")
        with open(cfg_file) as f:
            c = json.load(f)
        params = convert_hifigan_ckpt(args.checkpoint_file, c)

    voc_cfg = V.VocoderConfig(
        num_mels=int(c.get("num_mels", 80)),
        upsample_initial_channel=int(c.get("upsample_initial_channel", 500)),
        upsample_rates=tuple(c.get("upsample_rates", [5, 4, 4, 2])),
        upsample_kernel_sizes=tuple(c.get("upsample_kernel_sizes", [8, 8, 4, 4])),
        resblock_kernel_sizes=tuple(c.get("resblock_kernel_sizes", [3, 7, 11])),
        resblock_dilation_sizes=tuple(tuple(d) for d in c.get("resblock_dilation_sizes", [[1, 3, 5]] * 3)),
        resblock=str(c.get("resblock", "1")),
        sampling_rate=int(c.get("sampling_rate", 8000)),
    )
    sr = voc_cfg.sampling_rate
    mel_cfg = MelConfig(sr, int(c.get("n_fft", 480)), voc_cfg.num_mels, int(c.get("hop_size", 160)),
                        int(c.get("win_size", 480)), float(c.get("fmin", 0)), float(c.get("fmax", sr / 2)))
    _voc_fn = jax.jit(functools.partial(V.generator, cfg=voc_cfg,
                                        fuse_tail=True if args.fuse_tail else False))
    MEL_PAD = -15.0  # training-time pad value (data_module.py:846)

    def voc_fn(params, mel):
        """Vocode with mel frames bucketed to multiples of 64 so repeated
        calls reuse one compiled executable per bucket (each new length
        otherwise recompiles).

        Default path: `valid_len` (a traced scalar — still one executable per
        bucket) re-zeroes pad frames after every generator conv, so the
        trimmed output EQUALS exact-length (reference-convention) inference
        (tests/test_vocoder.py::test_generator_valid_len_bucketed_equals_exact).
        With --fuse_tail the Pallas kernel is static-length and pad frames
        (mel floor ~ silence) sit inside the generator's ~16-frame receptive
        field: the last ~0.3 s of each wav is an APPROXIMATION of
        exact-length inference (bounded by the silence fill), traded for the
        kernel's throughput."""
        t = mel.shape[1]
        tb = -(-t // 64) * 64
        if tb != t:
            mel = jnp.pad(mel, ((0, 0), (0, tb - t), (0, 0)), constant_values=MEL_PAD)
        if args.fuse_tail:
            out = _voc_fn(params, mel=mel)
        else:
            out = _voc_fn(params, mel=mel, valid_len=jnp.int32(t))
        return out[:, : V.output_length(voc_cfg, t)]

    os.makedirs(args.output_dir, exist_ok=True)
    rows = []
    if args.input_wavs_dir:
        for f in sorted(glob.glob(os.path.join(args.input_wavs_dir, "*.wav"))):
            wav, _ = load_wav(f, sr=sr)
            mel = np.asarray(mel_spectrogram(wav[None], mel_cfg))  # [1, 80, T]
            t0 = time.time()
            out = np.asarray(voc_fn(params, mel=jnp.asarray(mel.transpose(0, 2, 1))))[0]
            wall = time.time() - t0
            name = os.path.basename(f).replace(".wav", "_generated.wav")
            save_wav(os.path.join(args.output_dir, name), out, sr)
            n = min(len(wav), len(out))
            mel_out = np.asarray(mel_spectrogram(out[None], mel_cfg))[0].T
            rows.append({
                "file": os.path.basename(f),
                "pesq_nb_approx": round(pesq_nb(wav[:n], out[:n], sr), 4),
                "si_snr": round(si_sdr(wav[:n], out[:n]), 3),
                "stoi": round(stoi(wav[:n], out[:n], sr), 4),
                "estoi": round(estoi(wav[:n], out[:n], sr), 4),
                "mcd_db": round(mcd(mel[0].T, mel_out), 4),
                "rtf": round(wall / (len(out) / sr), 4),
            })
            print(rows[-1])
    else:
        for f in sorted(glob.glob(os.path.join(args.input_mels_dir, "*.npy"))):
            mel = np.load(f)
            if mel.shape[0] != voc_cfg.num_mels:
                mel = mel.T
            out = np.asarray(voc_fn(params, mel=jnp.asarray(mel.T[None])))[0]
            name = os.path.basename(f).replace(".npy", "_generated_e2e.wav")
            save_wav(os.path.join(args.output_dir, name), out, sr)
            print("wrote", name)

    if rows:
        import csv

        means = {k: float(np.mean([r[k] for r in rows])) for k in rows[0] if k != "file"}
        print("mean:", json.dumps(means))
        if args.metrics_csv:
            with open(args.metrics_csv, "w", newline="") as f:
                w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
                w.writeheader()
                w.writerows(rows)


if __name__ == "__main__":
    main()
