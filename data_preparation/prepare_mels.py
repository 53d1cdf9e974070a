"""Batch mel extraction: wavs -> `.mel.npy` (8 kHz / 20 ms CoVoMix config).

Port of data_preparation/prepare_8k_mel_20ms.py's mel path (the pyworld f0 /
mcep helpers there are unused by the released models). Runs the XLA mel
frontend in length-bucketed batches."""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import covomix_tpu.util.jaxcache  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_path", required=True)
    p.add_argument("--save_path", default=None, help="default: next to each wav")
    p.add_argument("--sample_rate", type=int, default=8000)
    p.add_argument("--n_fft", type=int, default=480)
    p.add_argument("--hop_size", type=int, default=160)
    p.add_argument("--win_size", type=int, default=480)
    p.add_argument("--num_mels", type=int, default=80)
    p.add_argument("--fmin", type=float, default=0.0)
    p.add_argument("--fmax", type=float, default=4000.0)
    p.add_argument("--channel", type=int, default=None)
    args = p.parse_args()

    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.audio import MelConfig, load_wav, mel_spectrogram
    from covomix_tpu.audio.mel import mel_frames_for_samples
    from covomix_tpu.native import batch_by_size

    cfg = MelConfig(args.sample_rate, args.n_fft, args.num_mels, args.hop_size, args.win_size, args.fmin, args.fmax)
    files = sorted(glob.glob(os.path.join(args.data_path, "**", "*.wav"), recursive=True))
    print(f"{len(files)} wavs")
    wavs, lengths = [], []
    for f in files:
        w, _ = load_wav(f, sr=cfg.sample_rate, channel=args.channel)
        wavs.append(np.clip(w, -1, 1))
        lengths.append(len(w))
    BUCKET = cfg.sample_rate * 5
    for batch_idx in batch_by_size(lengths, max_tokens=cfg.sample_rate * 600, max_sentences=32):
        max_len = max(lengths[i] for i in batch_idx)
        padded = ((max_len + BUCKET - 1) // BUCKET) * BUCKET
        batch = np.zeros((len(batch_idx), padded), np.float32)
        for row, i in enumerate(batch_idx):
            L = lengths[i]
            batch[row, :L] = wavs[i]
            # reflect the row's own tail into the pad region: the reference's
            # per-file extraction reflect-pads at the TRUE end, so the last
            # frames' windows must see the mirrored signal, not batch zeros
            # (frames whose window crosses L differ otherwise)
            refl = min(cfg.n_fft, L - 1, padded - L)
            if refl > 0:
                batch[row, L : L + refl] = wavs[i][L - 1 - refl : L - 1][::-1]
        mels = np.asarray(mel_spectrogram(jnp.asarray(batch), cfg))
        for row, i in enumerate(batch_idx):
            nf = mel_frames_for_samples(lengths[i], cfg)
            if args.save_path:
                # mirror the subpath under save_path: a flat dir would let
                # same-named wavs from different subdirs overwrite each other
                rel = os.path.relpath(os.path.dirname(files[i]), args.data_path)
                out_dir = os.path.normpath(os.path.join(args.save_path, rel))
            else:
                out_dir = os.path.dirname(files[i])
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.basename(files[i]).rsplit(".wav", 1)[0] + ".mel.npy"
            np.save(os.path.join(out_dir, name), mels[row, :, :nf])
    print("done")


if __name__ == "__main__":
    main()
