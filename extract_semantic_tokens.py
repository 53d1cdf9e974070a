"""Batch HuBERT semantic-token extraction — TPU-native port of
fairseq-hubert/get_fisher_semantic_tokens_parallel.py.

Globs wavs under --data_dir (optionally the Fisher `*A.wav`/`*B.wav` channel
convention), runs the HuBERT tokenizer (layer-12 features + 500-unit k-means)
and writes `<name>.hubert_code.npy` next to each wav as a STRING array for
drop-in compatibility with the reference consumers (they `.astype(int)`;
get_fisher_semantic_tokens_parallel.py:32-34, data_module.py:379).

TPU-first: instead of a ThreadPoolExecutor over per-file GPU calls, files are
length-bucketed (covomix_tpu.native.batch_by_size) and run as padded batches
with attention masking, keeping the MXU fed."""

import argparse
import glob
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--data_dir", type=str, required=True)
    p.add_argument("--pattern", type=str, default="*.wav")
    p.add_argument("--hubert_ckpt", type=str, default=None,
                   help="fairseq hubert_fisher.pt or converted .npz; random init if omitted (smoke mode)")
    p.add_argument("--km_path", type=str, default=None, help="joblib k-means .bin (500 units)")
    p.add_argument("--out_dir", type=str, default=None, help="default: next to each wav")
    p.add_argument("--channel", type=int, default=None, help="channel index for multi-channel wavs")
    p.add_argument("--batch_tokens", type=int, default=16000 * 120, help="max total samples per batch")
    p.add_argument("--suffix", type=str, default=".hubert_code.npy")
    p.add_argument("--bf16", action="store_true")
    args = p.parse_args()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.audio import load_wav
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import hubert as H
    from covomix_tpu.native import batch_by_size

    cfg = H.HubertConfig()
    if args.hubert_ckpt is None:
        print("WARNING: no --hubert_ckpt; using random weights (token ids will be meaningless)")
        params = jax.jit(H.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    elif args.hubert_ckpt.endswith(".npz"):
        params = cio.load_params(args.hubert_ckpt)
    else:
        from covomix_tpu.checkpoint.torch_convert import convert_hubert_ckpt

        params = convert_hubert_ckpt(args.hubert_ckpt, args.km_path)
    if args.km_path and not (args.hubert_ckpt and not args.hubert_ckpt.endswith(".npz")):
        # load the supplied centroids whenever the .pt conversion above didn't
        # already merge them — previously a --km_path without --hubert_ckpt
        # was silently dropped, leaving the random k-means in place
        from covomix_tpu.checkpoint.torch_convert import load_kmeans

        params["kmeans"] = jnp.asarray(load_kmeans(args.km_path))

    files = sorted(glob.glob(os.path.join(args.data_dir, "**", args.pattern), recursive=True))
    print(f"{len(files)} wavs")
    dtype = jnp.bfloat16 if args.bf16 else jnp.float32

    # read lengths for bucketing (headers only would be nicer; load lazily)
    wavs, lengths = [], []
    for f in files:
        w, _ = load_wav(f, sr=cfg.sample_rate, channel=args.channel)
        if cfg.normalize:
            w = (w - w.mean()) / np.sqrt(w.var() + 1e-5)
        wavs.append(w)
        lengths.append(len(w))

    BUCKET = 16000 * 5  # pad waveforms to 5 s multiples
    fn = jax.jit(functools.partial(H.wav2units_jit, cfg=cfg, dtype=dtype))
    t0 = time.time()
    total_frames = 0
    for batch_idx in batch_by_size(lengths, max_tokens=args.batch_tokens, max_sentences=16):
        max_len = max(lengths[i] for i in batch_idx)
        padded = ((max_len + BUCKET - 1) // BUCKET) * BUCKET
        batch = np.zeros((len(batch_idx), padded), np.float32)
        frames_valid = []
        for row, i in enumerate(batch_idx):
            batch[row, : lengths[i]] = wavs[i]
            frames_valid.append(H.num_output_frames(cfg, lengths[i]))
        n_frames = H.num_output_frames(cfg, padded)
        mask = np.arange(n_frames)[None, :] < np.asarray(frames_valid)[:, None]
        # valid_samples: group-norm statistics over true samples only — padded
        # batch extraction equals per-file exact-length extraction bit-for-bit
        ids = np.asarray(fn(params, wav=jnp.asarray(batch), padding_mask=jnp.asarray(mask),
                            valid_samples=jnp.asarray([lengths[i] for i in batch_idx], jnp.int32)))
        for row, i in enumerate(batch_idx):
            if args.out_dir:
                # mirror the subpath: flattening would let same-named wavs
                # from different subdirectories overwrite each other
                rel = os.path.relpath(os.path.dirname(files[i]), args.data_dir)
                out_dir = os.path.normpath(os.path.join(args.out_dir, rel))
            else:
                out_dir = os.path.dirname(files[i])
            os.makedirs(out_dir, exist_ok=True)
            name = os.path.basename(files[i]).rsplit(".wav", 1)[0] + args.suffix
            codes = ids[row, : frames_valid[row]].astype(str)  # string array, reference format
            np.save(os.path.join(out_dir, name), codes)
            total_frames += frames_valid[row]
    wall = time.time() - t0
    audio_s = sum(lengths) / cfg.sample_rate
    print(f"done: {total_frames} tokens from {audio_s:.0f}s audio in {wall:.1f}s "
          f"({audio_s / max(wall, 1e-9):.1f}x realtime)")


if __name__ == "__main__":
    main()
