"""HiFi-GAN vocoder training CLI — TPU-native port of hifi-gan/train.py.

Same config JSON (config_covomix.json schema), dataset conventions (random
segment_size crops, on-the-fly mel, optional fine-tuning from precomputed
mels) and checkpointing (auto-resume from the latest step). The DDP/mp.spawn
scaffolding (hifi-gan/train.py:28-64, :276-277) is replaced by a dp mesh."""

import argparse
import glob
import itertools
import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--input_wavs_dir", required=True)
    p.add_argument("--input_validation_dir", default=None, help="held-out wavs for mel-L1 validation")
    p.add_argument("--validation_interval", type=int, default=1000)
    p.add_argument("--input_mels_dir", default=None, help="fine-tuning: precomputed mels")
    p.add_argument("--checkpoint_path", default="cp_hifigan")
    p.add_argument("--config", default="config_covomix.json")
    p.add_argument("--training_steps", type=int, default=400000)
    p.add_argument("--stdout_interval", type=int, default=50)
    p.add_argument("--checkpoint_interval", type=int, default=1000)
    p.add_argument("--seed", type=int, default=1234)
    p.add_argument("--dp", type=int, default=0, help="data-parallel chips (0 = single device)")
    p.add_argument("--num_workers", type=int, default=2, help="prefetch threads (DataLoader num_workers equiv.)")
    p.add_argument("--bf16", action="store_true")
    p.add_argument("--init_g", default=None,
                   help="initialize the generator from a reference g_<step> torch "
                        "checkpoint (converted to the (v,g) training form) or a "
                        "parametrized .npz — continue a reference GAN run here")
    p.add_argument("--init_do", default=None,
                   help="initialize MPD/MSD from a reference do_<step> torch "
                        "checkpoint or a converted hifigan_discriminators .npz "
                        "(optimizer moments start fresh)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.audio import MelConfig, load_wav, mel_spectrogram
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.data.prefetch import PrefetchSampler, device_put_transfer
    from covomix_tpu.models import vocoder as V
    from covomix_tpu.train.gan import GanConfig, GanState, init_gan_state, make_gan_step, export_generator

    with open(args.config) as f:
        h = json.load(f)

    voc_cfg = V.VocoderConfig(
        num_mels=h["num_mels"], upsample_initial_channel=h["upsample_initial_channel"],
        upsample_rates=tuple(h["upsample_rates"]), upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
        resblock=str(h["resblock"]), sampling_rate=h["sampling_rate"],
    )
    sr = h["sampling_rate"]
    mel_cfg = MelConfig(sr, h["n_fft"], h["num_mels"], h["hop_size"], h["win_size"], h["fmin"], h["fmax"])
    fmax_loss = h.get("fmax_for_loss") or sr / 2
    mel_loss_cfg = MelConfig(sr, h["n_fft"], h["num_mels"], h["hop_size"], h["win_size"], h["fmin"], fmax_loss)

    files = sorted(glob.glob(os.path.join(args.input_wavs_dir, "**", "*.wav"), recursive=True))
    assert files, f"no wavs under {args.input_wavs_dir}"
    print(f"{len(files)} training wavs")

    seg = h["segment_size"]
    hop = h["hop_size"]
    batch_size = h["batch_size"]
    fine_tuning = args.input_mels_dir is not None
    frames_per_seg = -(-seg // hop)  # ceil (meldataset.py:146)

    def _mel_path(wav_path):
        stem = os.path.splitext(os.path.basename(wav_path))[0]
        return os.path.join(args.input_mels_dir, stem + ".npy")

    if fine_tuning:
        files = [f for f in files if os.path.isfile(_mel_path(f))]
        assert files, f"no wavs with matching mels in {args.input_mels_dir}"
        print(f"fine-tuning on {len(files)} wav/mel pairs")

    def sample_batch(seed):
        """MelDataset behavior (hifi-gan/meldataset.py:85-169): random
        segment_size crop; scratch mode normalizes *0.95 and the mels are
        computed INSIDE the jitted step; fine-tuning loads the predicted input
        mel from --input_mels_dir and crops wav/mel aligned (:142-160)."""
        rng = random.Random(seed)
        audios, mels = [], []
        for _ in range(batch_size):
            f = rng.choice(files)
            wav, _ = load_wav(f, sr=sr)
            if fine_tuning:
                mel = np.load(_mel_path(f))  # [80, T] or [T, 80]
                if mel.shape[0] == h["num_mels"] and mel.shape[-1] != h["num_mels"]:
                    mel = mel.T  # -> [T, 80]
                if len(wav) >= seg and mel.shape[0] > frames_per_seg + 1:
                    # clamp by the WAV too: a bucket-padded mel can outrun the
                    # audio, and a crop past len(wav) would yield a short row
                    # that crashes np.stack
                    ms_max = min(mel.shape[0] - frames_per_seg - 1,
                                 len(wav) // hop - frames_per_seg)
                    ms = rng.randint(0, max(ms_max, 0)) if ms_max > 0 else 0
                    mel = mel[ms : ms + frames_per_seg]
                    wav = wav[ms * hop : (ms + frames_per_seg) * hop]
                    wav = np.pad(wav, (0, frames_per_seg * hop - len(wav)))
                else:
                    mel = np.pad(mel, ((0, frames_per_seg - mel.shape[0]), (0, 0)),
                                 constant_values=-15.0) if mel.shape[0] < frames_per_seg else mel[:frames_per_seg]
                    wav = np.pad(wav, (0, max(0, frames_per_seg * hop - len(wav))))[: frames_per_seg * hop]
                mels.append(mel.astype(np.float32))
            else:
                wav = wav / max(np.abs(wav).max(), 1e-9) * 0.95
                if len(wav) >= seg:
                    start = rng.randint(0, len(wav) - seg)
                    wav = wav[start : start + seg]
                else:
                    wav = np.pad(wav, (0, seg - len(wav)))
            audios.append(wav.astype(np.float32))
        batch = {"audio": np.stack(audios)}
        if fine_tuning:
            batch["mel"] = np.stack(mels)
        return batch

    gan_cfg = GanConfig(learning_rate=h["learning_rate"], adam_b1=h["adam_b1"], adam_b2=h["adam_b2"],
                        lr_decay=h["lr_decay"], steps_per_epoch=max(1, len(files) // batch_size),
                        segment_size=seg)
    key = jax.random.PRNGKey(args.seed)
    state = init_gan_state(key, voc_cfg, gan_cfg)

    if args.init_g or args.init_do:
        # continue a reference torch GAN run: generator in the exact (v,g)
        # parametrization, discriminators with the reference norm layout
        # (weight_norm + MSD[0] spectral buffers). Optimizer state is fresh.
        from covomix_tpu.checkpoint import torch_convert as tc

        asj = lambda t: jax.tree_util.tree_map(jnp.asarray, t)
        gen_p, mpd_p, msd_p = state.gen_params, state.mpd_params, state.msd_params
        if args.init_g:
            if args.init_g.endswith(".npz"):
                gen_p = asj(cio.load_params(args.init_g))
            else:
                gen_p = asj(tc.convert_hifigan_ckpt(args.init_g, h, parametrized=True))
            print(f"generator initialized from {args.init_g}")
        if args.init_do:
            if args.init_do.endswith(".npz"):
                d = cio.load_params(args.init_do)
                mpd_p, msd_p = asj(d["mpd"]), asj(d["msd"])
            else:
                mpd_p, msd_p = (asj(t) for t in
                                tc.convert_hifigan_discriminators(tc.load_torch_file(args.init_do)))
            print(f"discriminators initialized from {args.init_do}")
        state = GanState(gen_p, mpd_p, msd_p, state.opt_g, state.opt_d, state.step)

    mesh = None
    batch_sharding = None
    if args.dp > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from covomix_tpu.parallel.mesh import make_mesh, replicated, shard_tree

        assert batch_size % args.dp == 0, f"batch {batch_size} not divisible by dp={args.dp}"
        mesh = make_mesh(dp=args.dp, tp=1, devices=jax.devices()[: args.dp])
        state = shard_tree(state, replicated(mesh, state))
        batch_sharding = NamedSharding(mesh, P("dp"))
        print(f"dp mesh over {args.dp} devices")

    step_fn = make_gan_step(voc_cfg, mel_cfg, mel_loss_cfg, gan_cfg,
                            dtype=jnp.bfloat16 if args.bf16 else jnp.float32, mesh=mesh)

    loader = PrefetchSampler(sample_batch, num_workers=max(1, args.num_workers),
                             buffer_size=2, seed=args.seed,
                             transfer=device_put_transfer(batch_sharding))

    os.makedirs(args.checkpoint_path, exist_ok=True)
    start = cio.latest_step(args.checkpoint_path) or 0
    if start:
        state = cio.load_train_state(args.checkpoint_path, start, state)
        print(f"resumed from step {start}")

    # validation: copy-synthesis mel-L1 on held-out wavs + sample audio to TB
    # (hifi-gan/train.py:192-225 rank-0 validation loop)
    from covomix_tpu.train.gan import wn_fold
    from covomix_tpu.util.logging_utils import MetricsLogger

    logger = MetricsLogger(args.checkpoint_path)
    val_files = sorted(glob.glob(os.path.join(args.input_validation_dir, "**", "*.wav"),
                                 recursive=True))[:8] if args.input_validation_dir else []

    import functools as _functools

    from covomix_tpu.models import vocoder as Vm

    # built ONCE: a fresh jax.jit wrapper per validate() call would retrace
    # the generator every interval. fuse_tail=False: validation runs once per
    # interval on one shape; not worth the fused tail kernel's long
    # first-compile mid-training
    _val_voc = jax.jit(_functools.partial(Vm.generator, cfg=voc_cfg, fuse_tail=False))

    def validate(state, step_i):
        gen = wn_fold(state.gen_params) if gan_cfg.weight_norm else state.gen_params
        voc = _val_voc
        errs = []
        for vi, f in enumerate(val_files):
            wav, _ = load_wav(f, sr=sr)
            wav = wav[: seg] if len(wav) >= seg else np.pad(wav, (0, seg - len(wav)))
            mel = np.asarray(mel_spectrogram(wav[None], mel_cfg)).transpose(0, 2, 1)
            y_hat = np.asarray(voc(gen, mel=jnp.asarray(mel)))[0][: len(wav)]
            mel_hat = np.asarray(mel_spectrogram(y_hat[None], mel_loss_cfg))
            mel_ref = np.asarray(mel_spectrogram(wav[None], mel_loss_cfg))
            errs.append(float(np.mean(np.abs(mel_hat - mel_ref))))
            if vi == 0:
                logger.log_audio(step_i, "validation/sample", y_hat, sr)
        val = float(np.mean(errs)) if errs else float("nan")
        logger.log(step_i, {"validation_mel_l1": val})
        print(json.dumps({"step": step_i, "validation_mel_l1": round(val, 4)}), flush=True)

    t0 = time.time()
    for step_i in range(start, args.training_steps):
        state, metrics = step_fn(state, next(loader))
        if (step_i + 1) % args.stdout_interval == 0:
            m = {k: round(float(v), 4) for k, v in metrics.items()}
            print(json.dumps({"step": step_i + 1, **m,
                              "sps": round(args.stdout_interval / (time.time() - t0), 2)}), flush=True)
            t0 = time.time()
        if val_files and (step_i + 1) % args.validation_interval == 0:
            validate(state, step_i + 1)
        if (step_i + 1) % args.checkpoint_interval == 0:
            cio.save_train_state(args.checkpoint_path, jax.device_get(state), step_i + 1)
            gen = export_generator(state, gan_cfg)
            cio.save_params(os.path.join(args.checkpoint_path, f"g_{step_i + 1:08d}.npz"),
                            jax.device_get(gen), meta={"kind": "vocoder", "config": {
                                "num_mels": voc_cfg.num_mels,
                                "upsample_initial_channel": voc_cfg.upsample_initial_channel,
                                "upsample_rates": list(voc_cfg.upsample_rates),
                                "upsample_kernel_sizes": list(voc_cfg.upsample_kernel_sizes),
                                "resblock_kernel_sizes": list(voc_cfg.resblock_kernel_sizes),
                                "resblock_dilation_sizes": [list(d) for d in voc_cfg.resblock_dilation_sizes],
                                "resblock": voc_cfg.resblock,
                                "sampling_rate": voc_cfg.sampling_rate}})


if __name__ == "__main__":
    main()
