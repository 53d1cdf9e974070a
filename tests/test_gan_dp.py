"""HiFi-GAN training: dp-mesh sharded step + in-step mel + fine-tuning batch.

Covers the capabilities behind hifigan_train.py's --dp / --input_mels_dir
flags (reference: hifi-gan/train.py:61-64 DDP at batch 80;
meldataset.py:142-166 fine-tuning crops)."""

import numpy as np
import jax
import jax.numpy as jnp

from covomix_tpu.audio.mel import MelConfig, mel_spectrogram
from covomix_tpu.models import vocoder as V
from covomix_tpu.parallel.mesh import make_mesh, replicated, shard_tree
from covomix_tpu.train.gan import GanConfig, init_gan_state, make_gan_step

VOC = V.VocoderConfig(upsample_initial_channel=16)
MELC = MelConfig()
GANC = GanConfig(segment_size=1600, steps_per_epoch=5)


def _batch(b=4, seed=0):
    wav = jax.random.normal(jax.random.PRNGKey(seed), (b, GANC.segment_size)) * 0.1
    return {"audio": wav}


def test_audio_only_batch_computes_mel_in_step():
    state = init_gan_state(jax.random.PRNGKey(0), VOC, GANC)
    step = make_gan_step(VOC, MELC, MELC, GANC)
    state, metrics = step(state, _batch(b=2))
    for k in ("loss_disc", "loss_gen", "mel_error"):
        assert np.isfinite(float(metrics[k])), k


def test_dp_sharded_step_matches_single_device():
    """Same batch, same init: dp=4 mesh step must equal the single-device step
    (grad all-reduce over 'dp' == serial full-batch grad)."""
    batch = _batch(b=4, seed=3)

    state1 = init_gan_state(jax.random.PRNGKey(1), VOC, GANC)
    step1 = make_gan_step(VOC, MELC, MELC, GANC)
    _, m1 = step1(state1, batch)

    mesh = make_mesh(dp=4, tp=1, devices=jax.devices()[:4])
    state2 = init_gan_state(jax.random.PRNGKey(1), VOC, GANC)
    state2 = shard_tree(state2, replicated(mesh, state2))
    from jax.sharding import NamedSharding, PartitionSpec as P

    sharded_batch = jax.device_put(batch, NamedSharding(mesh, P("dp")))
    step2 = make_gan_step(VOC, MELC, MELC, GANC, mesh=mesh)
    _, m2 = step2(state2, sharded_batch)

    for k in ("loss_disc", "loss_gen", "mel_error"):
        np.testing.assert_allclose(float(m1[k]), float(m2[k]), rtol=2e-4, err_msg=k)


def test_finetuning_batch_uses_precomputed_mel():
    """Fine-tuning: input mel comes from the batch (predicted mels), mel-L1
    target still from the waveform (meldataset.py:142-166)."""
    wav = jax.random.normal(jax.random.PRNGKey(5), (2, GANC.segment_size)) * 0.1
    true_mel = jnp.swapaxes(mel_spectrogram(wav, MELC), 1, 2)
    fake_mel = true_mel + 1.0  # "predicted" mels differ from copy-synthesis
    state = init_gan_state(jax.random.PRNGKey(0), VOC, GANC)
    step = make_gan_step(VOC, MELC, MELC, GANC)
    s1, m_true = step(state, {"audio": wav, "mel": true_mel})
    state2 = init_gan_state(jax.random.PRNGKey(0), VOC, GANC)
    s2, m_fake = step(state2, {"audio": wav, "mel": fake_mel})
    # different input mels -> different generator losses (mel actually consumed)
    assert abs(float(m_true["loss_gen"]) - float(m_fake["loss_gen"])) > 1e-6
