"""Training loop: EMA semantics, LR schedule, GAN step, checkpoint roundtrip."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from covomix_tpu.models import acoustic as A
from covomix_tpu.train.loop import (TrainConfig, acoustic_loss_fn, ema_update,
                                    init_train_state, make_train_step, reference_lr_schedule)

CFG = A.AcousticConfig(dim_in=80, dim=32, depth=2, heads=2, dim_head=16, dim_phoneme_emb=16, num_phoneme_tokens=502)


def test_ema_matches_torch_ema_ramp():
    """torch_ema increments num_updates BEFORE computing the ramp:
    decay_t = min(d, (1+n)/(10+n)) with post-increment n; shadow -=
    (1-d)(shadow-p). First update (stored count 0 -> n=1) uses d = 2/11."""
    ema = {"w": jnp.ones((3,))}
    params = {"w": jnp.zeros((3,))}
    out = ema_update(ema, params, jnp.int32(0), 0.999)
    np.testing.assert_allclose(np.asarray(out["w"]), 2.0 / 11.0, atol=1e-6)
    out2 = ema_update(ema, params, jnp.int32(100000), 0.999)
    np.testing.assert_allclose(np.asarray(out2["w"]), 0.999, atol=1e-6)


def test_reference_lr_schedule_shape():
    cfg = TrainConfig(lr=1e-4, use_lr_schedule=True, total_epochs=500,
                      wake_up_epochs=15, decay_start_epoch=30, steps_per_epoch=10)
    sched = reference_lr_schedule(cfg)
    # warmup: epoch 0 -> lr/15
    np.testing.assert_allclose(float(sched(jnp.int32(0))), 1e-4 / 15, rtol=1e-5)
    # flat region
    np.testing.assert_allclose(float(sched(jnp.int32(20 * 10))), 1e-4, rtol=1e-5)
    # decay end -> 0
    assert float(sched(jnp.int32(499 * 10))) < 1e-5
    assert float(sched(jnp.int32(520 * 10))) == 0.0  # clamped


def test_train_step_reduces_loss():
    key = jax.random.PRNGKey(0)
    params = jax.jit(A.init, static_argnums=1)(key, CFG)
    cfg = TrainConfig(lr=3e-4)
    state = init_train_state(params, cfg)
    step = make_train_step(acoustic_loss_fn(CFG), cfg, donate=False)
    batch = {
        "x": jax.random.normal(key, (2, 16, 80)) * 0.1,
        "phonemes": jax.random.randint(key, (2, 16), 0, 502),
        "mask": jnp.ones((2, 16), bool),
    }
    losses = []
    for i in range(8):
        state, m = step(state, batch, jax.random.PRNGKey(42))  # fixed key = fixed noise
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0]
    assert int(state.step) == 8
    # EMA params differ from params but track them
    d = jax.tree_util.tree_reduce(
        lambda a, xy: a + float(jnp.sum(jnp.abs(xy))),
        jax.tree_util.tree_map(lambda e, p: e - p, state.ema_params, state.params), 0.0)
    assert d > 0


def test_gan_step_runs_and_weight_norm_roundtrip():
    from covomix_tpu.audio.mel import MelConfig
    from covomix_tpu.models import vocoder as V
    from covomix_tpu.train.gan import GanConfig, init_gan_state, make_gan_step, wn_fold, wn_split, export_generator

    voc_cfg = V.VocoderConfig(upsample_initial_channel=16)
    mel_cfg = MelConfig()
    gan_cfg = GanConfig(segment_size=1600, steps_per_epoch=5)
    key = jax.random.PRNGKey(0)

    # (v,g) roundtrip is identity
    gen = V.init_generator(key, voc_cfg)
    gen2 = wn_fold(wn_split(gen))
    for a, b in zip(jax.tree_util.tree_leaves(gen), jax.tree_util.tree_leaves(gen2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    state = init_gan_state(key, voc_cfg, gan_cfg)
    frames = gan_cfg.segment_size // 160
    wav = jax.random.normal(key, (1, gan_cfg.segment_size)) * 0.1
    import numpy as onp
    from covomix_tpu.audio.mel import mel_spectrogram

    mel = jnp.asarray(onp.asarray(mel_spectrogram(wav, mel_cfg)).transpose(0, 2, 1))
    step = make_gan_step(voc_cfg, mel_cfg, mel_cfg, gan_cfg)
    batch = {"mel": mel, "audio": wav, "mel_loss_target": mel}
    state, metrics = step(state, batch)
    for k in ("loss_disc", "loss_gen", "mel_error"):
        assert np.isfinite(float(metrics[k])), k
    assert int(state.step) == 1
    # export folds weight norm -> generator params have plain 'w'
    exported = export_generator(state, gan_cfg)
    assert "w" in exported["conv_pre"]


def test_npz_checkpoint_roundtrip(tmp_path):
    from covomix_tpu.checkpoint import io as cio

    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), CFG)
    path = str(tmp_path / "p.npz")
    cio.save_params(path, params, meta={"kind": "acoustic", "config": {"dim": 32}})
    loaded = cio.load_params(path)
    for a, b in zip(jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert cio.load_meta(path)["config"]["dim"] == 32


def test_metrics_logger_wandb_fallback(tmp_path, capsys):
    """W&B sink requested (reference default, train.py:64-69) but wandb is not
    installed here: the logger notes it once and the offline sinks carry the
    run; with --no_wandb semantics (wandb=False) no note is printed."""
    import json as _json

    from covomix_tpu.util.logging_utils import MetricsLogger

    lg = MetricsLogger(str(tmp_path / "r1"), wandb=True)
    lg.log(1, {"loss": 0.25})
    lg.close()
    assert "W&B sink unavailable" in capsys.readouterr().out
    rec = _json.loads(open(tmp_path / "r1" / "metrics.jsonl").read().strip())
    assert rec["loss"] == 0.25

    lg = MetricsLogger(str(tmp_path / "r2"), wandb=False)
    lg.log(1, {"loss": 0.5})
    lg.close()
    assert "W&B" not in capsys.readouterr().out


def test_grad_accum_matches_mean_of_microbatch_grads():
    """accumulated_value_and_grad == mean of per-micro-batch value_and_grad
    (DDP per-rank averaging semantics, reference train.py:82)."""
    from covomix_tpu.train.loop import accumulated_value_and_grad, acoustic_loss_fn

    key = jax.random.PRNGKey(0)
    params = A.init(key, CFG)
    loss_fn = acoustic_loss_fn(CFG)
    A_, b, T = 3, 2, 24
    rs = np.random.RandomState(1)
    batch = {
        "x": jnp.asarray(rs.randn(A_, b, T, 80).astype(np.float32)),
        "phonemes": jnp.asarray(rs.randint(0, 502, (A_, b, T))),
        "mask": jnp.asarray(rs.rand(A_, b, T) > 0.3),
    }
    k = jax.random.PRNGKey(7)
    loss_acc, grads_acc = jax.jit(accumulated_value_and_grad(loss_fn, A_))(params, batch, k)

    keys = jax.random.split(k, A_)
    losses, grads = [], []
    for i in range(A_):
        mb = jax.tree_util.tree_map(lambda a, i=i: a[i], batch)
        l, g = jax.value_and_grad(loss_fn)(params, mb, keys[i])
        losses.append(float(l))
        grads.append(g)
    np.testing.assert_allclose(float(loss_acc), np.mean(losses), rtol=1e-5)
    mean_g = jax.tree_util.tree_map(lambda *gs: sum(np.asarray(x, np.float64) for x in gs) / A_, *grads)
    flat_a, _ = jax.tree_util.tree_flatten(grads_acc)
    flat_m, _ = jax.tree_util.tree_flatten(mean_g)
    for ga, gm in zip(flat_a, flat_m):
        np.testing.assert_allclose(np.asarray(ga, np.float64), gm, rtol=2e-4, atol=1e-6)


def test_grad_accum_train_step_trajectory():
    """3 optimizer steps with grad_accum=2 == 3 steps on the equivalent flat
    batch when micro-batches have identical valid counts (mean of means ==
    global mean)."""
    from covomix_tpu.train.loop import acoustic_loss_fn, make_train_step

    key = jax.random.PRNGKey(3)
    params = A.init(key, CFG)
    cfg1 = TrainConfig(lr=1e-3)
    cfg2 = TrainConfig(lr=1e-3, grad_accum=2)
    loss_fn = acoustic_loss_fn(CFG)
    s1 = init_train_state(params, cfg1)
    s2 = init_train_state(params, cfg2)
    step1 = make_train_step(loss_fn, cfg1, donate=False)
    step2 = make_train_step(loss_fn, cfg2, donate=False)
    rs = np.random.RandomState(5)
    T = 16
    for i in range(3):
        x = rs.randn(4, T, 80).astype(np.float32)
        ph = rs.randint(0, 502, (4, T))
        mask = np.ones((4, T), bool)   # equal valid counts per micro-batch
        k = jax.random.PRNGKey(50 + i)
        # flat step must see the same per-example keys as the accum step:
        # accumulate manually with the split keys for the reference trajectory
        keys = jax.random.split(k, 2)
        l0, g0 = jax.value_and_grad(loss_fn)(s1.params, {"x": jnp.asarray(x[:2]), "phonemes": jnp.asarray(ph[:2]), "mask": jnp.asarray(mask[:2])}, keys[0])
        l1, g1 = jax.value_and_grad(loss_fn)(s1.params, {"x": jnp.asarray(x[2:]), "phonemes": jnp.asarray(ph[2:]), "mask": jnp.asarray(mask[2:])}, keys[1])
        import optax
        from covomix_tpu.train.loop import TrainState, ema_update, make_optimizer
        tx = make_optimizer(cfg1)
        grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
        updates, opt_state = tx.update(grads, s1.opt_state, s1.params)
        new_params = optax.apply_updates(s1.params, updates)
        ema = ema_update(s1.ema_params, new_params, s1.ema_num_updates, cfg1.ema_decay)
        s1 = TrainState(new_params, opt_state, ema, s1.ema_num_updates + 1, s1.step + 1)

        batch2 = {"x": jnp.asarray(x.reshape(2, 2, T, 80)),
                  "phonemes": jnp.asarray(ph.reshape(2, 2, T)),
                  "mask": jnp.asarray(mask.reshape(2, 2, T))}
        s2, m2 = step2(s2, batch2, k)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params), jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_multi_step_matches_sequential_single_steps():
    """make_multi_step(k) == k make_train_step calls when fed the same
    per-step batches and keys fold_in(key, i) (NOTES_r5.md §5: the unrolled
    dispatch is a pure perf transform, bit-identical math)."""
    from covomix_tpu.train.loop import acoustic_loss_fn, make_multi_step, make_train_step

    K = 3
    key = jax.random.PRNGKey(11)
    params = A.init(key, CFG)
    cfg = TrainConfig(lr=1e-3)
    loss_fn = acoustic_loss_fn(CFG)
    rs = np.random.RandomState(9)
    T = 16
    batches = [{
        "x": jnp.asarray(rs.randn(2, T, 80).astype(np.float32)),
        "phonemes": jnp.asarray(rs.randint(0, 502, (2, T))),
        "mask": jnp.asarray(rs.rand(2, T) > 0.2),
    } for _ in range(K)]
    k = jax.random.PRNGKey(77)

    s_ref = init_train_state(params, cfg)
    step1 = make_train_step(loss_fn, cfg, donate=False)
    ref_losses = []
    for i in range(K):
        s_ref, m = step1(s_ref, batches[i], jax.random.fold_in(k, i))
        ref_losses.append(float(m["loss"]))

    s_multi = init_train_state(params, cfg)
    stepK = make_multi_step(loss_fn, cfg, K, donate=False)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
    s_multi, mK = stepK(s_multi, stacked, k)

    assert mK["loss"].shape == (K,)
    np.testing.assert_allclose(np.asarray(mK["loss"]), ref_losses, rtol=1e-5)
    assert int(s_multi.step) == K
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.params),
                    jax.tree_util.tree_leaves(s_multi.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s_ref.ema_params),
                    jax.tree_util.tree_leaves(s_multi.ema_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)


def test_stack_microbatches_pads_with_collate_values():
    from covomix_tpu.data.datasets import stack_microbatches

    b1 = {"x": np.zeros((2, 8, 80), np.float32), "phonemes": np.zeros((2, 8), np.int64),
          "mask": np.ones((2, 8), bool)}
    b2 = {"x": np.zeros((2, 12, 80), np.float32), "phonemes": np.zeros((2, 12), np.int64),
          "mask": np.ones((2, 12), bool)}
    out = stack_microbatches([b1, b2])
    assert out["x"].shape == (2, 2, 12, 80)
    assert (out["x"][0, :, 8:] == -15.0).all()
    assert (out["phonemes"][0, :, 8:] == 501).all()
    assert (~out["mask"][0, :, 8:]).all()
    assert out["mask"][1].all()


def test_spectral_norm_matches_torch():
    """sn_split/sn_power_iter/sn_fold vs torch.nn.utils.spectral_norm(dim=0):
    same buffers after k power iterations, same effective weight (MSD
    sub-discriminator 0's norm, hifi-gan/models.py:223)."""
    import torch

    from covomix_tpu.train import gan as G

    torch.manual_seed(0)
    O, I, K = 8, 6, 5
    conv = torch.nn.Conv1d(I, O, K, bias=False)
    sn = torch.nn.utils.spectral_norm(conv)          # dim=0, 1 power iteration
    w_orig = sn.weight_orig.detach().numpy().copy()  # [O, I, K]
    u0 = sn.weight_u.detach().numpy().copy()         # [O]
    v0 = sn.weight_v.detach().numpy().copy()         # [I*K], (i,k) flat order
    # ours: w [K, I, O]; v flat order is (k,i) -> permute torch's v
    node = {"w": jnp.asarray(w_orig.transpose(2, 1, 0)),
            "b": jnp.zeros((O,), jnp.float32),
            "u": jnp.asarray(u0),
            "v": jnp.asarray(v0.reshape(I, K).T.ravel())}
    x = torch.randn(1, I, 32)
    for _ in range(3):
        sn(x)                      # train-mode forward: one buffer update
        node = G.sn_power_iter(node)
    np.testing.assert_allclose(np.asarray(node["u"]), sn.weight_u.detach().numpy(),
                               atol=1e-5)
    sn.eval()
    sn(x)                          # eval forward: compute weight, no update
    w_eff = conv.weight.detach().numpy()             # [O, I, K] = w_orig / sigma
    ours = np.asarray(G.sn_fold(node)["w"]).transpose(2, 1, 0)
    np.testing.assert_allclose(ours, w_eff, atol=1e-5)


def test_gan_state_checkpoint_roundtrip_with_spectral_buffers(tmp_path):
    """GanState (incl. MSD[0]'s spectral u/v buffers) survives the orbax
    save/load cycle — the auto-resume path for GAN training."""
    from covomix_tpu.audio.mel import MelConfig
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import vocoder as V
    from covomix_tpu.train.gan import GanConfig, init_gan_state

    voc_cfg = V.VocoderConfig(upsample_initial_channel=16)
    state = init_gan_state(jax.random.PRNGKey(0), voc_cfg, GanConfig(segment_size=1600))
    cio.save_train_state(str(tmp_path), jax.device_get(state), 7)
    loaded = cio.load_train_state(str(tmp_path), 7, state)
    for a, b in zip(jax.tree_util.tree_leaves(state), jax.tree_util.tree_leaves(loaded)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the spectral buffers are present on MSD[0] and absent on MSD[1]
    d0 = loaded.msd_params["discriminators"][0]["convs"][0]
    d1 = loaded.msd_params["discriminators"][1]["convs"][0]
    assert "u" in d0 and "v" in d0 and "u" not in d1 and "g" in d1
