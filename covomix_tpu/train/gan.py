"""HiFi-GAN adversarial training, TPU-native (hifi-gan/train.py capability).

Reference loop (hifi-gan/train.py:26-235): per batch
  D step: MPD + MSD LSGAN loss on (y, y_hat.detach())        (:137-150)
  G step: 45 x L1(mel(y_hat), mel_loss) + FM + adversarial    (:153-167)
with AdamW(2e-4, betas (0.8, 0.99)) x2 and ExponentialLR gamma 0.999 per epoch
(:66-84), checkpoints every N steps with auto-resume (:44-59, :169-190).

TPU-first: one jitted `gan_step` does D-grad + D-update + G-grad + G-update
back-to-back on device (the reference's two backward passes + two optimizer
steps), with weight-norm kept as an explicit (v, g) parametrization exactly
like torch's weight_norm so converted checkpoints continue training
identically. The discriminators carry the reference's norm layout too:
weight_norm on every MPD/MSD conv, spectral_norm (power-iteration buffer u,
updated each step before use, u/v constant to the gradient) on MSD
sub-discriminator 0 (models.py:132/:194/:223)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from covomix_tpu.audio.mel import MelConfig, mel_spectrogram
from covomix_tpu.models import vocoder as V


# ---------------------------------------------------------------------------
# weight-norm (v, g) parametrization over the generator pytree


def _is_conv_leafdict(d) -> bool:
    return isinstance(d, dict) and "w" in d


def wn_split(params: Any, transposed_paths=("ups",)) -> Any:
    """Plain weights -> (v, g). Norm axes follow torch weight_norm(dim=0):
    Conv1d [K,I,O]: per-O (axes 0,1); ConvTranspose1d [K,I,O] (torch [I,O,K],
    dim0=I): per-I (axes 0,2)."""

    def walk(node, in_ups):
        if _is_conv_leafdict(node):
            w = node["w"]
            axes = (0, 2) if (in_ups and w.ndim == 3) else tuple(range(w.ndim - 1))
            g = jnp.sqrt(jnp.sum(w * w, axis=axes, keepdims=True))
            out = {k: v for k, v in node.items() if k != "w"}
            out["v"] = w
            out["g"] = g
            return out
        if isinstance(node, dict):
            return {k: walk(v, in_ups or k in transposed_paths) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, in_ups) for v in node]
        return node

    return walk(params, False)


def _l2n(x, eps: float = 1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x), eps)


def sn_split(params: Any, seed: int = 0) -> Any:
    """Add persistent power-iteration vectors u [O], v [I*K] to every conv
    leaf (torch spectral_norm(dim=0) buffers; MSD's first sub-discriminator,
    hifi-gan/models.py:223)."""
    rs = np.random.RandomState(seed)

    def walk(node):
        if _is_conv_leafdict(node):
            w = node["w"]
            u = _l2n(jnp.asarray(rs.randn(w.shape[-1]), jnp.float32))
            v = _l2n(jnp.asarray(rs.randn(w.size // w.shape[-1]), jnp.float32))
            return dict(node, u=u, v=v)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def sn_power_iter(params: Any) -> Any:
    """One power-iteration update of every (u, v), torch order (v from the
    previous u, then u from the new v — torch updates the buffers on each
    training-mode forward, before the weight is used). No gradients."""

    def walk(node):
        if isinstance(node, dict) and "u" in node and "w" in node:
            w = jax.lax.stop_gradient(node["w"])
            wm = w.reshape(-1, w.shape[-1]).T          # [O, I*K] (dim=0 = out)
            v = _l2n(wm.T @ node["u"])
            return dict(node, u=_l2n(wm @ v), v=v)
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def sn_fold(params: Any) -> Any:
    """w -> w / sigma with sigma = u^T W v from the STORED buffers (the pair
    sn_power_iter just updated — torch computes sigma with exactly that u, v).
    u and v are constants to the gradient, like torch's buffers — the
    gradient flows through W in both the numerator and sigma."""

    def walk(node):
        if isinstance(node, dict) and "u" in node and "w" in node:
            w = node["w"]
            wm = w.reshape(-1, w.shape[-1]).T
            u = jax.lax.stop_gradient(node["u"])
            v = jax.lax.stop_gradient(node["v"])
            sigma = u @ (wm @ v)
            out = {k: x for k, x in node.items() if k not in ("u", "v")}
            out["w"] = w / sigma
            return out
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v) for v in node]
        return node

    return walk(params)


def split_discriminators(mpd: Any, msd: Any):
    """Reference norm layout (hifi-gan/models.py:132/:194/:223): weight_norm
    on every MPD conv and on MSD sub-discriminators 1-2; spectral_norm on MSD
    sub-discriminator 0."""
    mpd = wn_split(mpd, transposed_paths=())
    ds = list(msd["discriminators"])
    ds[0] = sn_split(ds[0])
    ds[1] = wn_split(ds[1], transposed_paths=())
    ds[2] = wn_split(ds[2], transposed_paths=())
    return mpd, {"discriminators": ds}


def fold_discriminators(mpd: Any, msd: Any):
    ds = list(msd["discriminators"])
    ds[0] = sn_fold(ds[0])
    ds[1] = wn_fold(ds[1], transposed_paths=())
    ds[2] = wn_fold(ds[2], transposed_paths=())
    return wn_fold(mpd, transposed_paths=()), {"discriminators": ds}


def wn_fold(params: Any, transposed_paths=("ups",)) -> Any:
    """(v, g) -> plain weights, w = g * v / ||v|| (torch _weight_norm)."""

    def walk(node, in_ups):
        if isinstance(node, dict) and "v" in node and "g" in node:
            v, g = node["v"], node["g"]
            axes = (0, 2) if (in_ups and v.ndim == 3) else tuple(range(v.ndim - 1))
            norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=axes, keepdims=True))
            out = {k: val for k, val in node.items() if k not in ("v", "g")}
            out["w"] = g * v / jnp.maximum(norm, 1e-12)
            return out
        if isinstance(node, dict):
            return {k: walk(v, in_ups or k in transposed_paths) for k, v in node.items()}
        if isinstance(node, list):
            return [walk(v, in_ups) for v in node]
        return node

    return walk(params, False)


# ---------------------------------------------------------------------------
# GAN trainer


@dataclasses.dataclass(frozen=True)
class GanConfig:
    learning_rate: float = 2e-4
    adam_b1: float = 0.8
    adam_b2: float = 0.99
    lr_decay: float = 0.999           # per epoch (hifi-gan/train.py:83-84)
    steps_per_epoch: int = 1000
    segment_size: int = 8032
    mel_loss_weight: float = 45.0
    weight_norm: bool = True


class GanState(NamedTuple):
    gen_params: Any
    mpd_params: Any
    msd_params: Any
    opt_g: Any
    opt_d: Any
    step: jnp.ndarray


def _make_opt(cfg: GanConfig):
    def sched(step):
        epoch = step // cfg.steps_per_epoch
        return cfg.learning_rate * (cfg.lr_decay ** epoch)

    # torch.optim.AdamW's DEFAULT weight_decay is 0.01 (the reference
    # constructs AdamW without the arg, hifi-gan/train.py:66-69); optax's
    # default is 1e-4 — pass it explicitly or training regularizes 100x weaker
    return optax.adamw(sched, b1=cfg.adam_b1, b2=cfg.adam_b2, weight_decay=0.01)


def _no_u_mask(tree):
    """Trainable mask: everything except the spectral-norm power-iteration
    buffers 'u' (updated by sn_power_iter, never by the optimizer)."""

    def walk(node):
        if isinstance(node, dict):
            # spectral leaves carry BOTH u and v buffers; weight-norm leaves
            # use 'v' as the TRAINABLE direction (no 'u') — only freeze v
            # where u is present
            has_u = "u" in node
            return {k: (False if (k == "u" or (has_u and k == "v")) else walk(x))
                    for k, x in node.items()}
        if isinstance(node, list):
            return [walk(x) for x in node]
        return True

    return walk(tree)


def _make_opt_d(cfg: GanConfig):
    return optax.masked(_make_opt(cfg), _no_u_mask)


def init_gan_state(key, voc_cfg: V.VocoderConfig, cfg: GanConfig) -> GanState:
    kg, kp, ks = jax.random.split(key, 3)
    gen = V.init_generator(kg, voc_cfg)
    mpd = V.init_mpd(kp)
    msd = V.init_msd(ks)
    if cfg.weight_norm:
        gen = wn_split(gen)
        # reference norm layout: weight_norm on all discriminator convs,
        # spectral_norm on MSD sub-discriminator 0 (models.py:132/:194/:223)
        mpd, msd = split_discriminators(mpd, msd)
    return GanState(gen, mpd, msd,
                    _make_opt(cfg).init(gen),
                    _make_opt_d(cfg).init({"mpd": mpd, "msd": msd}),
                    jnp.zeros((), jnp.int32))


def make_gan_step(voc_cfg: V.VocoderConfig, mel_cfg: MelConfig, mel_loss_cfg: MelConfig, cfg: GanConfig, dtype=jnp.float32, mesh=None):
    """Returns jitted step(state, batch) -> (state, metrics).
    batch: {'audio': [B, T*hop] target waveform} plus optionally
           {'mel': [B, T, 80]} — precomputed input mel (fine-tuning mode,
           hifi-gan/meldataset.py:142-160); when absent the input mel is
           computed from `audio` INSIDE the jitted step (TPU-side, overlapping
           nothing on the 1-core host). The mel-L1 target (fmax_for_loss) is
           always computed in-step from `audio` (meldataset.py:163-166).

    `mesh`: optional jax.sharding.Mesh with a 'dp' axis. The batch is pinned to
    'dp' and params replicated; XLA emits the grad all-reduces over ICI — the
    TPU-native replacement for hifi-gan/train.py:61-64's DDP wrap."""
    opt_g = _make_opt(cfg)
    opt_d = _make_opt_d(cfg)

    def d_fold(d_params):
        if not cfg.weight_norm:
            return d_params
        mpd_f, msd_f = fold_discriminators(d_params["mpd"], d_params["msd"])
        return {"mpd": mpd_f, "msd": msd_f}

    def constrain_dp(batch):
        if mesh is None:
            return batch
        from jax.sharding import NamedSharding, PartitionSpec as P

        def con(leaf):
            nd = jnp.ndim(leaf)
            spec = P() if nd == 0 else P(*(["dp"] + [None] * (nd - 1)))
            return jax.lax.with_sharding_constraint(leaf, NamedSharding(mesh, spec))

        return jax.tree_util.tree_map(con, batch)

    def gen_fwd(gen_params, mel, out_len):
        p = wn_fold(gen_params) if cfg.weight_norm else gen_params
        # fuse_tail=False: training differentiates through the generator and
        # the fused Pallas tail kernel (inference-only) defines no VJP
        y = V.generator(p, voc_cfg, mel, dtype=dtype, fuse_tail=False)
        # covomix numerology: T frames -> 160T+32 samples; the reference picks
        # segment_size 8032 = 160*50+32 so lengths line up exactly
        # (hifi-gan/config_covomix.json). Trim/pad for other segment sizes.
        if y.shape[1] > out_len:
            y = y[:, :out_len]
        elif y.shape[1] < out_len:
            y = jnp.pad(y, ((0, 0), (0, out_len - y.shape[1])))
        return y

    def d_loss_fn(d_params, y, y_hat):
        dp = d_fold(d_params)
        rs, gs, _, _ = V.mpd(dp["mpd"], y, y_hat)
        loss_f = V.discriminator_loss(rs, gs)
        rs2, gs2, _, _ = V.msd(dp["msd"], y, y_hat)
        loss_s = V.discriminator_loss(rs2, gs2)
        return loss_f + loss_s, (loss_f, loss_s)

    def g_loss_fn(gen_params, d_params, mel, y, mel_loss_target):
        y_hat = gen_fwd(gen_params, mel, y.shape[1])
        mel_hat = mel_spectrogram(y_hat, mel_loss_cfg)
        loss_mel = jnp.mean(jnp.abs(mel_hat - jnp.swapaxes(mel_loss_target, 1, 2))) * cfg.mel_loss_weight
        dp = d_fold(d_params)
        _, gs, fr, fg = V.mpd(dp["mpd"], y, y_hat)
        _, gs2, fr2, fg2 = V.msd(dp["msd"], y, y_hat)
        loss_fm = V.feature_loss(fr, fg) + V.feature_loss(fr2, fg2)
        loss_adv = V.generator_adv_loss(gs) + V.generator_adv_loss(gs2)
        return loss_adv + loss_fm + loss_mel, (loss_mel, loss_fm, loss_adv, y_hat)

    def step(state: GanState, batch):
        batch = constrain_dp(batch)
        y = batch["audio"]
        # input mel: precomputed (fine-tuning) or on-device from the waveform
        mel = batch["mel"] if "mel" in batch else jnp.swapaxes(mel_spectrogram(y, mel_cfg), 1, 2)
        if "mel_loss_target" in batch:
            mel_loss_target = batch["mel_loss_target"]
        else:
            mel_loss_target = jnp.swapaxes(mel_spectrogram(y, mel_loss_cfg), 1, 2)
        # ---- discriminator step on detached y_hat (train.py:137-150)
        y_hat = jax.lax.stop_gradient(gen_fwd(state.gen_params, mel, y.shape[1]))
        msd_p = state.msd_params
        if cfg.weight_norm:
            # spectral norm updates its power-iteration buffers on every
            # training forward, before the weight is used (torch semantics)
            ds = list(msd_p["discriminators"])
            ds[0] = sn_power_iter(ds[0])
            msd_p = {"discriminators": ds}
        d_params = {"mpd": state.mpd_params, "msd": msd_p}
        (d_loss, (lf, ls)), d_grads = jax.value_and_grad(d_loss_fn, has_aux=True)(d_params, y, y_hat)
        d_updates, opt_d_state = opt_d.update(d_grads, state.opt_d, d_params)
        d_params = optax.apply_updates(d_params, d_updates)
        # ---- generator step (train.py:153-167)
        (g_loss, (l_mel, l_fm, l_adv, _)), g_grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            state.gen_params, d_params, mel, y, mel_loss_target)
        g_updates, opt_g_state = opt_g.update(g_grads, state.opt_g, state.gen_params)
        gen_params = optax.apply_updates(state.gen_params, g_updates)
        new_state = GanState(gen_params, d_params["mpd"], d_params["msd"], opt_g_state, opt_d_state, state.step + 1)
        return new_state, {"loss_disc": d_loss, "loss_gen": g_loss, "mel_error": l_mel / cfg.mel_loss_weight,
                           "loss_fm": l_fm, "loss_adv": l_adv}

    return jax.jit(step, donate_argnums=(0,))


def export_generator(state: GanState, cfg: GanConfig):
    """Inference export: fold weight norm (remove_weight_norm at load,
    covomix/vocoder/models.py:118-125)."""
    return wn_fold(state.gen_params) if cfg.weight_norm else state.gen_params
