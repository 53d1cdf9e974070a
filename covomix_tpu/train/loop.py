"""Training loop: optax Adam + EMA + the reference warmup/decay LR schedule.

Capability parity with the Lightning wrapper (covomix/conditional_model.py):
  * Adam lr 1e-4 (configure_optimizers, :166-168)
  * EMA decay 0.999 with torch_ema's num_updates ramp min(d, (1+n)/(10+n))
    (:144, torch_ema default use_num_updates=True), updated after every
    optimizer step (:186-189); eval swaps EMA params in (:203-217)
  * LR schedule per epoch: linear warmup over `wake_up_epochs`, flat until
    `decay_start_epoch`, linear decay to 0 at `total_epochs` (:170-184)

TPU-first: the step is one jitted function (loss + grads + optimizer + EMA)
with donated state; data parallelism comes from sharded batch inputs (see
covomix_tpu.parallel) — no DDP-style wrapper object."""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    ema_params: Any
    ema_num_updates: jnp.ndarray  # scalar int
    step: jnp.ndarray             # scalar int


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    lr: float = 1e-4
    ema_decay: float = 0.999
    use_lr_schedule: bool = False
    total_epochs: int = 500
    wake_up_epochs: int = 15
    decay_start_epoch: int = 30
    steps_per_epoch: int = 1000
    grad_clip: Optional[float] = None
    # micro-batches per optimizer step (reproduce the reference's 8-GPU
    # global batch on fewer chips: batch leaves carry a leading accum axis)
    grad_accum: int = 1


def reference_lr_schedule(cfg: TrainConfig) -> Callable[[jnp.ndarray], jnp.ndarray]:
    """Epoch-granular schedule from conditional_model.py:170-184."""

    def schedule(step):
        epoch = step // cfg.steps_per_epoch
        warm = cfg.lr * (epoch + 1) / cfg.wake_up_epochs
        flat = cfg.lr
        decay = cfg.lr * (1 - (epoch - cfg.decay_start_epoch) / (cfg.total_epochs - cfg.decay_start_epoch))
        lr = jnp.where(epoch < cfg.wake_up_epochs, warm, jnp.where(epoch < cfg.decay_start_epoch, flat, decay))
        return jnp.maximum(lr, 0.0)

    return schedule


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    sched = reference_lr_schedule(cfg) if cfg.use_lr_schedule else cfg.lr
    tx = optax.adam(sched)
    if cfg.grad_clip:
        tx = optax.chain(optax.clip_by_global_norm(cfg.grad_clip), tx)
    return tx


def init_train_state(params, cfg: TrainConfig) -> TrainState:
    tx = make_optimizer(cfg)
    return TrainState(
        params=params,
        opt_state=tx.init(params),
        # real copy: ema must not alias params (donated buffers may not repeat)
        ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
        ema_num_updates=jnp.zeros((), jnp.int32),
        step=jnp.zeros((), jnp.int32),
    )


def ema_update(ema_params, params, num_updates, decay: float):
    """torch_ema ExponentialMovingAverage.update: the update INCREMENTS
    num_updates first, then uses effective decay min(decay, (1+n)/(10+n))
    with the post-increment n; shadow -= (1-d)*(shadow - param). Callers
    pass the PRE-increment count (TrainState.ema_num_updates, incremented
    after the step), so n+1 here reproduces torch_ema's ramp exactly —
    first update d = 2/11, not 1/10."""
    n = num_updates.astype(jnp.float32) + 1.0
    d = jnp.minimum(decay, (1.0 + n) / (10.0 + n))
    return jax.tree_util.tree_map(lambda e, p: e - (1.0 - d) * (e - p), ema_params, params)


def accumulated_value_and_grad(loss_fn: Callable, grad_accum: int):
    """value_and_grad over `grad_accum` micro-batches via lax.scan.

    With grad_accum > 1 the batch leaves carry a leading accum axis
    [A, b, ...]; the returned loss/grads are the MEAN over micro-batches —
    exactly DDP's per-rank grad averaging (the reference's 8-GPU recipes,
    train.py:82), so micro-batches with different valid-element counts weigh
    equally, while only one micro-batch's activations are live at a time."""
    vg = jax.value_and_grad(loss_fn)
    if grad_accum <= 1:
        return vg

    def run(params, batch, key):
        keys = jax.random.split(key, grad_accum)
        zeros = jax.tree_util.tree_map(lambda p: jnp.zeros(p.shape, jnp.float32), params)

        def body(carry, xs):
            lsum, gsum = carry
            mb, k = xs
            loss, grads = vg(params, mb, k)
            gsum = jax.tree_util.tree_map(lambda a, g: a + g.astype(jnp.float32), gsum, grads)
            return (lsum + loss.astype(jnp.float32), gsum), None

        (lsum, gsum), _ = jax.lax.scan(body, (jnp.zeros((), jnp.float32), zeros), (batch, keys))
        inv = 1.0 / grad_accum
        return lsum * inv, jax.tree_util.tree_map(
            lambda g, p: (g * inv).astype(p.dtype), gsum, params)

    return run


def make_train_step(loss_fn: Callable, cfg: TrainConfig, donate: bool = True):
    """loss_fn(params, batch, key) -> scalar loss. Returns jitted
    step(state, batch, key) -> (state, metrics)."""
    tx = make_optimizer(cfg)
    vg = accumulated_value_and_grad(loss_fn, cfg.grad_accum)

    def step(state: TrainState, batch, key):
        loss, grads = vg(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        ema = ema_update(state.ema_params, params, state.ema_num_updates, cfg.ema_decay)
        new_state = TrainState(params, opt_state, ema, state.ema_num_updates + 1, state.step + 1)
        gnorm = optax.global_norm(grads)
        return new_state, {"loss": loss, "grad_norm": gnorm}

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def _multi_step_body(vg, tx, cfg: TrainConfig, k: int):
    """Shared unrolled K-step body for make_multi_step / the sharded variant.

    Returns step(state, batch, key, per_step=None) where batch leaves carry a
    leading [K, ...] axis (one data batch per inner step) and per_step is an
    optional hook applied to (grads, params, ema) trees each step (the sharded
    variant pins shardings there). Metrics are stacked [K] so callers can log
    any inner step."""

    def step(state: TrainState, batch, key, per_step=None):
        con = per_step or (lambda t: t)
        losses, gnorms = [], []
        for i in range(k):
            mb = jax.tree_util.tree_map(lambda x: x[i], batch)
            loss, grads = vg(state.params, mb, jax.random.fold_in(key, i))
            grads = con(grads)
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = con(optax.apply_updates(state.params, updates))
            ema = con(ema_update(state.ema_params, params, state.ema_num_updates, cfg.ema_decay))
            state = TrainState(params, opt_state, ema, state.ema_num_updates + 1, state.step + 1)
            losses.append(loss)
            gnorms.append(optax.global_norm(grads))
        return state, {"loss": jnp.stack(losses), "grad_norm": jnp.stack(gnorms)}

    return step


def make_multi_step(loss_fn: Callable, cfg: TrainConfig, k: int, donate: bool = True):
    """K optimizer steps python-UNROLLED inside ONE jitted dispatch.

    Measured on v5e (tools/fori_probe.py, acoustic recipe shape bs8 x 800
    bf16): 63.9 ms/step vs 79.4 ms per-step dispatch and 78.5 ms as a
    lax.fori_loop — unrolling lets XLA software-pipeline across step
    boundaries (step i's Adam/EMA elementwise tail overlaps step i+1's
    forward matmuls), which both the host dispatch barrier and a loop
    carry forgo. Bit-identical math to K make_train_step calls when fed the
    same per-step batches/keys (keys: fold_in(key, i)).

    Batch contract: every leaf carries a leading [K, ...] axis (stack K
    loader batches); with cfg.grad_accum > 1 leaves are [K, A, b, ...].
    Returned metrics are stacked [K]. Compile time and HLO size grow ~K-fold;
    K in 2..8 is the useful range."""
    if k < 2:
        return make_train_step(loss_fn, cfg, donate=donate)
    tx = make_optimizer(cfg)
    vg = accumulated_value_and_grad(loss_fn, cfg.grad_accum)
    body = _multi_step_body(vg, tx, cfg, k)
    step = lambda state, batch, key: body(state, batch, key)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


# ---------------------------------------------------------------------------
# per-model loss adapters (batch dict contract documented per model)


def acoustic_loss_fn(cfg_model, *, cond_drop_prob: float = 0.0, dtype=jnp.float32):
    """Batch: {'x': [B,T,D] target mel(s), 'phonemes': [B,T(,2)], 'mask': [B,T] bool}
    VoSingle: cond = x (conditional_model.py:253-259).
    VoMix ('two_one'): x holds [cond_A | cond_B | mixed]; target = x[...,-80:],
    cond = x[...,:-80] (conditional_model.py:239-245)."""
    from covomix_tpu.models import acoustic as A

    def loss(params, batch, key):
        x = batch["x"]
        if cfg_model.mode == "two_one":
            target, cond = x[..., -80:], x[..., :-80]
        else:
            target, cond = x, x
        return A.cfm_loss(params, cfg_model, key, target, batch["phonemes"], cond,
                          batch.get("mask"), cond_drop_prob=cond_drop_prob, dtype=dtype)

    return loss


def t2s_loss_fn(cfg_model, dtype=jnp.float32):
    """Batch: {'text_ids': [B,S], 'semantic_ids': [B,T(,2)]}."""
    from covomix_tpu.models import text2semantic as T

    def loss(params, batch, key):
        return T.forward_loss(params, cfg_model, batch["text_ids"], batch["semantic_ids"], key=key, dtype=dtype)

    return loss
