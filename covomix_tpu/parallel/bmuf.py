"""BMUF — blockwise model-update filtering (periodic model sync).

Capability of fairseq/optim/bmuf.py (FairseqBMUF, the "incremental block
training with intra-block parallel optimization and blockwise model-update
filtering" scheme; SlowMo's ddp-backend is the same shape): each data-parallel
worker runs LOCAL optimizer steps with un-synchronized gradients, and every
`sync_every` steps the workers reconcile with a momentum-filtered block
update — trading per-step all-reduce bandwidth for periodic sync.

TPU-native design: instead of wrapping torch.distributed collectives around a
stateful optimizer object, BMUF here is a PURE function over
(params, bmuf_state) executed inside a `shard_map` over the 'dp' mesh axis.
Divergent local models are represented honestly as a stacked [ndp, ...] param
tree sharded on 'dp'; the sync branch rides `lax.switch` on the step counter,
so ONE compiled step serves both local and sync iterations, and the pmean
collectives ride ICI only on the iterations that need them.

Reference math (bmuf.py:146-201):
    grad       = global_prev - local_params            (per worker)
    grad       = mean_over_workers(grad)
    smoothed   = block_momentum * smoothed + block_lr * grad
    params     = global_prev - smoothed
    params    -= block_momentum * smoothed             (if use_nbm: Nesterov)
    global     = params
block_momentum == 0 degenerates to plain parameter averaging (bmuf.py:169-173:
the all-reduce averages `param.data` directly). Warmup (bmuf.py:107-123):
at step == warmup_steps the local models are replaced by worker 0's (or the
mean, with average_sync) and the block state resets; make_bmuf_train_step
also restores the inner optax state to its initial value at that step,
matching the reference's optimizer reset (bmuf.py:107-123).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class BMUFConfig:
    sync_every: int = 50                   # global_sync_iter (bmuf.py cfg)
    block_momentum: Optional[float] = None  # default 1 - 1/world (FairseqBMUFConfig)
    block_lr: float = 1.0
    use_nbm: bool = True                   # Nesterov block momentum
    average_sync: bool = False             # warmup: average instead of rank-0 broadcast
    warmup_steps: int = 0                  # warmup_iterations

    def resolved_momentum(self, world: int) -> float:
        return (1.0 - 1.0 / world) if self.block_momentum is None else self.block_momentum


def init_bmuf_state(params):
    """Per-worker block state (bmuf.py _reset_local_data): the last-synced
    global model and the smoothed block gradient. Call on the stacked
    [ndp, ...] param tree (or per-replica inside shard_map)."""
    return {
        "global": jax.tree_util.tree_map(jnp.asarray, params),
        "smoothed": jax.tree_util.tree_map(jnp.zeros_like, params),
        "t": jnp.zeros((), jnp.int32),
    }


def bmuf_update(params, state, cfg: BMUFConfig, *, axis_name: str = "dp"):
    """One BMUF tick, applied AFTER the local optimizer update, inside a
    mapped context over `axis_name`. Returns (params, state). No-op except on
    warmup/sync boundaries (lax.switch — single compiled step)."""
    world = jax.lax.axis_size(axis_name)
    bm = cfg.resolved_momentum(world)
    t = state["t"] + 1
    tmap = jax.tree_util.tree_map

    def noop(args):
        p, s = args
        return p, s["global"], s["smoothed"]

    def warmup_sync(args):
        # bmuf.py:107-123: rank-0 broadcast (or mean), block state reset
        p, s = args
        if cfg.average_sync:
            new_p = tmap(lambda x: jax.lax.pmean(x, axis_name), p)
        else:
            idx = jax.lax.axis_index(axis_name)
            new_p = tmap(
                lambda x: jax.lax.psum(jnp.where(idx == 0, x, jnp.zeros_like(x)), axis_name), p)
        return new_p, new_p, tmap(jnp.zeros_like, p)

    def block_sync(args):
        p, s = args
        if bm == 0.0:
            # bmuf.py:169-173: plain parameter averaging
            new_p = tmap(lambda x: jax.lax.pmean(x, axis_name), p)
            return new_p, new_p, s["smoothed"]
        grad = tmap(lambda g, x: jax.lax.pmean(g - x, axis_name), s["global"], p)
        smoothed = tmap(lambda m, g: bm * m + cfg.block_lr * g, s["smoothed"], grad)
        new_p = tmap(lambda g, m: g - m, s["global"], smoothed)
        if cfg.use_nbm:
            new_p = tmap(lambda x, m: x - bm * m, new_p, smoothed)
        return new_p, new_p, smoothed

    is_warm = (t == cfg.warmup_steps) if cfg.warmup_steps > 0 else jnp.bool_(False)
    is_sync = (t > cfg.warmup_steps) & (t % cfg.sync_every == 0)
    branch = jnp.where(is_warm, 1, jnp.where(is_sync, 2, 0))
    params, g, m = jax.lax.switch(branch, [noop, warmup_sync, block_sync], (params, state))
    return params, {"global": g, "smoothed": m, "t": t}


def make_bmuf_train_step(loss_fn, train_cfg, bmuf_cfg: BMUFConfig, mesh):
    """jitted step(stacked_state, stacked_batch, key) for BMUF data
    parallelism over mesh axis 'dp'.

    `stacked_state` is {'train': TrainState-leaves, 'bmuf': bmuf-state} where
    every array carries a leading [ndp] replica axis sharded on 'dp' — the
    honest layout for models that genuinely diverge between syncs (a plain
    replicated sharding would force one logical value). `stacked_batch`
    leaves are [ndp, per_worker_batch, ...]. Gradients are NOT averaged per
    step (the BMUF contract); reconciliation happens inside bmuf_update.

    Build the initial stacked state with `stack_for_bmuf`."""
    from covomix_tpu.train.loop import TrainState, ema_update, make_optimizer

    tx = make_optimizer(train_cfg)

    def per_worker(state, batch, key):
        # shard_map blocks carry the [1, ...] replica slot; strip/restore it
        sq = lambda tree: jax.tree_util.tree_map(lambda x: x[0], tree)
        ex = lambda tree: jax.tree_util.tree_map(lambda x: x[None], tree)
        ts = TrainState(*sq(state["train"]))
        bmuf = sq(state["bmuf"])
        key = jax.random.fold_in(key, jax.lax.axis_index("dp"))
        loss, grads = jax.value_and_grad(loss_fn)(ts.params, sq(batch), key)
        updates, opt_state = tx.update(grads, ts.opt_state, ts.params)
        import optax

        params = optax.apply_updates(ts.params, updates)
        params, bmuf = bmuf_update(params, bmuf, bmuf_cfg, axis_name="dp")
        if bmuf_cfg.warmup_steps > 0:
            # fairseq _warmup_sync also restores the INNER optimizer's initial
            # state at warmup end (bmuf.py:107-123) — without it each worker
            # keeps Adam moments from its own divergent warmup trajectory and
            # the freshly-synchronized models get pulled straight apart again
            is_warm = bmuf["t"] == bmuf_cfg.warmup_steps
            fresh = tx.init(params)
            opt_state = jax.tree_util.tree_map(
                lambda cur, init: jnp.where(is_warm, init, cur), opt_state, fresh)
        ema = ema_update(ts.ema_params, params, ts.ema_num_updates, train_cfg.ema_decay)
        new_ts = TrainState(params, opt_state, ema, ts.ema_num_updates + 1, ts.step + 1)
        # reporting only (means over workers; grads themselves stay local)
        mean_loss = jax.lax.pmean(loss, "dp")
        gnorm = jax.lax.pmean(optax.global_norm(grads), "dp")
        return {"train": ex(tuple(new_ts)), "bmuf": ex(bmuf)}, ex({"loss": mean_loss,
                                                                  "grad_norm": gnorm})

    dp_spec = P("dp")
    step = jax.shard_map(per_worker, mesh=mesh,
                         in_specs=(dp_spec, dp_spec, P()),
                         out_specs=(dp_spec, dp_spec),
                         check_vma=False)
    return jax.jit(step, donate_argnums=(0,))


def stack_for_bmuf(state_tuple, bmuf_state, mesh):
    """Replicate a TrainState tuple + bmuf state ndp times along a new leading
    axis and shard it on 'dp' (each worker starts from the same model)."""
    ndp = mesh.shape["dp"]
    stk = lambda tree: jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(jnp.asarray(x)[None], (ndp,) + jnp.shape(jnp.asarray(x))), tree)
    tree = {"train": stk(tuple(state_tuple)), "bmuf": stk(bmuf_state)}
    shard = lambda x: jax.device_put(x, NamedSharding(mesh, P(*("dp",) + (None,) * (x.ndim - 1))))
    return jax.tree_util.tree_map(shard, tree)
