"""Pipeline parallelism (GPipe schedule) for the acoustic transformer.

The reference ships Megatron-style pipeline-parallel plumbing in its fairseq
fork (fairseq/model_parallel/models/pipeline_parallel_transformer/, init at
fairseq/distributed/utils.py:182-272) built on torch Pipe partitioning; CoVoMix
itself never uses it. This is the TPU-native equivalent: a microbatched GPipe
schedule expressed with `jax.shard_map` over a 'pp' mesh axis, activations
moving between stages via `lax.ppermute` rings (ICI neighbours), and the loss
computed on the last stage so only a *scalar* crosses back (no activation
broadcast). Autodiff through ppermute gives the backward pipeline for free —
XLA schedules the reverse ring transfers.

Design notes (TPU/SPMD-first, no reference counterpart):
  * Stage params live stacked on a leading [depth] axis sharded over 'pp', so
    every device runs the *same program* on its own layer block (SPMD).
  * The acoustic model's U-Net skip connections (acoustic.py:274-284) cross
    the stage boundary: each microbatch carries a [depth/2, B_m, T, D] skip
    buffer through the ring. First-half layers push their input at slot g;
    second-half layer g pops slot depth-1-g. Push/pop are rank-dependent, so
    both branches are computed and selected with `where` — the unused skip
    combiner on first-half ranks costs ~2D^2 per token, ~17% overhead on half
    the ranks, the price of a uniform program.
  * Ingest (rank 0) and loss emit (rank pp-1) are gated by `lax.axis_index`;
    ticks run M + pp - 1 times (GPipe bubble).
  * Composes with data parallelism: batch enters sharded over 'dp', the loss
    is psum-reduced over ('pp', 'dp').

Capability parity: training the VoSingle/VoMix acoustic model under pp x dp
matches the single-device `cfm_loss` bit-for-bit in expectation (same RNG via
`acoustic.cfm_inputs`); see tests/test_pipeline_parallel.py.
"""

from __future__ import annotations

import functools
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from covomix_tpu.models import acoustic as A
from covomix_tpu.models import layers as L


def make_pp_mesh(dp: int, pp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * pp == len(devices), f"mesh {dp}x{pp} != {len(devices)} devices"
    arr = np.asarray(devices).reshape(dp, pp)
    return Mesh(arr, ("dp", "pp"))


def stack_layer_params(params: Any, cfg: A.AcousticConfig):
    """Split canonical acoustic params into (stacked_layers, rest).

    stacked_layers: every leaf gains a leading [depth] axis (shardable over
    'pp'). First-half layers have no skip combiner in the canonical tree; they
    get zero-filled placeholders so the stacked tree is homogeneous (their
    grads are exactly zero and Adam leaves them at zero)."""
    d = cfg.dim
    layers = []
    for lp in params["layers"]:
        lp = dict(lp)
        if "skip" not in lp:
            lp["skip"] = {"w": jnp.zeros((2 * d, d), jnp.float32),
                          "b": jnp.zeros((d,), jnp.float32)}
        layers.append(lp)
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    rest = {k: v for k, v in params.items() if k != "layers"}
    return stacked, rest


def unstack_layer_params(stacked: Any, rest: Any, cfg: A.AcousticConfig):
    """Inverse of stack_layer_params (drops the unused first-half skips), for
    checkpoint interchange with the sequential model."""
    half = cfg.depth // 2
    layers = []
    for i in range(cfg.depth):
        lp = jax.tree.map(lambda a: a[i], stacked)
        if i < half:
            lp.pop("skip")
        layers.append(lp)
    return {**rest, "layers": layers}


def pp_param_shardings(mesh: Mesh, pp_params: Any) -> Any:
    """NamedShardings for the {'stacked':..., 'rest':...} param tree: stacked
    layer leaves split over 'pp' on their leading [depth] axis, everything
    else replicated."""
    stacked = jax.tree.map(
        lambda leaf: NamedSharding(mesh, P(*(["pp"] + [None] * (np.ndim(leaf) - 1)))),
        pp_params["stacked"])
    rest = jax.tree.map(lambda leaf: NamedSharding(mesh, P()), pp_params["rest"])
    return {"stacked": stacked, "rest": rest}


def pp_cfm_loss(
    pp_params: Any,               # {'stacked': [depth,...] tree, 'rest': embed/head params}
    cfg: A.AcousticConfig,
    key,
    x1: jnp.ndarray,              # [B, T, mel_dim] global batch
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    num_microbatches: int,
    cond_drop_prob: float = 0.0,
    sigma: float = 0.0,
    dtype=jnp.float32,
):
    """OT-CFM loss (== acoustic.cfm_loss for the same key) computed with the
    transformer stack pipelined over the 'pp' mesh axis."""
    stacked, rest = pp_params["stacked"], pp_params["rest"]
    pp = mesh.shape["pp"]
    depth, half = cfg.depth, cfg.depth // 2
    assert depth % pp == 0, f"depth {depth} not divisible by pp {pp}"
    lpp = depth // pp
    b, t, _ = x1.shape
    m = num_microbatches
    assert b % m == 0, f"batch {b} not divisible by microbatches {m}"
    bm = b // m
    assert bm % mesh.shape["dp"] == 0, (
        f"microbatch rows {bm} not divisible by dp={mesh.shape['dp']}")

    w, times, flow, mask, cond_m, cond_drop = A.cfm_inputs(
        cfg, key, x1, cond, mask, cond_drop_prob=cond_drop_prob, sigma=sigma)
    h, temb = A.embed_inputs(rest, cfg, w, phoneme_ids, cond_m, times,
                             cond_drop_mask=cond_drop, dtype=dtype)
    # microbatch views [M, B_m, ...]
    h_m = h.reshape(m, bm, t, cfg.dim)
    temb_m = temb.reshape(m, bm, cfg.time_hidden_dim)
    flow_m = flow.reshape(m, bm, t, cfg.mel_dim)
    mask_m = mask.reshape(m, bm, t)
    head = {"final_norm": rest["final_norm"], "to_pred": rest["to_pred"]}

    mb_spec = P(None, "dp")  # microbatch axis whole, batch axis over 'dp'

    def body(stacked_l, head_l, h_l, temb_l, flow_l, mask_l):
        rank = jax.lax.axis_index("pp")
        bm_l = h_l.shape[1]
        is_first = rank == 0
        is_last = rank == pp - 1

        def stage(x, skip_buf, te):
            for j in range(lpp):
                lp = jax.tree.map(lambda a: a[j], stacked_l)
                g = rank * lpp + j                      # global layer index (traced)
                first_half = g < half
                pop_pos = jnp.clip(depth - 1 - g, 0, half - 1)
                popped = jax.lax.dynamic_index_in_dim(skip_buf, pop_pos, 0, keepdims=False)
                x_comb = L.linear(lp["skip"], jnp.concatenate([x, popped], axis=-1))
                x_in = jnp.where(first_half, x, x_comb)
                push_pos = jnp.clip(g, 0, half - 1)
                cur = jax.lax.dynamic_index_in_dim(skip_buf, push_pos, 0, keepdims=False)
                skip_buf = jax.lax.dynamic_update_index_in_dim(
                    skip_buf, jnp.where(first_half, x, cur), push_pos, 0)
                x = A.layer_core(lp, cfg, x_in, te)
            return x, skip_buf

        def tick(carry, tk):
            x, skip_buf, te, loss = carry
            mb_in = jnp.clip(tk, 0, m - 1)
            ingest = is_first & (tk < m)
            x = jnp.where(ingest, jax.lax.dynamic_index_in_dim(h_l, mb_in, 0, keepdims=False).astype(dtype), x)
            te = jnp.where(ingest, jax.lax.dynamic_index_in_dim(temb_l, mb_in, 0, keepdims=False).astype(dtype), te)
            x, skip_buf = stage(x, skip_buf, te)
            mb_out = jnp.clip(tk - (pp - 1), 0, m - 1)
            emit = is_last & (tk >= pp - 1)
            pred = L.linear(head_l["to_pred"], L.rmsnorm(head_l["final_norm"], x)).astype(jnp.float32)
            fl = jax.lax.dynamic_index_in_dim(flow_l, mb_out, 0, keepdims=False)
            mk = jax.lax.dynamic_index_in_dim(mask_l, mb_out, 0, keepdims=False)
            loss = loss + jnp.where(emit, A.masked_mse(pred, fl, mk), 0.0)
            perm = [(i, (i + 1) % pp) for i in range(pp)]
            x, skip_buf, te = jax.tree.map(
                lambda a: jax.lax.ppermute(a, "pp", perm), (x, skip_buf, te))
            return (x, skip_buf, te, loss), None

        carry0 = (
            jnp.zeros((bm_l, t, cfg.dim), dtype),
            jnp.zeros((half, bm_l, t, cfg.dim), dtype),
            jnp.zeros((bm_l, cfg.time_hidden_dim), dtype),
            jnp.float32(0.0),
        )
        (_, _, _, loss), _ = jax.lax.scan(tick, carry0, jnp.arange(m + pp - 1))
        return jax.lax.psum(jax.lax.psum(loss, "pp"), "dp")

    loss = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(
            jax.tree.map(lambda _: P("pp"), stacked),
            jax.tree.map(lambda _: P(), head),
            mb_spec, mb_spec, mb_spec, mb_spec,
        ),
        out_specs=P(),
        check_vma=False,
    )(stacked, head, h_m, temb_m, flow_m, mask_m)
    return loss / b
