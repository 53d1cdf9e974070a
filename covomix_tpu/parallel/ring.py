"""Sequence parallelism (ring attention) for the acoustic transformer.

The reference has NO sequence/context parallelism anywhere — long audio is
handled purely by data policy (chunking/cropping; SURVEY §5 long-context).
This module is the TPU-idiomatic extension SURVEY prescribes: shard the TIME
axis of the flow-matching transformer over an 'sp' mesh axis so dialogues
longer than one chip's activation memory can be trained/scored.

  * ring_attention: non-causal dense attention with K/V blocks rotating
    around the 'sp' ring via `lax.ppermute`; the partial softmax is combined
    with the online (max, denominator, accumulator) recurrence in f32 —
    numerically identical to full attention up to reduction order. Each hop
    rides an ICI neighbour link; compute on the current block overlaps the
    next block's transfer under XLA's scheduler.
  * conv1d_halo: the 31-tap depthwise conv positional embed
    (acoustic.py:141-161) needs kernel//2 frames of halo from each
    neighbour; global sequence edges stay zero-padded like the unsharded op.
  * transformer_sp / cfm_loss_sp: the full OT-CFM training loss with time
    sharded over 'sp' and batch over 'dp' — matches acoustic.cfm_loss
    bit-for-bit in expectation (same RNG via acoustic.cfm_inputs); see
    tests/test_ring_sp.py.

Rotary positions are globalized (rank * T_local + arange), and U-Net skip
connections are frame-local so they need no communication.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from covomix_tpu.models import acoustic as A
from covomix_tpu.models import layers as L


def make_sp_mesh(dp: int, sp: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert dp * sp == len(devices), f"mesh {dp}x{sp} != {len(devices)} devices"
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def ring_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                   axis_name: str, sp: int) -> jnp.ndarray:
    """Non-causal attention over a time-sharded sequence.

    q/k/v: [B, H, T_local, dh] (this device's frames). Runs `sp` ring steps;
    at each step the local queries attend the currently-held K/V block, then
    the block rotates to the next device. Online-softmax combine in f32."""
    scale = q.shape[-1] ** -0.5
    b, h, tl, dh = q.shape
    acc = jnp.zeros((b, h, tl, dh), jnp.float32)
    m = jnp.full((b, h, tl, 1), -jnp.inf, jnp.float32)
    l = jnp.zeros((b, h, tl, 1), jnp.float32)
    perm = [(i, (i + 1) % sp) for i in range(sp)]
    for step in range(sp):
        s = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum("bhij,bhjd->bhid", p.astype(v.dtype), v,
                                       preferred_element_type=jnp.float32)
        m = m_new
        if step < sp - 1:
            k, v = jax.tree.map(lambda a: jax.lax.ppermute(a, axis_name, perm), (k, v))
    return (acc / jnp.maximum(l, 1e-30)).astype(q.dtype)


def conv1d_halo(p, x: jnp.ndarray, kernel: int, groups: int, axis_name: str, sp: int) -> jnp.ndarray:
    """Depthwise/grouped conv over a time-sharded [B, T_local, C] activation
    with kernel//2 halo frames exchanged between ring neighbours; the global
    sequence edges see zeros exactly like the unsharded SAME-padded conv."""
    halo = kernel // 2
    rank = jax.lax.axis_index(axis_name)
    fwd = [(i, (i + 1) % sp) for i in range(sp)]       # d -> d+1 (left halo arrives from d-1)
    bwd = [(i, (i - 1) % sp) for i in range(sp)]       # d -> d-1 (right halo arrives from d+1)
    left = jax.lax.ppermute(x[:, -halo:], axis_name, fwd)
    right = jax.lax.ppermute(x[:, :halo], axis_name, bwd)
    left = jnp.where(rank == 0, 0.0, left)             # global left edge: zero pad
    right = jnp.where(rank == sp - 1, 0.0, right)      # global right edge
    xx = jnp.concatenate([left, x, right], axis=1)
    return L.conv1d(p, xx, padding=(0, 0), groups=groups)


def transformer_sp(params, cfg: A.AcousticConfig, x, time_emb, axis_name: str, sp: int):
    """The acoustic transformer stack over time-sharded activations: global
    rotary positions, ring attention, frame-local U-Net skips."""
    tl = x.shape[1]
    rank = jax.lax.axis_index(axis_name)
    positions = rank * tl + jnp.arange(tl)
    attend = lambda q, k, v: ring_attention(q, k, v, axis_name, sp)
    half = cfg.depth // 2
    skips = []
    for i, lp in enumerate(params["layers"]):
        if i < half:
            skips.append(x)
        else:
            x = L.linear(lp["skip"], jnp.concatenate([x, skips.pop()], axis=-1))
        x = A.layer_core(lp, cfg, x, time_emb, positions=positions, attend_fn=attend)
    return L.rmsnorm(params["final_norm"], x)


def cfm_loss_sp(
    params: Any,
    cfg: A.AcousticConfig,
    key,
    x1: jnp.ndarray,              # [B, T, mel_dim] global batch
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    mesh: Mesh,
    cond_drop_prob: float = 0.0,
    sigma: float = 0.0,
    dtype=jnp.float32,
):
    """OT-CFM loss (== acoustic.cfm_loss for the same key) with the sequence
    sharded over 'sp' and the batch over 'dp'."""
    sp = mesh.shape["sp"]
    b, t, _ = x1.shape
    assert t % sp == 0, f"sequence {t} not divisible by sp={sp}"
    assert t // sp >= cfg.conv_pos_kernel // 2, (
        f"local frames {t // sp} < conv halo {cfg.conv_pos_kernel // 2}")

    w, times, flow, mask, cond_m, cond_drop = A.cfm_inputs(
        cfg, key, x1, cond, mask, cond_drop_prob=cond_drop_prob, sigma=sigma)
    if cond_drop is None:
        cond_drop = jnp.zeros((b,), bool)

    seq = P("dp", "sp")            # [B, T, ...] leaves
    row = P("dp")                  # [B] leaves

    def body(p, w_l, ph_l, cond_l, times_l, drop_l, flow_l, mask_l):
        h0 = A.static_embed(p, cfg, ph_l, cond_l, cond_drop_mask=drop_l, dtype=dtype)
        h = w_l.astype(dtype) @ p["to_embed"]["w"].astype(dtype)[: cfg.mel_dim] + h0
        conv = jax.nn.gelu(conv1d_halo(p["conv_embed"], h, cfg.conv_pos_kernel,
                                       cfg.dim, "sp", sp), approximate=False)
        h = conv + h
        temb = A._time_embedding(p, times_l, dtype)
        h = transformer_sp(p, cfg, h, temb, "sp", sp)
        pred = L.linear(p["to_pred"], h).astype(jnp.float32)
        err = jnp.mean(jnp.square(pred - flow_l), axis=-1)
        err = jnp.where(mask_l, err, 0.0)
        num = jax.lax.psum(jnp.sum(err, axis=-1), "sp")                      # per-row, global T
        den = jax.lax.psum(jnp.sum(mask_l, axis=-1).astype(jnp.float32), "sp")
        loss_rows = jnp.sum(num / jnp.clip(den, min=1e-5))
        # rows are 'dp'-sharded; the sum over 'sp' is already replicated
        return jax.lax.psum(loss_rows, "dp")

    loss = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params),
                  seq, seq, seq, row, row, seq, seq),
        out_specs=P(),
        check_vma=False,
    )(params, w, phoneme_ids, cond_m, times, cond_drop, flow, mask)
    return loss / b
