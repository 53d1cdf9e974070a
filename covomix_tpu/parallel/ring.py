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
    if groups == xx.shape[-1]:
        # depthwise: shift-and-add path (XLA:TPU's depthwise weight-grad
        # lowering is broken/pathological — see layers.depthwise_conv1d)
        return L.depthwise_conv1d(p, xx, padding=0)
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


def sample_sp(
    params: Any,
    cfg: A.AcousticConfig,
    key,
    phoneme_ids: jnp.ndarray,     # [B, T] or [B, T, 2]
    cond: jnp.ndarray,            # [B, T, dim_in]
    *,
    mesh: Mesh,
    cond_scale: float = 1.0,
    step_size: float = 0.0625,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Midpoint ODE sampling (== acoustic.sample for the same key) with the
    sequence sharded over 'sp' — synthesis of dialogues longer than one
    chip's activation memory. The CFG (cond, null) pair is stacked on a local
    size-2 axis per row so the combine `logits*(1+s) - s*null`
    (acoustic.py:428) never crosses devices. Assumes exact-length input
    (no key_mask; trim/bucket on the host like the pipeline does)."""
    sp = mesh.shape["sp"]
    b, t = cond.shape[0], cond.shape[1]
    assert t % sp == 0, f"sequence {t} not divisible by sp={sp}"
    assert t // sp >= cfg.conv_pos_kernel // 2, (
        f"local frames {t // sp} < conv halo {cfg.conv_pos_kernel // 2} — "
        f"the one-hop halo exchange cannot cover the positional conv")
    n_steps = int(round(1.0 / step_size))
    h_step = 1.0 / n_steps
    y0 = jax.random.normal(key, (b, t, cfg.mel_dim), jnp.float32)  # same draw as acoustic.sample
    use_cfg = cond_scale != 1.0
    nb = 2 if use_cfg else 1

    ph2 = jnp.stack([phoneme_ids] * nb, axis=1)                    # [B, nb, T(, 2)]
    c2 = jnp.stack([cond] * nb, axis=1)
    drop = jnp.tile(jnp.arange(nb, dtype=jnp.int32)[None] > 0, (b, 1))   # [B, nb] null branch flag

    seq3 = P("dp", None, "sp")

    def body(p, y0_l, ph_l, cond_l, drop_l):
        bl, _, tl = ph_l.shape[:3]
        ph_f = ph_l.reshape((bl * nb, tl) + ph_l.shape[3:])
        cond_f = cond_l.reshape(bl * nb, tl, -1)
        drop_f = drop_l.reshape(bl * nb).astype(bool)
        emb = A.static_embed(p, cfg, ph_f, cond_f, cond_drop_mask=drop_f, dtype=dtype)

        def field(y, tscalar):
            # rows interleave as (b0 cond, b0 null, b1 cond, ...) matching the
            # [B, nb] stacking of ph/cond/drop
            y2 = jnp.repeat(y[:, None], nb, axis=1).reshape(bl * nb, tl, cfg.mel_dim).astype(dtype)
            h = y2 @ p["to_embed"]["w"].astype(dtype)[: cfg.mel_dim] + emb
            conv = L.gelu(conv1d_halo(p["conv_embed"], h, cfg.conv_pos_kernel,
                                cfg.dim, "sp", sp))
            h = conv + h
            temb = A._time_embedding(p, jnp.full((bl * nb,), tscalar), dtype)
            h = transformer_sp(p, cfg, h, temb, "sp", sp)
            out = L.linear(p["to_pred"], h).astype(jnp.float32)
            if nb == 2:
                out = out.reshape(bl, 2, tl, cfg.mel_dim)
                return out[:, 0] * (1 + cond_scale) - cond_scale * out[:, 1]
            return out

        def step(y, i):
            t0 = i.astype(jnp.float32) * h_step
            k1 = field(y, t0)
            k2 = field(y + 0.5 * h_step * k1, t0 + 0.5 * h_step)
            return y + h_step * k2, None

        y, _ = jax.lax.scan(step, y0_l, jnp.arange(n_steps))
        return y

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(jax.tree.map(lambda _: P(), params),
                  P("dp", "sp"), seq3, seq3, P("dp", None)),
        out_specs=P("dp", "sp"),
        check_vma=False,
    )(params, y0, ph2, c2, drop)


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
        conv = L.gelu(conv1d_halo(p["conv_embed"], h, cfg.conv_pos_kernel,
                            cfg.dim, "sp", sp))
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
