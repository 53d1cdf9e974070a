"""Fused Pallas TPU kernel for the HiFi-GAN generator tail.

Fuses the final upsample (rate 2, kernel 4) + the 3-branch MRF ResBlock1
stack + conv_post + tanh — the ops of covomix/vocoder/models.py:100-116 from
the last ConvTranspose1d on — into ONE kernel (SURVEY §7 step 2).

Why: the tail is per-op-dispatch-bound on TPU, not FLOP-bound. At the
covomix config's final stage the activations are 31-channel — 31 of 128 MXU
lanes — and XLA cannot fuse across conv boundaries, so the 20 narrow convs
each pay a full HBM round-trip + op overhead (~0.8-1 ms apiece at the
serving shape regardless of kernel size or batch).

How: activations live in VMEM in a space-to-depth packed layout — 4
consecutive output samples x 31 channels = 124 of 128 lanes (the input
feeding the upsample is packed as 2 frames x 62 channels = 124). Every conv
becomes a short chain of tap-matmuls [E, 124] x [124, 124] against
"packed" weights: weight W'[g][r*C + cin, j*C + cout] = w[tau][cin, cout]
where the original tap tau of a dilation-d conv contributes to output phase
j from input offset off = j + d*(tau - k//2), split as off = 4*g + r.
Identical math, MXU-aligned lanes, zero HBM traffic between the 20 convs.

Tiles overlap by a halo H (manual DMA from HBM, since BlockSpecs cannot
overlap); every intermediate is computed on the full tile extent and rows
outside the true sequence are re-zeroed after each conv so sequence-edge
semantics exactly match the op-by-op path (each torch/XLA conv zero-pads at
the sequence boundary, so out-of-range intermediates behave as zeros there,
not as bias-propagated values).

Exactness vs the unfused path: tests/test_vocoder_tail.py (interpret mode).
"""

from __future__ import annotations

import functools
import math
from typing import List, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = 4            # output space-to-depth factor (4 samples -> lanes)
LRELU = 0.1      # ResBlock / inter-stage slope (models.py LRELU_SLOPE)
POST_LRELU = 0.01  # torch default before conv_post (models.py:112)


# ---------------------------------------------------------------------------
# static tap planning


def _conv_taps(k: int, d: int) -> List[Tuple[int, List[Tuple[int, int, int]]]]:
    """Tap plan for a same-padded dilation-d conv on the F-packed layout.

    Returns [(g, [(r, j, tau), ...])]: group offset g (in packed units), with
    the (input phase r, output phase j, original tap tau) entries it carries."""
    c = k // 2
    groups = {}
    for j in range(F):
        for tau in range(k):
            off = j + d * (tau - c)
            g = math.floor(off / F)
            r = off - F * g
            groups.setdefault(g, []).append((r, j, tau))
    return sorted(groups.items())


def _upsample_taps() -> List[Tuple[int, List[Tuple[int, int, int]]]]:
    """Tap plan for ConvTranspose1d(stride 2, kernel 4, padding 1) from the
    2-frame-packed 62ch input to the 4-sample-packed 31ch output.

    From layers.conv_transpose1d semantics y[o] = sum_tau w[tau] *
    x[(o - tau + pad) / u] (u | o - tau + pad):
      y[2t]   = w[1] x[t] + w[3] x[t-1]
      y[2t+1] = w[0] x[t+1] + w[2] x[t]
    Output unit t' covers samples 4t'..4t'+3 (t = 2t', 2t'+1); input unit s
    covers frames 2s, 2s+1. Entries are (input phase r, output phase j, tau)."""
    entries = {  # g -> [(r, j, tau)]
        -1: [(1, 0, 3)],
        0: [(0, 0, 1), (1, 1, 0), (0, 1, 2), (1, 2, 1), (0, 2, 3), (1, 3, 2)],
        1: [(0, 3, 0)],
    }
    return sorted(entries.items())


def plan_tail(kernels=(3, 7, 11), dilations=((1, 3, 5),) * 3):
    """Static slot plan: list of convs, each a list of (g, W-slot) pairs.

    Conv order: up, then per branch j: per level l: conv1, conv2; then post."""
    convs = [("up", _upsample_taps())]
    for j, k in enumerate(kernels):
        for l, d in enumerate(dilations[j]):
            convs.append((f"b{j}l{l}c1", _conv_taps(k, d)))
            convs.append((f"b{j}l{l}c2", _conv_taps(k, 1)))
    convs.append(("post", _conv_taps(7, 1)))
    slot = 0
    plan = []
    for name, taps in convs:
        entry = []
        for g, _ in taps:
            entry.append((g, slot))
            slot += 1
        plan.append((name, entry))
    return plan, slot  # slot == total number of [124, 124] weight mats


def _halo_units(kernels=(3, 7, 11), dilations=((1, 3, 5),) * 3) -> int:
    """Garbage creep per tile side: the worst branch's cumulative reach."""
    worst = 0
    for j, k in enumerate(kernels):
        reach = 0
        for d in dilations[j]:
            reach += max(abs(g) for g, _ in _conv_taps(k, d))
            reach += max(abs(g) for g, _ in _conv_taps(k, 1))
        worst = max(worst, reach)
    up = max(abs(g) for g, _ in _upsample_taps())
    post = max(abs(g) for g, _ in _conv_taps(7, 1))
    return worst + up + post


def _halo_from_plan(plan, extra_reach: int = 0) -> int:
    """Tile halo derived from the ACTUAL tap plan (worst branch's cumulative
    reach + up/post), so a caller config with larger kernels/dilations can
    never desync the halo from the packed weights (review r3: the call sites
    previously used _halo_units() with DEFAULT kernels regardless of cfg).
    `extra_reach` adds reach handled outside the plan (the stage kernel's
    upsample matmul)."""
    up = post = 0
    branch: dict = {}
    for name, entry in plan:
        reach = max(abs(g) for g, _ in entry)
        if name == "up":
            up = reach
        elif name == "post":
            post = reach
        else:
            b = name.split("l")[0]     # 'b{j}l{l}c1'/'...s2' -> branch 'b{j}'
            branch[b] = branch.get(b, 0) + reach
    return up + max(branch.values(), default=0) + post + extra_reach


# ---------------------------------------------------------------------------
# packed weight assembly (traced; tiny)


def pack_tail_weights(up_p, resblocks, post_p, channels: int,
                      kernels=(3, 7, 11), dilations=((1, 3, 5),) * 3,
                      dtype=jnp.bfloat16):
    """Build the stacked packed weights [NT, F*C, F*C] + biases [NC, F*C].

    up_p: {'w' [4, 2C, C], 'b' [C]}; resblocks: 3 ResBlock1 param dicts
    (convs1/convs2 lists of {'w' [k, C, C], 'b' [C]}); post_p: {'w' [7, C, 1],
    'b' [1]}."""
    C = channels
    plan, n_slots = plan_tail(kernels, dilations)
    lanes = F * C

    mats = [jnp.zeros((lanes, lanes), jnp.float32)] * n_slots
    biases = []

    def fill(taps, w, slot_of_g, in_c=C):
        # w: [k, in_c, C]; scatter into mats[slot] at [r*in_c + cin, j*C + cout]
        for g, entries in taps:
            m = jnp.zeros((lanes, lanes), jnp.float32)
            for (r, j, tau) in entries:
                m = m.at[r * in_c:(r + 1) * in_c, j * C:(j + 1) * C].set(
                    w[tau].astype(jnp.float32))
            mats[slot_of_g[g]] = m

    ci = 0
    name, entry = plan[ci]
    assert name == "up"
    # up input is 2 frames x 2C channels = F*C lanes: in-phase r indexes frames
    fill(_upsample_taps(), up_p["w"], dict(entry), in_c=2 * C)
    biases.append(jnp.tile(up_p["b"].astype(jnp.float32), F))
    ci += 1

    for j, k in enumerate(kernels):
        for l, d in enumerate(dilations[j]):
            for which, dd in (("convs1", d), ("convs2", 1)):
                name, entry = plan[ci]
                p = resblocks[j][which][l]
                fill(_conv_taps(k, dd), p["w"], dict(entry))
                biases.append(jnp.tile(p["b"].astype(jnp.float32), F))
                ci += 1

    name, entry = plan[ci]
    assert name == "post"
    # post: [7, C, 1] -> packed [.., F*C, F] -> pad out cols to F*C
    for g, entries in _conv_taps(7, 1):
        m = jnp.zeros((lanes, lanes), jnp.float32)
        for (r, jph, tau) in entries:
            m = m.at[r * C:(r + 1) * C, jph:jph + 1].set(post_p["w"][tau].astype(jnp.float32))
        mats[dict(entry)[g]] = m
    biases.append(jnp.pad(jnp.tile(post_p["b"].astype(jnp.float32), F), (0, lanes - F)))

    # pad lanes to the 128 tiling (Mosaic requires 128-aligned DMA slices;
    # zero weight rows/cols keep the math exact and the extra lanes at 0)
    lp = ((lanes + 127) // 128) * 128
    Wm = jnp.stack([jnp.pad(m, ((0, lp - lanes), (0, lp - lanes))) for m in mats]).astype(dtype)
    Bm = jnp.stack([jnp.pad(b, (0, lp - lanes)) for b in biases]).astype(jnp.float32)
    return Wm, Bm, plan


# ---------------------------------------------------------------------------
# kernel


def _tail_kernel(x_hbm, w_ref, b_ref, o_ref, scratch, sem, *,
                 plan, tbu: int, halo: int, total_units: int, channels: int):
    E = tbu + 2 * halo
    lanes = w_ref.shape[1]          # F*C padded to the 128 tiling
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * tbu, E), :], scratch, sem)
    dma.start()
    dma.wait()

    # absolute-unit validity mask: rows outside [0, total_units) are virtual
    # padding; re-zero after every conv so sequence edges match op-by-op
    # zero-padding semantics exactly.
    row = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
    abs_u = i * tbu - halo + row
    valid = jnp.logical_and(abs_u >= 0, abs_u < total_units)

    def tapconv(v, conv_entry, bias_row):
        gs = [g for g, _ in conv_entry]
        lo, hi = -min(gs), max(gs)
        vp = jnp.concatenate(
            [jnp.zeros((lo, lanes), v.dtype), v, jnp.zeros((hi, lanes), v.dtype)], axis=0) \
            if (lo or hi) else v
        acc = None
        for g, slot in conv_entry:
            y = jax.lax.dot_general(vp[g + lo:g + lo + E], w_ref[slot],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        acc = acc + b_ref[bias_row]
        return jnp.where(valid, acc, 0.0)

    def lrelu(v, slope):
        return jnp.where(v >= 0, v, v * slope)

    plan_d = dict((name, entry) for name, entry in plan)
    x = scratch[...]
    x = jnp.where(valid, x, jnp.zeros_like(x))      # tail-of-last-tile DMA garbage
    up = tapconv(lrelu(x.astype(jnp.float32), LRELU).astype(x.dtype), plan_d["up"], 0).astype(x.dtype)

    bias_row = 1
    branch_sum = None
    for j in range(3):
        state = up
        for l in range(3):
            h = tapconv(lrelu(state.astype(jnp.float32), LRELU).astype(x.dtype),
                        plan_d[f"b{j}l{l}c1"], bias_row).astype(x.dtype)
            bias_row += 1
            h = tapconv(lrelu(h.astype(jnp.float32), LRELU).astype(x.dtype),
                        plan_d[f"b{j}l{l}c2"], bias_row)
            bias_row += 1
            state = (h + state.astype(jnp.float32)).astype(x.dtype)
        branch_sum = state.astype(jnp.float32) if branch_sum is None else branch_sum + state.astype(jnp.float32)
    m = (branch_sum / 3.0)

    m = lrelu(m, POST_LRELU).astype(x.dtype)
    wav = jnp.tanh(tapconv(m, plan_d["post"], bias_row))
    o_ref[0] = wav[halo:halo + tbu, :F]


def fused_tail(x2: jnp.ndarray, Wm: jnp.ndarray, Bm: jnp.ndarray, plan,
               *, channels: int, tbu: int = 2048, interpret: bool = False) -> jnp.ndarray:
    """x2: [B, T2, 2C] stage-3 output (pre-activation). Returns wav [B, 2*T2].

    Applies lrelu -> up3 -> MRF -> lrelu(0.01) -> conv_post -> tanh fused."""
    B, T2, twoC = x2.shape
    C = channels
    assert twoC == 2 * C
    assert T2 % 2 == 0, "tail kernel requires an even stage-3 length (always true for the covomix upsample chain)"
    total_units = T2 // 2
    # Mosaic requires VMEM slices 8-aligned along the sublane dim: keep the
    # tile extent tbu + 2*halo a multiple of 8.
    halo = ((_halo_from_plan(plan) + 2 + 3) // 4) * 4
    tbu = min(tbu, ((total_units + 7) // 8) * 8)
    n = max(1, -(-total_units // tbu))
    lanes = F * C
    lanes_p = ((lanes + 127) // 128) * 128
    # packed input: [B, units, 2 frames x 2C] = [B, units, F*C], lane-padded
    xp = x2.reshape(B, total_units, lanes)
    xp = jnp.pad(xp, ((0, 0), (halo, halo + n * tbu - total_units), (0, lanes_p - lanes)))

    kernel = functools.partial(_tail_kernel, plan=plan, tbu=tbu, halo=halo,
                               total_units=total_units, channels=C)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n * tbu, F), jnp.float32),
        grid=(B, n),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(Wm.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(Bm.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tbu, F), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tbu + 2 * halo, lanes_p), x2.dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * tbu * Wm.shape[0] * lanes * lanes,
            bytes_accessed=xp.size * xp.dtype.itemsize + B * n * tbu * F * 4,
            transcendentals=B * n * tbu * F,
        ),
        interpret=interpret,
    )(xp, Wm, Bm)
    return out.reshape(B, n * tbu * F)[:, :2 * T2]


# ---------------------------------------------------------------------------
# stage-3 fused kernel: ConvTranspose1d(rate 4, kernel 4, padding 0) + the
# 62-channel 3-branch MRF in one pass. Same machinery as the tail kernel but
# on a 4-frames x 62-ch = 248-lane packed layout with the x1 frame index as
# the common timeline; rate-4 k=4 p=0 upsampling is phase-separable
# (y[4t+j] = w[j] x1[t], a single tap group), so there is no upsample halo.
# Output is the raw MRF state [B, T1*4, 62] — exactly fused_tail's input.


def _stage_up_taps():
    """ConvTranspose1d(stride 4, kernel 4, padding 0): y[o] = sum_tau w[tau]
    x[(o - tau)/4 | 4 divides] -> y[4t + j] = w[j] x1[t]."""
    return [(0, [(0, j, j) for j in range(F)])]


def pack_stage_weights(up_p, resblocks, channels: int, in_channels: int,
                       kernels=(3, 7, 11), dilations=((1, 3, 5),) * 3,
                       dtype=jnp.bfloat16):
    """up_p: {'w' [4, in_channels, C], 'b' [C]}; resblocks as in
    pack_tail_weights. Returns (Wup [1, in_lanes, lanes], Wm [NT, lanes,
    lanes], Bm [1+18, lanes], plan) with lanes = 128-padded F*C."""
    C = channels
    lanes = F * C
    lp = ((lanes + 127) // 128) * 128
    in_lp = ((in_channels + 127) // 128) * 128

    up = jnp.zeros((in_lp, lp), jnp.float32)
    for g, entries in _stage_up_taps():
        for (r, j, tau) in entries:
            up = up.at[:in_channels, j * C:(j + 1) * C].set(up_p["w"][tau].astype(jnp.float32))
    biases = [jnp.pad(jnp.tile(up_p["b"].astype(jnp.float32), F), (0, lp - lanes))]

    plan = []
    mats = []
    for j, k in enumerate(kernels):
        for l, d in enumerate(dilations[j]):
            for which, dd in (("convs1", d), ("convs2", 1)):
                p = resblocks[j][which][l]
                entry = []
                for g, entries in _conv_taps(k, dd):
                    m = jnp.zeros((lp, lp), jnp.float32)
                    for (r, jph, tau) in entries:
                        m = m.at[r * C:(r + 1) * C, jph * C:(jph + 1) * C].set(
                            p["w"][tau].astype(jnp.float32))
                    entry.append((g, len(mats)))
                    mats.append(m)
                plan.append((f"b{j}l{l}s{1 if which == 'convs1' else 2}", entry))
                biases.append(jnp.pad(jnp.tile(p["b"].astype(jnp.float32), F), (0, lp - lanes)))
    Wup = jnp.stack([up]).astype(dtype)
    Wm = jnp.stack(mats).astype(dtype)
    Bm = jnp.stack(biases).astype(jnp.float32)
    return Wup, Wm, Bm, plan


def _stage_kernel(x_hbm, wup_ref, w_ref, b_ref, o_ref, scratch, sem, *,
                  plan, tbu: int, halo: int, total_units: int, channels: int):
    E = tbu + 2 * halo
    lanes = w_ref.shape[1]
    b = pl.program_id(0)
    i = pl.program_id(1)

    dma = pltpu.make_async_copy(x_hbm.at[b, pl.ds(i * tbu, E), :], scratch, sem)
    dma.start()
    dma.wait()

    row = jax.lax.broadcasted_iota(jnp.int32, (E, 1), 0)
    abs_u = i * tbu - halo + row
    valid = jnp.logical_and(abs_u >= 0, abs_u < total_units)

    def tapconv(v, conv_entry, bias_row):
        gs = [g for g, _ in conv_entry]
        lo, hi = max(0, -min(gs)), max(0, max(gs))
        vp = jnp.concatenate(
            [jnp.zeros((lo, lanes), v.dtype), v, jnp.zeros((hi, lanes), v.dtype)], axis=0) \
            if (lo or hi) else v
        acc = None
        for g, slot in conv_entry:
            y = jax.lax.dot_general(vp[g + lo:g + lo + E], w_ref[slot],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
        acc = acc + b_ref[bias_row]
        return jnp.where(valid, acc, 0.0)

    def lrelu(v, slope):
        return jnp.where(v >= 0, v, v * slope)

    x = scratch[...]
    x = jnp.where(valid, x, jnp.zeros_like(x))
    # up2: single-tap phase-separable conv_transpose from the x1 lanes
    up = jax.lax.dot_general(lrelu(x.astype(jnp.float32), LRELU).astype(x.dtype),
                             wup_ref[0], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    up = jnp.where(valid, up + b_ref[0], 0.0).astype(x.dtype)

    plan_d = dict(plan)
    bias_row = 1
    branch_sum = None
    for j in range(3):
        state = up
        for l in range(3):
            h = tapconv(lrelu(state.astype(jnp.float32), LRELU).astype(x.dtype),
                        plan_d[f"b{j}l{l}s1"], bias_row).astype(x.dtype)
            bias_row += 1
            h = tapconv(lrelu(h.astype(jnp.float32), LRELU).astype(x.dtype),
                        plan_d[f"b{j}l{l}s2"], bias_row)
            bias_row += 1
            state = (h + state.astype(jnp.float32)).astype(x.dtype)
        branch_sum = state.astype(jnp.float32) if branch_sum is None else branch_sum + state.astype(jnp.float32)
    m = (branch_sum / 3.0).astype(x.dtype)
    o_ref[0] = m[halo:halo + tbu]


def fused_stage(x1: jnp.ndarray, Wup: jnp.ndarray, Wm: jnp.ndarray, Bm: jnp.ndarray,
                plan, *, channels: int, tbu: int = 512, interpret: bool = False) -> jnp.ndarray:
    """x1: [B, T1, Cin] pre-activation input of the rate-4 upsample stage.
    Returns the MRF output [B, 4*T1, channels] (pre-activation input of the
    next stage)."""
    B, T1, cin = x1.shape
    C = channels
    lanes = F * C
    lp = Wm.shape[1]
    in_lp = Wup.shape[1]
    up_reach = max(abs(g) for g, _ in _stage_up_taps())
    halo = ((_halo_from_plan(plan, extra_reach=up_reach) + 2 + 3) // 4) * 4
    tbu = min(tbu, ((T1 + 7) // 8) * 8)
    n = max(1, -(-T1 // tbu))
    xp = jnp.pad(x1, ((0, 0), (halo, halo + n * tbu - T1), (0, in_lp - cin)))

    kernel = functools.partial(_stage_kernel, plan=plan, tbu=tbu, halo=halo,
                               total_units=T1, channels=C)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((B, n * tbu, lp), x1.dtype),
        grid=(B, n),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(Wup.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(Wm.shape, lambda b, i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(Bm.shape, lambda b, i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tbu, lp), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tbu + 2 * halo, in_lp), x1.dtype),
                        pltpu.SemaphoreType.DMA(())],
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n * tbu * (Wm.shape[0] + 1) * lp * lp,
            bytes_accessed=(B * n * tbu * (in_lp + lp)) * x1.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(xp, Wup, Wm, Bm)
    # [B, n*tbu, lp] -> packed units are 4 frames x C channels
    out = out[:, :T1, :lanes]
    return out.reshape(B, T1 * F, C)
