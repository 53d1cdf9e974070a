"""Voicebox-style flow-matching acoustic model (VoSingle / VoMix), TPU-native.

Re-implements the capability of covomix/covomix_model/acoustic.py:
  * CoVoMix transformer (acoustic.py:326-538): concat [noisy mel x_t, phoneme emb,
    cond mel] -> Linear -> depthwise-conv positional embed -> depth-layer
    transformer with U-Net skip connections in the 2nd half, rotary positions,
    adaptive RMSNorm conditioned on a learned-sinusoidal flow-time embedding ->
    Linear to mel.
  * ConditionalFlowMatcherWrapper (acoustic.py:560-791): OT-CFM training
    (sigma=0, Voicebox eq. 5-6) and fixed-step midpoint ODE sampling.

TPU-first design decisions (vs the reference):
  * the ODE sampler is ONE jitted `lax.scan` over 16 midpoint steps
    (reference: torchdiffeq odeint python loop, acoustic.py:651-656)
  * classifier-free guidance folds the (cond, null) pair into the batch axis so
    every ODE eval is a single forward at 2B (reference: two sequential calls,
    acoustic.py:421-428); the combine rule is the reference's nonstandard
    `logits*(1+s) - s*null` (acoustic.py:428)
  * masks/cond-drop randomness is drawn by the caller and passed in, keeping the
    model pure for pjit/vmap/scan composition.

Variant wiring (acoustic.py:345-408):
  mode='single'   VoSingle: x 80-d, cond 80-d, 1 phoneme stream, out 80-d
  mode='two_two'            x/cond = 2*dim_in stacked streams, 2 phoneme streams
  mode='two_one'  VoMix:    x 80-d mixed target, cond 160-d (2 speaker mels),
                            2 phoneme streams, out 80-d
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp

from covomix_tpu.models import layers as L
from covomix_tpu.ops.flash_attention import attend_flash_or_xla


@dataclasses.dataclass(frozen=True)
class AcousticConfig:
    dim_in: int = 80                 # CoVoMix_dim: mel dim (160 for two_two; cond dim for two_one)
    dim: int = 1024                  # transformer width (CoVoMix_dim_transformer)
    depth: int = 8
    dim_head: int = 64
    heads: int = 16
    ff_mult: int = 4
    num_phoneme_tokens: int = 502    # semantic vocab incl. pad/eos; null id == num_phoneme_tokens
    dim_phoneme_emb: int = 1024
    conv_pos_kernel: int = 31
    mode: str = "single"             # 'single' | 'two_two' | 'two_one'
    p_drop_prob: float = 0.3
    frac_lengths_mask: tuple = (0.7, 1.0)

    @property
    def time_hidden_dim(self) -> int:
        return self.dim * 4

    @property
    def mel_dim(self) -> int:
        """dim of x (the flow state) and of the output."""
        return 80 if self.mode == "two_one" else self.dim_in

    @property
    def n_phoneme_streams(self) -> int:
        return 2 if self.mode in ("two_two", "two_one") else 1

    @property
    def embed_in_dim(self) -> int:
        # acoustic.py:375-380
        if self.mode == "two_two":
            return self.dim_in * 2 + 2 * self.dim_phoneme_emb
        if self.mode == "two_one":
            return self.dim_in + 80 + 2 * self.dim_phoneme_emb
        return self.dim_in * 2 + self.dim_phoneme_emb


def init(key, cfg: AcousticConfig):
    keys = iter(jax.random.split(key, 16 + 6 * cfg.depth))
    d = cfg.dim
    p = {
        "sinu_weights": jax.random.normal(next(keys), (d // 2,), jnp.float32),
        "time_mlp": L.linear_init(next(keys), d, cfg.time_hidden_dim),
        "phoneme_emb": L.embedding_init(next(keys), cfg.num_phoneme_tokens + 1, cfg.dim_phoneme_emb),
        "null_cond": jnp.zeros((cfg.dim_in,), jnp.float32),
        "to_embed": L.linear_init(next(keys), cfg.embed_in_dim, d),
        "conv_embed": L.conv1d_init(next(keys), d, d, cfg.conv_pos_kernel, groups=d),
        "final_norm": L.rmsnorm_init(d),
        "to_pred": L.linear_init(next(keys), d, cfg.mel_dim, bias=False),
    }
    half = cfg.depth // 2
    layers_p = []
    for i in range(cfg.depth):
        lp = {
            "attn_norm": L.adaptive_rmsnorm_init(next(keys), d, cfg.time_hidden_dim),
            "qkv": L.linear_init(next(keys), d, cfg.heads * cfg.dim_head * 3, bias=False),
            "attn_out": L.linear_init(next(keys), cfg.heads * cfg.dim_head, d, bias=False),
            "ff_norm": L.adaptive_rmsnorm_init(next(keys), d, cfg.time_hidden_dim),
            "ff1": L.linear_init(next(keys), d, d * cfg.ff_mult),
            "ff2": L.linear_init(next(keys), d * cfg.ff_mult, d),
        }
        if i >= half:  # U-Net skip combiner on 2nd half (acoustic.py:274-284)
            lp["skip"] = L.linear_init(next(keys), d * 2, d)
        layers_p.append(lp)
    p["layers"] = layers_p
    return p


def _time_embedding(params, times, dtype):
    """LearnedSinusoidalPosEmb + Linear + SiLU (acoustic.py:98-111, :361-365)."""
    freqs = times[:, None].astype(jnp.float32) * params["sinu_weights"][None, :] * 2 * math.pi
    fouriered = jnp.concatenate([jnp.sin(freqs), jnp.cos(freqs)], axis=-1)
    h = L.linear(params["time_mlp"], fouriered.astype(dtype))
    return jax.nn.silu(h)


def layer_core(lp, cfg: AcousticConfig, x, time_emb, key_mask=None, valid_len=None,
               positions=None, attend_fn=None):
    """One transformer layer (attention + FFN blocks with adaptive RMSNorm),
    excluding the U-Net skip combiner (acoustic.py:286-310 loop body). Shared
    by the sequential `_transformer`, the pipeline-parallel stage function
    (parallel/pipeline.py), and the sequence-parallel transformer
    (parallel/ring.py — which injects global rotary `positions` and a ring
    `attend_fn`)."""
    inv_freq = L.rotary_freqs(cfg.dim_head)
    if positions is None:
        positions = jnp.arange(x.shape[1])
    h = L.adaptive_rmsnorm(lp["attn_norm"], x, time_emb)
    qkv = L.linear(lp["qkv"], h)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q, k, v = (L.split_heads(t, cfg.heads) for t in (q, k, v))
    if attend_fn is None:
        # dense non-causal attention: Pallas flash kernel on TPU for long
        # sequences, XLA einsum otherwise (ops/flash_attention.py).
        # Bucket-padded inference passes valid_len (scalar prefix length) and
        # stays on the flash kernel; an arbitrary bool key_mask routes
        # through the masked einsum path. Rotary is passed DOWN so the flash
        # path applies it inside the kernel (42.1 -> 32.9 ms/layer at the
        # B=64 serving shape, tools/attn_fuse_probe.py) — the dispatcher's
        # fallbacks apply rotary_halfsplit externally, bit-identically.
        attn = attend_flash_or_xla(q, k, v, key_mask=key_mask, valid_len=valid_len,
                                   rotary=(positions, inv_freq))
    else:
        q = L.rotary_halfsplit(positions, inv_freq, q)
        k = L.rotary_halfsplit(positions, inv_freq, k)
        attn = attend_fn(q, k, v)
    x = L.linear(lp["attn_out"], L.merge_heads(attn)) + x
    h = L.adaptive_rmsnorm(lp["ff_norm"], x, time_emb)
    h = L.linear(lp["ff2"], L.gelu(L.linear(lp["ff1"], h)))
    return h + x


def _transformer(params, cfg: AcousticConfig, x, time_emb, key_mask=None, valid_len=None):
    half = cfg.depth // 2
    skips = []
    for i, lp in enumerate(params["layers"]):
        if i < half:
            skips.append(x)
        else:
            x = L.linear(lp["skip"], jnp.concatenate([x, skips.pop()], axis=-1))
        x = layer_core(lp, cfg, x, time_emb, key_mask=key_mask, valid_len=valid_len)
    return L.rmsnorm(params["final_norm"], x)


def embed_inputs(
    params,
    cfg: AcousticConfig,
    x: jnp.ndarray,
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    times: jnp.ndarray,
    *,
    cond_drop_mask: Optional[jnp.ndarray] = None,
    key_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
):
    """Everything in `forward` before the transformer stack: input projection,
    depthwise-conv positional embedding, flow-time embedding (acoustic.py:
    496-508 + :361-365). Returns (h, time_emb)."""
    x = x.astype(dtype)
    emb = static_embed(params, cfg, phoneme_ids, cond, cond_drop_mask=cond_drop_mask, dtype=dtype)
    h = x @ params["to_embed"]["w"].astype(dtype)[: cfg.mel_dim] + emb
    conv_in = h if key_mask is None else h * key_mask[..., None].astype(dtype)
    conv = L.gelu(L.depthwise_conv1d(params["conv_embed"], conv_in, padding=cfg.conv_pos_kernel // 2))
    h = conv + h  # acoustic.py:508
    return h, _time_embedding(params, times, dtype)


def static_embed(
    params,
    cfg: AcousticConfig,
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    *,
    cond_drop_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Precompute the x-independent part of the input projection.

    to_embed(cat[x, ph, cond]) == x @ W_x + (ph @ W_ph + cond @ W_c + b); the
    parenthesized term is constant across every ODE evaluation of a sample
    call (only x_t changes), so the sampler computes it ONCE instead of 32
    times — an exact algebraic split of acoustic.py:504-506 saving ~15% of
    the flow stage's FLOPs at reference scale (embed_in 2288 vs mel 80)."""
    cond = cond.astype(dtype)
    if cond_drop_mask is not None:
        null_cond = params["null_cond"].astype(dtype)
        cond = jnp.where(cond_drop_mask[:, None, None], null_cond[None, None, :], cond)
        nd = cond_drop_mask[:, None, None] if phoneme_ids.ndim == 3 else cond_drop_mask[:, None]
        phoneme_ids = jnp.where(nd, cfg.num_phoneme_tokens, phoneme_ids)

    ph = L.embedding(params["phoneme_emb"], phoneme_ids, dtype)
    if ph.ndim == 4:  # two streams: [B,T,2,P] -> [B,T,2P] (acoustic.py:499-500)
        b, t = ph.shape[:2]
        ph = ph.reshape(b, t, 2 * cfg.dim_phoneme_emb)
    w = params["to_embed"]["w"].astype(dtype)
    md = cfg.mel_dim
    out = ph @ w[md : md + ph.shape[-1]] + cond @ w[md + ph.shape[-1]:]
    if "b" in params["to_embed"]:
        out = out + params["to_embed"]["b"].astype(dtype)
    return out


def forward(
    params,
    cfg: AcousticConfig,
    x: jnp.ndarray,              # [B, T, mel_dim] noisy flow state
    phoneme_ids: jnp.ndarray,    # [B, T] or [B, T, 2] int
    cond: jnp.ndarray,           # [B, T, dim_in] conditioning mel (already masked by caller for training)
    times: jnp.ndarray,          # [B] flow times
    *,
    cond_drop_mask: Optional[jnp.ndarray] = None,  # [B] bool; True -> drop cond (CFG null branch)
    precomputed_embed: Optional[jnp.ndarray] = None,  # from static_embed()
    key_mask: Optional[jnp.ndarray] = None,  # [B, T] bool; False = padded frame (attention-excluded)
    valid_len=None,                          # scalar: frames >= valid_len are bucket padding
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Vector-field prediction (acoustic.py:430-521). Pure: all randomness
    (span mask, cond-drop coin flips) is resolved by the caller.

    `key_mask` has no reference counterpart (the reference runs exact-length
    inference, acoustic.py:514 passes no mask); it exists so bucket-padded TPU
    inference attends like exact-length inference — see tests/test_bucket_skew.py."""
    x = x.astype(dtype)
    if precomputed_embed is None:
        precomputed_embed = static_embed(params, cfg, phoneme_ids, cond,
                                         cond_drop_mask=cond_drop_mask, dtype=dtype)
    h = x @ params["to_embed"]["w"].astype(dtype)[: cfg.mel_dim] + precomputed_embed
    # bucket padding: zero padded frames before the depthwise conv so its
    # 15-frame halo sees the same zeros an exact-length edge would
    # (see embed_inputs for the un-fused variant used by the PP schedule)
    if key_mask is None and valid_len is not None:
        vl = jnp.asarray(valid_len, jnp.int32).reshape(-1)  # [1] scalar or [B] per-row
        frame_keep = (jnp.arange(h.shape[1])[None, :] < vl[:, None])[..., None].astype(dtype)
        conv_in = h * frame_keep
    elif key_mask is not None:
        conv_in = h * key_mask[..., None].astype(dtype)
    else:
        conv_in = h
    conv = L.gelu(L.depthwise_conv1d(params["conv_embed"], conv_in, padding=cfg.conv_pos_kernel // 2))
    h = conv + h  # acoustic.py:508
    time_emb = _time_embedding(params, times, dtype)
    h = _transformer(params, cfg, h, time_emb, key_mask=key_mask, valid_len=valid_len)
    return L.linear(params["to_pred"], h).astype(jnp.float32)


# ---------------------------------------------------------------------------
# training-side mask + loss (ConditionalFlowMatcherWrapper.forward, acoustic.py:732-791)


def random_span_mask(key, batch: int, seq_len: int, frac_lo: float, frac_hi: float) -> jnp.ndarray:
    """mask_from_frac_lengths (acoustic.py:81-94): one contiguous True span per row."""
    k1, k2 = jax.random.split(key)
    frac = jax.random.uniform(k1, (batch,), minval=frac_lo, maxval=frac_hi)
    lengths = (frac * seq_len).astype(jnp.int32)
    max_start = seq_len - lengths
    start = (max_start * jax.random.uniform(k2, (batch,))).astype(jnp.int32)
    end = start + lengths
    seq = jnp.arange(seq_len)[None, :]
    return (seq >= start[:, None]) & (seq < end[:, None])


def training_mask(key, cfg: AcousticConfig, batch: int, seq_len: int) -> jnp.ndarray:
    """Reference default when no mask is supplied (acoustic.py:460-466):
    coin-flip between a frac-length span mask and bernoulli(p_drop)."""
    kc, ks, kb = jax.random.split(key, 3)
    span = random_span_mask(ks, batch, seq_len, *cfg.frac_lengths_mask)
    bern = jax.random.uniform(kb, (batch, seq_len)) < cfg.p_drop_prob
    return jnp.where(jax.random.bernoulli(kc), span, bern)


def cfm_inputs(
    cfg: AcousticConfig,
    key,
    x1: jnp.ndarray,
    cond: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    *,
    cond_drop_prob: float = 0.0,
    sigma: float = 0.0,
):
    """Resolve all training-step randomness for the OT-CFM objective
    (acoustic.py:732-791): returns (w, times, flow, mask, cond_masked,
    cond_drop_mask). Split out of `cfm_loss` so parallel schedules (e.g. the
    pipeline-parallel loss in parallel/pipeline.py) consume bit-identical
    inputs for a given key."""
    b, t, _ = x1.shape
    k_noise, k_t, k_mask, k_drop = jax.random.split(key, 4)
    if mask is None:
        mask = training_mask(k_mask, cfg, b, t)
    x0 = jax.random.normal(k_noise, x1.shape, jnp.float32)
    times = jax.random.uniform(k_t, (b,))
    tt = times[:, None, None]
    w = (1 - (1 - sigma) * tt) * x0 + tt * x1
    flow = x1 - (1 - sigma) * x0
    # cond zeroed on the masked region during training (acoustic.py:468-469)
    cond = cond * (~mask)[:, :, None]
    cond_drop_mask = None
    if cond_drop_prob > 0:
        cond_drop_mask = jax.random.uniform(k_drop, (b,)) < cond_drop_prob
    return w, times, flow, mask, cond, cond_drop_mask


def masked_mse(pred: jnp.ndarray, flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Per-row masked-mean MSE summed over rows (acoustic.py:527-538 without
    the final batch mean)."""
    err = jnp.mean(jnp.square(pred - flow), axis=-1)       # 'b n d -> b n'
    err = jnp.where(mask, err, 0.0)
    num = jnp.sum(err, axis=-1)
    den = jnp.clip(jnp.sum(mask, axis=-1).astype(jnp.float32), min=1e-5)
    return jnp.sum(num / den)


def cfm_loss(
    params,
    cfg: AcousticConfig,
    key,
    x1: jnp.ndarray,             # [B, T, mel_dim] target mel
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,   # [B, T] True = region to infill / score
    *,
    cond_drop_prob: float = 0.0,
    sigma: float = 0.0,
    dtype=jnp.float32,
):
    """OT-CFM objective (acoustic.py:732-791 following Voicebox eq. 5-6):
      w = (1 - (1-sigma) t) x0 + t x1 ;  flow = x1 - (1-sigma) x0
    with masked-mean MSE over the masked region (acoustic.py:527-538)."""
    w, times, flow, mask, cond, cond_drop_mask = cfm_inputs(
        cfg, key, x1, cond, mask, cond_drop_prob=cond_drop_prob, sigma=sigma)
    pred = forward(params, cfg, w, phoneme_ids, cond, times, cond_drop_mask=cond_drop_mask, dtype=dtype)
    return masked_mse(pred, flow, mask) / x1.shape[0]


# ---------------------------------------------------------------------------
# sampling (ConditionalFlowMatcherWrapper.sample, acoustic.py:597-688)


def sample(
    params,
    cfg: AcousticConfig,
    key,
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    *,
    cond_scale: float = 1.0,
    step_size: float = 0.0625,
    key_mask: Optional[jnp.ndarray] = None,
    valid_len=None,
    noise: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> jnp.ndarray:
    """Midpoint ODE integration of the learned vector field from t=0 to t=1 as a
    single lax.scan (16 steps at the reference's ode_step_size=0.0625,
    acoustic.py:568-591). CFG (cond_scale != 1) runs cond+null as one 2B-batch
    forward and combines with `logits*(1+s) - s*null` (acoustic.py:414-428).

    Note the reference's `sample` accepts a mask but ignores it (callers trim
    afterwards, monologue_generation.py:172); we keep that contract. `key_mask`
    [B, T] / `valid_len` (scalar true length, or [B] one per row) are
    different: they exclude bucket-padding frames from attention so padded
    inference matches exact-length inference (tests/test_bucket_skew.py).
    Prefer `valid_len` — it keeps attention on the Pallas flash kernel (the
    bool-mask path falls back to the XLA einsum)."""
    n_steps = int(round(1.0 / step_size))
    b, t = cond.shape[0], cond.shape[1]
    # `noise` overrides the y0 draw (y0 ~ N(0, I), acoustic.py:650) — used by
    # parity tests that must run the same noise through two layouts
    y0 = jax.random.normal(key, (b, t, cfg.mel_dim), jnp.float32) if noise is None \
        else noise.astype(jnp.float32)

    use_cfg = cond_scale != 1.0

    if use_cfg:
        ph2 = jnp.concatenate([phoneme_ids, phoneme_ids], axis=0)
        c2 = jnp.concatenate([cond, cond], axis=0)
        drop = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0)
        emb2 = static_embed(params, cfg, ph2, c2, cond_drop_mask=drop, dtype=dtype)
        km2 = None if key_mask is None else jnp.concatenate([key_mask, key_mask], axis=0)
        if valid_len is not None and jnp.ndim(valid_len) >= 1:
            valid_len = jnp.concatenate([valid_len, valid_len], axis=0)  # cond + null rows

        def field(y, times_scalar):
            y2 = jnp.concatenate([y, y], axis=0)
            times = jnp.full((2 * b,), times_scalar)
            out = forward(params, cfg, y2, ph2, c2, times, cond_drop_mask=drop,
                          precomputed_embed=emb2, key_mask=km2, valid_len=valid_len, dtype=dtype)
            logits, null_logits = out[:b], out[b:]
            return logits * (1 + cond_scale) - cond_scale * null_logits
    else:
        emb1 = static_embed(params, cfg, phoneme_ids, cond,
                            cond_drop_mask=jnp.zeros((b,), bool), dtype=dtype)

        def field(y, times_scalar):
            times = jnp.full((b,), times_scalar)
            return forward(params, cfg, y, phoneme_ids, cond, times,
                           precomputed_embed=emb1, key_mask=key_mask, valid_len=valid_len, dtype=dtype)

    h = 1.0 / n_steps

    def step(y, i):
        t0 = i.astype(jnp.float32) * h
        k1 = field(y, t0)
        k2 = field(y + 0.5 * h * k1, t0 + 0.5 * h)
        return y + h * k2, None

    y, _ = jax.lax.scan(step, y0, jnp.arange(n_steps))
    return y


# Tsitouras 5(4) Runge-Kutta coefficients (the torchode Tsit5 method used by
# the reference's use_torchode=True path, acoustic.py:659-683)
_TSIT5_C = (0.0, 0.161, 0.327, 0.9, 0.9800255409045097, 1.0, 1.0)
_TSIT5_A = (
    (),
    (0.161,),
    (-0.008480655492356989, 0.335480655492357),
    (2.8971530571054935, -6.359448489975075, 4.3622954328695815),
    (5.325864828439257, -11.748883564062828, 7.4955393428898365, -0.09249506636175525),
    (5.86145544294642, -12.92096931784711, 8.159367898576159, -0.071584973281401, -0.028269050394068383),
    (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742, -3.290069515436081, 2.324710524099774),
)
_TSIT5_B = (0.09646076681806523, 0.01, 0.4798896504144996, 1.379008574103742, -3.290069515436081, 2.324710524099774, 0.0)
# error-estimate weights btilde = b - bhat (standard Tsitouras 5(4) values)
_TSIT5_E = (
    -0.001780011052226, -0.000816434459657, 0.007880878010262, -0.144711007173263,
    0.582357165452555, -0.458082105929187, 1.0 / 66.0,
)


def sample_adaptive(
    params,
    cfg: AcousticConfig,
    key,
    phoneme_ids: jnp.ndarray,
    cond: jnp.ndarray,
    *,
    cond_scale: float = 1.0,
    atol: float = 1e-5,
    rtol: float = 1e-5,
    max_steps: int = 64,
    dtype=jnp.float32,
):
    """Adaptive Tsit5 integration of the vector field (torchode path parity,
    acoustic.py:659-683: Tsit5 + IntegralController(atol, rtol)) as a single
    jitted `lax.while_loop` with static max_steps. Step size adapts via the
    embedded 4th-order error estimate and an integral (I) controller.

    Returns (y, num_steps_taken). Typically fewer field evaluations than the
    16-step midpoint sampler for smooth (trained) fields at these tolerances.

    bf16-capable: stage derivatives k_s and the y/err accumulations are kept
    in f32 regardless of the field compute dtype, and the error scale carries
    an additive rounding-noise floor eps(dtype)*h*rms_feat(k) — under bf16 the
    embedded 5(4) estimate is dominated by per-stage output rounding
    (err_noise ~ sqrt(sum E_s^2)*eps*h*|k| >> the true truncation error at
    the reference tolerances), so without the floor the controller rejects
    every step down to h ~ 0 (the round-2 f32-only limitation). With it the
    controller tracks the true error wherever it is resolvable and the
    solution accuracy is bounded by the bf16 noise floor itself (~1e-3
    relative — the same bound the bf16 midpoint serving path carries)."""
    b, t = cond.shape[0], cond.shape[1]
    y0 = jax.random.normal(key, (b, t, cfg.mel_dim), jnp.float32)
    use_cfg = cond_scale != 1.0

    if use_cfg:
        ph2 = jnp.concatenate([phoneme_ids, phoneme_ids], axis=0)
        c2 = jnp.concatenate([cond, cond], axis=0)
        drop = jnp.concatenate([jnp.zeros((b,), bool), jnp.ones((b,), bool)], axis=0)
        emb2 = static_embed(params, cfg, ph2, c2, cond_drop_mask=drop, dtype=dtype)

        def field(y, tt):
            y2 = jnp.concatenate([y, y], axis=0)
            times = jnp.full((2 * b,), tt)
            out = forward(params, cfg, y2, ph2, c2, times, cond_drop_mask=drop,
                          precomputed_embed=emb2, dtype=dtype)
            return out[:b] * (1 + cond_scale) - cond_scale * out[b:]
    else:
        zdrop = jnp.zeros((b,), bool)
        emb1 = static_embed(params, cfg, phoneme_ids, cond, cond_drop_mask=zdrop, dtype=dtype)

        def field(y, tt):
            times = jnp.full((b,), tt)
            return forward(params, cfg, y, phoneme_ids, cond, times,
                           precomputed_embed=emb1, dtype=dtype)

    n_stages = 7

    # Low-precision noise floor for the error scale: rounding inside the bf16
    # field layers injects noise into each k_s element proportional to the
    # FRAME's derivative scale (the matmul row magnitudes), not the element's
    # own |k| — so the floor is eps * h * rms_features(k) per [B, T] frame
    # (measured: elementwise |k|-proportional floors leave small-|k| elements
    # 14x over floor and the controller still rejects). eps=0 for f32+ — the
    # floor vanishes and the controller is unchanged.
    noise_eps = float(jnp.finfo(dtype).eps) if jnp.finfo(dtype).bits < 32 else 0.0

    def rk_step(y, tt, h):
        ks = []
        for s in range(n_stages):
            y_s = y
            for j, a in enumerate(_TSIT5_A[s]):
                y_s = y_s + h * a * ks[j]
            # k_s in f32: accumulation noise must not add to the rounding
            # noise already priced into the floor term
            ks.append(field(y_s, tt + _TSIT5_C[s] * h).astype(jnp.float32))
        y_new = y
        err = jnp.zeros_like(y)
        ksq = jnp.zeros_like(y)
        for s in range(n_stages):
            y_new = y_new + h * _TSIT5_B[s] * ks[s]
            err = err + h * _TSIT5_E[s] * ks[s]
            ksq = ksq + jnp.square(ks[s])
        krms = jnp.sqrt(jnp.mean(ksq / n_stages, axis=-1, keepdims=True))  # [B, T, 1]
        return y_new, err, krms

    def err_norm(err, y, y_new, h, krms):
        scale = atol + rtol * jnp.maximum(jnp.abs(y), jnp.abs(y_new)) + noise_eps * h * krms
        return jnp.sqrt(jnp.mean(jnp.square(err / scale)))

    def cond_fn(state):
        tt, _, _, steps, _ = state
        return (tt < 1.0) & (steps < max_steps)

    def body_fn(state):
        tt, y, h, steps, _ = state
        h = jnp.minimum(h, 1.0 - tt)
        y_new, err, krms = rk_step(y, tt, h)
        en = err_norm(err, y, y_new, h, krms)
        accept = en <= 1.0
        # integral controller: h *= clip(0.9 * en^(-1/5), 0.2, 5)
        factor = jnp.clip(0.9 * jnp.power(jnp.maximum(en, 1e-10), -0.2), 0.2, 5.0)
        h_next = h * factor
        tt = jnp.where(accept, tt + h, tt)
        y = jnp.where(accept, y_new, y)
        return (tt, y, h_next, steps + 1, en)

    state = (jnp.float32(0.0), y0, jnp.float32(0.05), jnp.int32(0), jnp.float32(0.0))
    tt, y, _, steps, _ = jax.lax.while_loop(cond_fn, body_fn, state)
    return y, steps


def sample_regression(params, cfg: AcousticConfig, key, phoneme_ids, cond, *, cond_scale: float = 1.0, dtype=jnp.float32):
    """Single-shot regression sample at random t (acoustic.py:690-727)."""
    kt, kn = jax.random.split(key)
    b, t = cond.shape[0], cond.shape[1]
    times = jax.random.uniform(kt, (b,))
    y0 = jax.random.normal(kn, (b, t, cfg.mel_dim), jnp.float32)
    out = forward(params, cfg, y0, phoneme_ids, cond, times, cond_drop_mask=jnp.zeros((b,), bool), dtype=dtype)
    if cond_scale == 1.0:
        return out
    null = forward(params, cfg, y0, phoneme_ids, cond, times, cond_drop_mask=jnp.ones((b,), bool), dtype=dtype)
    return out * (1 + cond_scale) - cond_scale * null
