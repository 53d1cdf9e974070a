"""HiFi-GAN vocoder (generator + MPD/MSD discriminators + GAN losses), TPU-native.

Re-implements covomix/vocoder/models.py and hifi-gan/models.py:
  * Generator (models.py:75-125): conv_pre 80->C k7 -> per stage
    [leaky_relu(0.1) -> ConvTranspose1d upsample -> mean of |K| MRF ResBlock1s]
    -> leaky_relu(default slope 0.01, models.py:112) -> conv_post -> tanh.
  * ResBlock1 (models.py:11-48): 3x [lrelu -> dilated conv -> lrelu -> conv d=1]
    with residual adds.
  * MultiPeriodDiscriminator (hifi-gan/models.py:164-188), periods 2,3,5,7,11;
    MultiScaleDiscriminator (hifi-gan/models.py:219-248) with AvgPool downsampling.
  * feature_loss x2, LSGAN discriminator/generator losses (hifi-gan/models.py:251-282).

CoVoMix config (hifi-gan/config_covomix.json): upsample_rates [5,4,4,2] (160x),
upsample_kernel_sizes [8,8,4,4], initial channel 500, resblock '1',
kernel_sizes [3,7,11], dilations [[1,3,5]]*3, 8 kHz output.

TPU-first notes:
  * activations in NWC layout; convs lower to MXU matmuls via lax.conv_general_dilated
  * transposed convs run as input-dilated convolutions (layers.conv_transpose1d)
  * weight norm exists in checkpoints only: the converter folds g*v/||v|| into a
    plain weight (remove_weight_norm at load, models.py:118-125); our trainer
    parametrizes (v, g) like the reference and folds on the fly under jit.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp

from covomix_tpu.models import layers as L

LRELU_SLOPE = 0.1


@dataclasses.dataclass(frozen=True)
class VocoderConfig:
    num_mels: int = 80
    upsample_initial_channel: int = 500
    upsample_rates: tuple = (5, 4, 4, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4)
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock: str = "1"
    sampling_rate: int = 8000

    @property
    def total_upsample(self) -> int:
        out = 1
        for u in self.upsample_rates:
            out *= u
        return out


def get_padding(kernel: int, dilation: int = 1) -> int:
    return (kernel * dilation - dilation) // 2


def output_length(cfg: VocoderConfig, frames: int) -> int:
    """Waveform samples produced for `frames` mel frames — the torch
    ConvTranspose1d length chain ((T-1)*u - 2p + k per stage; conv_pre/post
    and MRF are length-preserving). covomix config: 160*T + 32."""
    t = frames
    for u, k in zip(cfg.upsample_rates, cfg.upsample_kernel_sizes):
        t = (t - 1) * u - 2 * ((k - u) // 2) + k
    return t


def _resblock1_init(key, channels: int, kernel: int, dilations: Sequence[int]):
    keys = jax.random.split(key, 2 * len(dilations))
    return {
        "convs1": [L.conv1d_init(keys[2 * i], channels, channels, kernel) for i in range(len(dilations))],
        "convs2": [L.conv1d_init(keys[2 * i + 1], channels, channels, kernel) for i in range(len(dilations))],
    }


def _resblock1(p, x, kernel: int, dilations: Sequence[int], mask_fn=None):
    m = mask_fn or (lambda h: h)
    for c1, c2, d in zip(p["convs1"], p["convs2"], dilations):
        xt = L.leaky_relu(x, LRELU_SLOPE)
        xt = m(L.conv1d(c1, xt, padding=get_padding(kernel, d), rhs_dilation=d))
        xt = L.leaky_relu(xt, LRELU_SLOPE)
        xt = m(L.conv1d(c2, xt, padding=get_padding(kernel, 1)))
        x = xt + x
    return x


def _mrf_packed(blocks, x, channels: int, kernels, dilations, mask_fn=None):
    """All |K| ResBlock1 branches of one MRF stage evaluated as ONE conv per
    (level, conv1/conv2) — 6 convs instead of 18.

    The vocoder tail is per-op-bound on TPU, not FLOP-bound: a dense
    [11, 93, 93] conv at the stage-4 shape costs the same wall time as a
    [3, 31, 31] conv (~0.8 ms; conv wall is flat from B=1 to B=16), so
    evaluating the three parallel branches as block-diagonal 3C-channel convs
    trades free MXU FLOPs for 12 fewer op dispatches (measured 22.9 -> 15.9 ms
    on the [4, 145952, 31] stage). Branch kernels (3/7/11) are zero-padded to
    kmax taps — identical edge behavior since zero taps contribute nothing.
    Requires every branch to share the same per-level dilation tuple (true for
    config_covomix.json: [[1,3,5]]*3) and ResBlock1 structure (models.py:11-48).
    Exact vs the unpacked path (tests/test_vocoder.py)."""
    kmax = max(kernels)

    def pad_taps(w):
        k = w.shape[0]
        lo = kmax // 2 - k // 2
        return jnp.pad(w, ((lo, kmax - k - lo), (0, 0), (0, 0)))

    def block_diag(ws):
        out = jnp.zeros((kmax, 3 * channels, 3 * channels), ws[0].dtype)
        for j, w in enumerate(ws):
            out = out.at[:, j * channels:(j + 1) * channels, j * channels:(j + 1) * channels].set(w)
        return out

    def conv(h, w, b, d):
        pad = get_padding(kmax, d)
        return jax.lax.conv_general_dilated(
            h, w.astype(h.dtype), (1,), [(pad, pad)], rhs_dilation=(d,),
            dimension_numbers=("NWC", "WIO", "NWC")) + b.astype(h.dtype)

    b_, t_ = x.shape[0], x.shape[1]
    m = mask_fn or (lambda h: h)
    xb = jnp.concatenate([x, x, x], axis=-1)
    for l in range(len(dilations[0])):
        d = dilations[0][l]
        w1s = [pad_taps(blocks[j]["convs1"][l]["w"]) for j in range(3)]
        b1 = jnp.concatenate([blocks[j]["convs1"][l]["b"] for j in range(3)])
        # level 0 reads the shared upsample output: a true dense C -> 3C conv
        w1 = jnp.concatenate(w1s, axis=2) if l == 0 else block_diag(w1s)
        h = m(conv(L.leaky_relu(x if l == 0 else xb, LRELU_SLOPE), w1, b1, d))
        w2 = block_diag([pad_taps(blocks[j]["convs2"][l]["w"]) for j in range(3)])
        b2 = jnp.concatenate([blocks[j]["convs2"][l]["b"] for j in range(3)])
        h = m(conv(L.leaky_relu(h, LRELU_SLOPE), w2, b2, 1))
        xb = xb + h
    return xb.reshape(b_, t_, 3, channels).mean(2)


def _can_pack_mrf(cfg: VocoderConfig, channels: int) -> bool:
    """Packing pays only while 3*channels fits one 128-lane tile (measured: a
    186-channel block-diagonal conv is FLOP-bound and slower than unpacked)."""
    dil0 = cfg.resblock_dilation_sizes[0]
    return (cfg.resblock == "1" and len(cfg.resblock_kernel_sizes) == 3
            and 3 * channels <= 128
            and all(tuple(dl) == tuple(dil0) for dl in cfg.resblock_dilation_sizes))


def _resblock2_init(key, channels: int, kernel: int, dilations: Sequence[int]):
    keys = jax.random.split(key, len(dilations))
    return {"convs": [L.conv1d_init(keys[i], channels, channels, kernel) for i in range(len(dilations))]}


def _resblock2(p, x, kernel: int, dilations: Sequence[int], mask_fn=None):
    m = mask_fn or (lambda h: h)
    for c, d in zip(p["convs"], dilations):
        xt = L.leaky_relu(x, LRELU_SLOPE)
        xt = m(L.conv1d(c, xt, padding=get_padding(kernel, d), rhs_dilation=d))
        x = xt + x
    return x


def init_generator(key, cfg: VocoderConfig):
    n_stages = len(cfg.upsample_rates)
    n_kernels = len(cfg.resblock_kernel_sizes)
    keys = iter(jax.random.split(key, 2 + n_stages * (1 + n_kernels)))
    c0 = cfg.upsample_initial_channel
    p = {"conv_pre": L.conv1d_init(next(keys), cfg.num_mels, c0, 7)}
    ups, resblocks = [], []
    rb_init = _resblock1_init if cfg.resblock == "1" else _resblock2_init
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        cin, cout = c0 // (2**i), c0 // (2 ** (i + 1))
        ups.append(L.conv1d_init(next(keys), cin, cout, k))  # stored [K, Cin, Cout]
        for kr, dr in zip(cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes):
            resblocks.append(rb_init(next(keys), cout, kr, dr))
    p["ups"] = ups
    p["resblocks"] = resblocks
    p["conv_post"] = L.conv1d_init(next(keys), c0 // (2**n_stages), 1, 7)
    return p


def _can_fuse_tail(cfg: VocoderConfig) -> bool:
    """The Pallas fused-tail kernel (ops/vocoder_tail.py) covers the final
    [lrelu -> ConvTranspose1d(r=2, k=4, p=1) -> 3-branch ResBlock1 MRF ->
    lrelu(0.01) -> conv_post(k=7) -> tanh] — the covomix config's tail."""
    return (cfg.resblock == "1" and len(cfg.resblock_kernel_sizes) == 3
            and cfg.upsample_rates[-1] == 2 and cfg.upsample_kernel_sizes[-1] == 4
            and 4 * (cfg.upsample_initial_channel // (2 ** len(cfg.upsample_rates))) <= 128)


def generator(params, cfg: VocoderConfig, mel: jnp.ndarray, dtype=jnp.float32,
              fuse_tail: bool = None, valid_len=None) -> jnp.ndarray:
    """mel [B, T, num_mels] -> waveform [B, T*total_upsample] in [-1, 1].

    Mirrors Generator.forward (covomix/vocoder/models.py:100-116).

    fuse_tail: None = auto (TPU + covomix-shaped config): run the last
    upsample + MRF + conv_post + tanh as ONE Pallas kernel on a
    space-to-depth packed layout (ops/vocoder_tail.py; 12.6 -> 4.6 ms on the
    [4, 912-frame] serving shape — the tail is per-op-dispatch-bound, and
    XLA cannot fuse across the 20 narrow-channel convs).

    valid_len (scalar or [B] int, in MEL FRAMES): frames >= valid_len are
    bucket/batch padding. Activations beyond each row's valid extent are
    re-zeroed after EVERY conv, so positions inside the valid extent see
    exactly the zero-padding an exact-length (reference-convention) run
    would — the first output_length(cfg, n) samples of each row equal
    exact-length vocoding bit-for-bit (tests/test_vocoder.py). The reference
    has no batched vocoder, so there is no reference counterpart; this is
    what makes bucketed (hifigan_inference) and batched (serving) vocoding
    quality-identical to the per-file path. Forces the unfused conv path
    (the Pallas tail kernel is static-length)."""
    mask_fn = None
    if valid_len is not None:
        fuse_tail = False
        vl = jnp.asarray(valid_len, jnp.int32).reshape(-1)  # [1] or [B]

        def make_mask(v):
            def mask(h):
                keep = jnp.arange(h.shape[1])[None, :] < v[:, None]
                return h * keep[..., None].astype(h.dtype)
            return mask

        mask_fn = make_mask(vl)
        mel = mask_fn(mel)  # pad frames (e.g. MEL_PAD fill) must read as zero
    x = L.conv1d(params["conv_pre"], mel.astype(dtype), padding=3)
    if mask_fn is not None:
        x = mask_fn(x)
    n_kernels = len(cfg.resblock_kernel_sizes)
    rb = _resblock1 if cfg.resblock == "1" else _resblock2
    n_stages = len(cfg.upsample_rates)
    if fuse_tail is None:
        fuse_tail = jax.devices()[0].platform == "tpu" and _can_fuse_tail(cfg)
    for i, (u, k) in enumerate(zip(cfg.upsample_rates, cfg.upsample_kernel_sizes)):
        channels = cfg.upsample_initial_channel // (2 ** (i + 1))
        stage_blocks = params["resblocks"][i * n_kernels:(i + 1) * n_kernels]
        if fuse_tail and i == n_stages - 2 and u == 4 and k == 4 and 4 * channels <= 256:
            # rate-4 k=4 p=0 upsample + MRF fused (phase-separable upsample)
            from covomix_tpu.ops import vocoder_tail as VT

            Wup, Wm, Bm, plan = VT.pack_stage_weights(
                params["ups"][i], stage_blocks, channels, x.shape[-1],
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes, dtype=dtype)
            x = VT.fused_stage(x, Wup, Wm, Bm, plan, channels=channels,
                               interpret=(fuse_tail == "interpret"))
            continue
        if fuse_tail and i == n_stages - 1 and x.shape[1] % 2 == 0:
            from covomix_tpu.ops import vocoder_tail as VT

            Wm, Bm, plan = VT.pack_tail_weights(
                params["ups"][i], stage_blocks, params["conv_post"], channels,
                cfg.resblock_kernel_sizes, cfg.resblock_dilation_sizes, dtype=dtype)
            return VT.fused_tail(x, Wm, Bm, plan, channels=channels,
                                 interpret=(fuse_tail == "interpret"))
        x = L.leaky_relu(x, LRELU_SLOPE)
        x = L.conv_transpose1d(params["ups"][i], x, stride=u, padding=(k - u) // 2, kernel=k)
        if mask_fn is not None:
            # valid length follows the torch ConvTranspose1d length chain
            vl = (vl - 1) * u - 2 * ((k - u) // 2) + k
            mask_fn = make_mask(vl)
            x = mask_fn(x)
        if cfg.resblock == "1" and _can_pack_mrf(cfg, channels):
            x = _mrf_packed(stage_blocks, x, channels, cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes, mask_fn=mask_fn)
            continue
        acc = None
        for j in range(n_kernels):
            y = rb(stage_blocks[j], x, cfg.resblock_kernel_sizes[j],
                   cfg.resblock_dilation_sizes[j], mask_fn=mask_fn)
            acc = y if acc is None else acc + y
        x = acc / n_kernels
    x = L.leaky_relu(x)  # torch default slope 0.01 (models.py:112)
    x = L.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[..., 0].astype(jnp.float32)


# ---------------------------------------------------------------------------
# discriminators (hifi-gan/models.py:128-248)

_MPD_PERIODS = (2, 3, 5, 7, 11)
_MPD_CHANNELS = (32, 128, 512, 1024, 1024)


def init_mpd(key):
    ds = []
    for pi, period in enumerate(_MPD_PERIODS):
        keys = iter(jax.random.split(jax.random.fold_in(key, pi), 8))
        convs = []
        cin = 1
        for ci, cout in enumerate(_MPD_CHANNELS):
            # Conv2d(kernel (5,1), stride (3,1) except last, padding (2,0))
            k = jax.random.normal(next(keys), (5, 1, cin, cout), jnp.float32) * 0.02
            convs.append({"w": k, "b": jnp.zeros((cout,), jnp.float32)})
            cin = cout
        post = {"w": jax.random.normal(next(keys), (3, 1, 1024, 1), jnp.float32) * 0.02, "b": jnp.zeros((1,), jnp.float32)}
        ds.append({"convs": convs, "conv_post": post})
    return {"discriminators": ds}


def _conv2d(p, x, stride, padding):
    y = jax.lax.conv_general_dilated(
        x, p["w"].astype(x.dtype), window_strides=stride, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["b"].astype(x.dtype)


def _disc_p(p, x, period: int):
    """x [B, T] -> (score [B, n], fmaps). DiscriminatorP (hifi-gan/models.py:128-161)."""
    b, t = x.shape
    n_pad = (-t) % period
    if n_pad:
        x = jnp.pad(x, ((0, 0), (0, n_pad)), mode="reflect")
        t = t + n_pad
    x = x.reshape(b, t // period, period, 1)
    fmap = []
    for i, c in enumerate(p["convs"]):
        stride = (3, 1) if i < 4 else (1, 1)
        pad = [(2, 2), (0, 0)]
        x = _conv2d(c, x, stride, pad)
        x = L.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = _conv2d(p["conv_post"], x, (1, 1), [(1, 1), (0, 0)])
    fmap.append(x)
    return x.reshape(b, -1), fmap


def mpd(params, y: jnp.ndarray, y_hat: jnp.ndarray):
    """Returns (real_scores, gen_scores, real_fmaps, gen_fmaps)."""
    rs, gs, fr, fg = [], [], [], []
    for p, period in zip(params["discriminators"], _MPD_PERIODS):
        r, fmap_r = _disc_p(p, y, period)
        g, fmap_g = _disc_p(p, y_hat, period)
        rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
    return rs, gs, fr, fg


_MSD_SPECS = [  # (c_out, kernel, stride, groups, padding)
    (128, 15, 1, 1, 7),
    (128, 41, 2, 4, 20),
    (256, 41, 2, 16, 20),
    (512, 41, 4, 16, 20),
    (1024, 41, 4, 16, 20),
    (1024, 41, 1, 16, 20),
    (1024, 5, 1, 1, 2),
]


def init_msd(key):
    ds = []
    for di in range(3):
        keys = iter(jax.random.split(jax.random.fold_in(key, di), 10))
        convs = []
        cin = 1
        for cout, k, s, g, pd in _MSD_SPECS:
            w = jax.random.normal(next(keys), (k, cin // g, cout), jnp.float32) * 0.02
            convs.append({"w": w, "b": jnp.zeros((cout,), jnp.float32)})
            cin = cout
        post = L.conv1d_init(next(keys), 1024, 1, 3)
        ds.append({"convs": convs, "conv_post": post})
    return {"discriminators": ds}


def _disc_s(p, x):
    """DiscriminatorS (hifi-gan/models.py:191-216). x [B, T]."""
    x = x[..., None]
    fmap = []
    for c, (cout, k, s, g, pd) in zip(p["convs"], _MSD_SPECS):
        x = L.conv1d(c, x, stride=s, padding=pd, groups=g)
        x = L.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = L.conv1d(p["conv_post"], x, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def _avgpool4_2(x):
    """AvgPool1d(4, 2, padding=2) on [B, T] (hifi-gan/models.py:227-230).
    torch counts the zero padding in the average (count_include_pad=True).
    Computed as a strided ones/4 conv — NOT a [T/2, 4] 2D-index gather, which
    stalls pathologically on this stack (CLAUDE.md) and sat inside the jitted
    GAN step (msd runs twice per gan_step on both y and y_hat)."""
    xp = jnp.pad(x, ((0, 0), (2, 2)))[..., None]          # [B, T+4, 1]
    w = jnp.full((4, 1, 1), 0.25, xp.dtype)               # [K, I, O] 'WIO'
    out = jax.lax.conv_general_dilated(
        xp, w, (2,), [(0, 0)], dimension_numbers=("NWC", "WIO", "NWC"))
    return out[..., 0]


def msd(params, y: jnp.ndarray, y_hat: jnp.ndarray):
    rs, gs, fr, fg = [], [], [], []
    for i, p in enumerate(params["discriminators"]):
        if i != 0:
            y = _avgpool4_2(y)
            y_hat = _avgpool4_2(y_hat)
        r, fmap_r = _disc_s(p, y)
        g, fmap_g = _disc_s(p, y_hat)
        rs.append(r); gs.append(g); fr.append(fmap_r); fg.append(fmap_g)
    return rs, gs, fr, fg


# ---------------------------------------------------------------------------
# losses (hifi-gan/models.py:251-282)


def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss += jnp.mean(jnp.abs(rl - gl))
    return loss * 2


def discriminator_loss(real_outs, gen_outs):
    loss = 0.0
    for dr, dg in zip(real_outs, gen_outs):
        loss += jnp.mean(jnp.square(1 - dr)) + jnp.mean(jnp.square(dg))
    return loss


def generator_adv_loss(gen_outs):
    loss = 0.0
    for dg in gen_outs:
        loss += jnp.mean(jnp.square(1 - dg))
    return loss
