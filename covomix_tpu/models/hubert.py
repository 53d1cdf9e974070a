"""HuBERT semantic tokenizer (wav -> 50 Hz k-means unit ids), TPU-native.

Re-implements the load-bearing inference slice of the fairseq fork:
  * ConvFeatureExtractionModel (fairseq/models/wav2vec/wav2vec2.py:844-922):
    7 strided Conv1d layers "[(512,10,5)]+[(512,3,2)]*4+[(512,2,2)]*2" (320x
    downsample -> 50 Hz at 16 kHz), group-norm on the first layer, GELU, no bias.
  * HubertModel.extract_features (fairseq/models/hubert/hubert.py:433-549):
    features -> LayerNorm -> proj 512->768 -> encoder, returning the hidden
    state after `output_layer` (layer 12 for CoVoMix tokens).
  * TransformerEncoder (wav2vec2.py:948-1259, post-LN / layer_norm_first=False):
    x += conv positional embedding (k=128, groups=16, weight-normed, SamePad
    trims one sample for even k, GELU); LayerNorm; then per layer
    [x += MHA(x); LN; x += FFN(x); LN].
  * ApplyKmeans (examples/hubert/simple_kmeans/dump_km_label.py:26-50):
    argmin_c ||x||^2 - 2 x.C^T + ||c||^2 over 500 centroids — one matmul+argmin.
  * HubertFeatureReader chunking at 1.6 M samples (=100 s)
    (examples/textless_nlp/gslm/speech2unit/pretrained/hubert_feature_reader.py:21-77).

The 7 strided convs are expressed as lax.conv_general_dilated in NWC layout;
at 16 kHz the whole tokenizer is ~95% encoder matmuls, which is what the MXU
wants. The k-means quantizer is a single [T,768]x[768,500] matmul + argmin.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.models import layers as L
from covomix_tpu.ops.flash_attention import attend_flash_or_xla


@dataclasses.dataclass(frozen=True)
class HubertConfig:
    # conv frontend: (dim, kernel, stride) per layer (hubert.py:108-112 default)
    conv_layers: tuple = ((512, 10, 5), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 3, 2), (512, 2, 2), (512, 2, 2))
    encoder_layers: int = 12
    encoder_embed_dim: int = 768
    encoder_ffn_dim: int = 3072
    encoder_heads: int = 12
    conv_pos: int = 128
    conv_pos_groups: int = 16
    output_layer: int = 12          # 1-based tap for CoVoMix tokens
    sample_rate: int = 16000
    normalize: bool = False         # task cfg `normalize` (layer-norm the wav)
    max_chunk: int = 1_600_000      # samples per chunk (100 s)
    num_units: int = 500

    @property
    def downsample(self) -> int:
        d = 1
        for _, _, s in self.conv_layers:
            d *= s
        return d


def init(key, cfg: HubertConfig):
    keys = iter(jax.random.split(key, 8 + 6 * cfg.encoder_layers + len(cfg.conv_layers)))
    d = cfg.encoder_embed_dim
    p = {
        "conv_layers": [],
        "fe_group_norm": {"gamma": jnp.ones((cfg.conv_layers[0][0],), jnp.float32),
                          "beta": jnp.zeros((cfg.conv_layers[0][0],), jnp.float32)},
        "layer_norm": L.layernorm_init(cfg.conv_layers[-1][0]),
        "post_extract_proj": L.linear_init(next(keys), cfg.conv_layers[-1][0], d),
        "pos_conv": L.conv1d_init(next(keys), d, d, cfg.conv_pos, groups=cfg.conv_pos_groups),
        "encoder_layer_norm": L.layernorm_init(d),
        "layers": [],
        "kmeans": jax.random.normal(next(keys), (cfg.num_units, d), jnp.float32),
    }
    c_in = 1
    for (dim, k, s) in cfg.conv_layers:
        lp = L.conv1d_init(next(keys), c_in, dim, k, bias=False)
        p["conv_layers"].append(lp)
        c_in = dim
    for _ in range(cfg.encoder_layers):
        p["layers"].append({
            "q": L.linear_init(next(keys), d, d),
            "k": L.linear_init(next(keys), d, d),
            "v": L.linear_init(next(keys), d, d),
            "out": L.linear_init(next(keys), d, d),
            "attn_ln": L.layernorm_init(d),
            "fc1": L.linear_init(next(keys), d, cfg.encoder_ffn_dim),
            "fc2": L.linear_init(next(keys), cfg.encoder_ffn_dim, d),
            "final_ln": L.layernorm_init(d),
        })
    return p


def conv_frontend(params, cfg: HubertConfig, wav: jnp.ndarray, dtype=jnp.float32,
                  valid_samples=None) -> jnp.ndarray:
    """[B, T] waveform -> [B, T/320, 512] features (wav2vec2.py:915-922).

    `valid_samples` [B] int: true sample count per row for padded batches.
    The first layer's group norm is per-channel instance norm over TIME, so
    without it the padded zeros shift every valid frame's statistics away
    from exact-length (reference per-file) extraction. Later conv layers are
    strictly local/causal-in-range: valid output frames depend only on valid
    earlier frames, so only the norm needs the mask."""
    x = wav.astype(dtype)[..., None]  # [B, T, 1]
    t_valid = None if valid_samples is None else jnp.asarray(valid_samples, jnp.int32)
    for i, ((dim, k, s), lp) in enumerate(zip(cfg.conv_layers, params["conv_layers"])):
        x = L.conv1d(lp, x, stride=s, padding="VALID")
        if t_valid is not None:
            t_valid = jnp.maximum((t_valid - k) // s + 1, 0)
        if i == 0:
            # Fp32GroupNorm(num_groups=dim, channels=dim) == per-channel instance norm
            lm = None if t_valid is None else (
                jnp.arange(x.shape[1])[None, :] < t_valid[:, None])
            x = L.groupnorm(params["fe_group_norm"], x, num_groups=dim, length_mask=lm)
        x = L.gelu(x)
    return x


def _encoder_layer(lp, x, heads, key_mask=None, valid_frames=None):
    """Post-LN transformer layer (wav2vec2 TransformerSentenceEncoderLayer,
    layer_norm_first=False).

    `valid_frames` ([B] int) asserts key_mask is the PREFIX mask
    arange < valid_frames — attention then rides the Pallas flash kernel on
    TPU (per-row valid_len) instead of the masked-einsum path, which
    materializes the f32 [B, H, T, T] score tensor in HBM (383 MB/layer at
    the BASELINE-config-3 bench shape B=8, T=999). An arbitrary
    (non-prefix) key_mask still takes the einsum path."""
    residual = x
    q = L.split_heads(L.linear(lp["q"], x), heads)
    k = L.split_heads(L.linear(lp["k"], x), heads)
    v = L.split_heads(L.linear(lp["v"], x), heads)
    if key_mask is None or valid_frames is not None:
        att = attend_flash_or_xla(q, k, v, valid_len=valid_frames)
    else:
        att = attend_flash_or_xla(q, k, v, key_mask=key_mask)
    att = L.merge_heads(att)
    x = residual + L.linear(lp["out"], att)
    x = L.layernorm(lp["attn_ln"], x)
    residual = x
    h = L.gelu(L.linear(lp["fc1"], x))
    x = residual + L.linear(lp["fc2"], h)
    return L.layernorm(lp["final_ln"], x)


def num_output_frames(cfg: HubertConfig, num_samples: int) -> int:
    """Frame count the VALID-padded conv stack yields for num_samples."""
    t = num_samples
    for _, k, s in cfg.conv_layers:
        t = (t - k) // s + 1
    return t


def extract_features(
    params,
    cfg: HubertConfig,
    wav: jnp.ndarray,
    *,
    output_layer: Optional[int] = None,
    padding_mask: Optional[jnp.ndarray] = None,   # [B, frames] True = valid
    valid_samples=None,                           # [B] true sample counts (padded batches)
    valid_frames=None,                            # [B] true frame counts (prefix masks only)
    dtype=jnp.float32,
) -> jnp.ndarray:
    """[B, T] 16 kHz waveform -> [B, frames, 768] layer-`output_layer` hiddens
    (hubert.py:433-549 with features_only path).

    `padding_mask` supports bucketed/batched extraction on TPU: padded frames
    are zeroed before the positional conv and masked out of attention,
    mirroring forward_padding_mask + index_put (hubert.py:427-431, wav2vec2.py
    extract_features). When the mask is a PREFIX mask (all production callers:
    right-padded batches), pass `valid_frames` ([B] int true frame counts) as
    well — encoder attention then runs the Pallas flash kernel on TPU instead
    of the HBM-bound masked einsum."""
    output_layer = output_layer or cfg.output_layer
    feats = conv_frontend(params, cfg, wav, dtype, valid_samples=valid_samples)
    feats = L.layernorm(params["layer_norm"], feats)
    x = L.linear(params["post_extract_proj"], feats)
    if padding_mask is not None:
        x = x * padding_mask[..., None].astype(x.dtype)

    # conv positional embedding (make_conv_pos, wav2vec2.py:925-944):
    # padding k//2 then SamePad trims the trailing element for even k
    pos = L.conv1d(params["pos_conv"], x, padding=cfg.conv_pos // 2, groups=cfg.conv_pos_groups)
    if cfg.conv_pos % 2 == 0:
        pos = pos[:, :-1]
    x = x + L.gelu(pos)
    x = L.layernorm(params["encoder_layer_norm"], x)

    for li in range(output_layer):
        x = _encoder_layer(params["layers"][li], x, cfg.encoder_heads,
                           key_mask=padding_mask, valid_frames=valid_frames)
    return x


def kmeans_assign(params, feats: jnp.ndarray) -> jnp.ndarray:
    """[..., 768] features -> unit ids, matching ApplyKmeans
    (dump_km_label.py:37-50): argmin ||x||^2 - 2 x C^T + ||c||^2."""
    c = params["kmeans"].astype(feats.dtype)  # [U, D]
    c_sq = jnp.sum(jnp.square(c), axis=-1)
    x_sq = jnp.sum(jnp.square(feats), axis=-1, keepdims=True)
    dist = x_sq - 2.0 * (feats @ c.T) + c_sq[None, :]
    return jnp.argmin(dist, axis=-1)


def wav2units_jit(params, cfg: HubertConfig, wav: jnp.ndarray, padding_mask=None,
                  valid_samples=None, dtype=jnp.float32) -> jnp.ndarray:
    """Single-chunk [B, T] wav -> [B, frames] unit ids (jit-friendly).

    For padded rows pass BOTH padding_mask (frame-level, attention + feature
    zeroing) and valid_samples (sample-level, group-norm statistics) — then
    ids over the valid frames equal exact-length extraction bit-for-bit.

    Note: when cfg.normalize, the caller must layer-norm the *whole* utterance
    before chunking (hubert_feature_reader.py:46-55 normalizes per file).

    padding_mask here is PREFIX by contract (right-padded batches — both
    production callers build arange < frames_valid), so valid_frames derives
    as mask.sum(-1) and attention rides the flash kernel on TPU."""
    valid_frames = None if padding_mask is None else jnp.sum(
        padding_mask.astype(jnp.int32), axis=-1)
    feats = extract_features(params, cfg, wav, padding_mask=padding_mask,
                             valid_samples=valid_samples, valid_frames=valid_frames,
                             dtype=dtype)
    return kmeans_assign(params, feats)


@functools.lru_cache(maxsize=8)
def _wav2units_compiled(cfg: HubertConfig, dtype):
    """Module-level jit cache: one executable per (cfg, dtype), shared across
    wav2units calls (a per-call jax.jit wrapper would recompile every file)."""
    return jax.jit(functools.partial(wav2units_jit, cfg=cfg, dtype=dtype))


def wav2units(params, cfg: HubertConfig, wav: np.ndarray, dtype=jnp.float32) -> np.ndarray:
    """Host-side entry: arbitrary-length mono 16 kHz wav -> unit id array.

    Chunks at cfg.max_chunk samples like HubertFeatureReader.get_feats
    (hubert_feature_reader.py:57-77): any tail covering the conv stack's
    receptive field yields its frames (the reference emits frames for every
    chunk the convs can consume — skipping only num_output_frames < 1 keeps
    token-count parity). Tail chunks are padded to a 1 s bucket with a frame
    padding_mask (same masking as the parity-tested batched extraction CLI),
    so the jit executable is reused across wav lengths instead of recompiling
    per file. Returns int64 numpy ids."""
    wav = np.asarray(wav, np.float32)
    if cfg.normalize:
        wav = (wav - wav.mean()) / np.sqrt(wav.var() + 1e-5)
    fn = _wav2units_compiled(cfg, dtype)
    bucket = cfg.sample_rate  # 1 s
    out = []
    for start in range(0, len(wav), cfg.max_chunk):
        chunk = wav[start : start + cfg.max_chunk]
        frames = num_output_frames(cfg, len(chunk))
        if frames < 1:
            continue   # shorter than the conv receptive field (~400 samples)
        if len(chunk) % bucket:
            padded = ((len(chunk) + bucket - 1) // bucket) * bucket
            mask = np.zeros((num_output_frames(cfg, padded),), bool)
            mask[:frames] = True
            true_len = len(chunk)
            chunk = np.pad(chunk, (0, padded - len(chunk)))
            ids = fn(params, wav=jnp.asarray(chunk[None]),
                     padding_mask=jnp.asarray(mask[None]),
                     valid_samples=jnp.asarray([true_len], jnp.int32))
            out.append(np.asarray(ids[0])[:frames])
        else:
            ids = fn(params, wav=jnp.asarray(chunk[None]))
            out.append(np.asarray(ids[0]))
    if not out:
        return np.zeros((0,), np.int64)
    return np.concatenate(out).astype(np.int64)
