"""Text -> HuBERT-semantic-token transformer (CoSingle / CoMix), TPU-native.

Re-implements covomix/covomix_model/text2semantic.py:403-1252:
  * non-causal source (text) encoder, depth 4, rotary positions (interleaved
    lucidrains convention, rotary_embedding_torch.py:36-49)
  * causal target (semantic) decoder with cross-attention (+learned null-KV),
    GEGLU feed-forward, weight-tied token embedding / logit projection
    (text2semantic.py:535-552)
  * autoregressive decode with per-layer KV cache, top-k + Gumbel sampling,
    EOS auto-set/stop, `mask_after_eos` cleanup (text2semantic.py:662-848)
  * CoMix two-stream decode (`two_output`): decoder hidden split in half, each
    half projected to its own logits -> two parallel token streams
    (text2semantic.py:754-832)
  * training forward with teacher forcing + CE (ignore pad), incl. dual-stream
    CE sum (text2semantic.py:851-1089)

TPU-first design decisions:
  * `generate` is ONE jitted `lax.while_loop` over a static max_length with a
    preallocated KV cache; rotary is absolute-position so cached keys are
    rotated once at write time (the reference re-rotates the whole cache every
    step, text2semantic.py:249-251)
  * cross-attention K/V over the source are computed once before the loop
    (the reference recomputes them every decode step)
  * classifier-free guidance folds the (cond, null-context) pair into the batch
    axis: one forward at 2B per step instead of two sequential decoder calls
    (text2semantic.py:780-792)
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from covomix_tpu.models import layers as L
from covomix_tpu.ops import sampling as S
from covomix_tpu.ops.flash_attention import attend_flash_or_xla


@dataclasses.dataclass(frozen=True)
class T2SConfig:
    dim: int = 512                    # encoder width
    source_depth: int = 4
    target_depth: int = 4
    dim_head: int = 64
    heads: int = 8
    ff_mult: int = 4
    num_text_tokens: int = 30528      # text vocab (without the auto EOS row)
    num_semantic_tokens: int = 501    # semantic vocab (without the auto EOS row)
    target_dim: int = 512             # decoder width (1024 for CoMix)
    two_output: bool = False          # CoMix dual-stream decode
    two_input: bool = False           # speechturn_refiner dual text streams
    no_source_transformer: bool = False
    text_pad_id: int = 0
    semantic_pad_id: int = -1
    cond_drop_prob: float = 0.0
    classifier_free_guidance: bool = False
    target_early_exit_layer: int = 0   # 0 = no early-exit head (speculative decoding)
    detach_early_exit_embed: bool = False

    @property
    def text_eos_id(self) -> int:
        return self.num_text_tokens

    @property
    def semantic_eos_id(self) -> int:
        return self.num_semantic_tokens

    @property
    def text_emb_dim(self) -> int:
        return self.dim // 2 if self.two_input else self.dim

    @property
    def sem_emb_dim(self) -> int:
        return self.target_dim // 2 if self.two_output else self.target_dim

    @property
    def ff_inner(self) -> int:
        # GEGLU inner dim = int(dim * mult * 2/3) (text2semantic.py:159-167)
        return int(self.dim * self.ff_mult * 2 / 3)

    @property
    def target_ff_inner(self) -> int:
        return int(self.target_dim * self.ff_mult * 2 / 3)


def _attn_init(key, dim, heads, dim_head, *, dim_context=None, null_kv=False):
    dim_context = dim_context or dim
    k1, k2, k3 = jax.random.split(key, 3)
    p = {
        "norm": L.rmsnorm_init(dim),
        "q": L.linear_init(k1, dim, heads * dim_head, bias=False),
        "kv": L.linear_init(k2, dim_context, heads * dim_head * 2, bias=False),
        "out": L.linear_init(k3, heads * dim_head, dim, bias=False),
    }
    if null_kv:
        p["null_kv"] = jax.random.normal(jax.random.fold_in(key, 7), (2, heads, 1, dim_head), jnp.float32)
    return p


def _ff_init(key, dim, inner):
    k1, k2 = jax.random.split(key)
    return {
        "norm": L.rmsnorm_init(dim),
        "w1": L.linear_init(k1, dim, inner * 2),
        "w2": L.linear_init(k2, inner, dim),
    }


def init(key, cfg: T2SConfig):
    keys = iter(jax.random.split(key, 8 + 3 * (cfg.source_depth + cfg.target_depth)))
    p = {
        "text_emb": L.embedding_init(next(keys), cfg.num_text_tokens + 1, cfg.text_emb_dim),
        "sem_emb": L.embedding_init(next(keys), cfg.num_semantic_tokens + 1, cfg.sem_emb_dim),
        "start_text": jax.random.normal(next(keys), (cfg.dim,), jnp.float32),
        "start_speech": jax.random.normal(next(keys), (cfg.target_dim,), jnp.float32),
        "source_final_norm": L.rmsnorm_init(cfg.dim),
        "target_final_norm": L.rmsnorm_init(cfg.target_dim),
    }
    if cfg.classifier_free_guidance:
        p["null_source_embedding"] = jnp.zeros((cfg.dim,), jnp.float32)
    if not cfg.no_source_transformer:
        p["source_layers"] = [
            {
                "self_attn": _attn_init(next(keys), cfg.dim, cfg.heads, cfg.dim_head),
                "ff": _ff_init(next(keys), cfg.dim, cfg.ff_inner),
            }
            for _ in range(cfg.source_depth)
        ]
    p["target_layers"] = [
        {
            "self_attn": _attn_init(next(keys), cfg.target_dim, cfg.heads, cfg.dim_head),
            "cross_attn": _attn_init(next(keys), cfg.target_dim, cfg.heads, cfg.dim_head, dim_context=cfg.dim, null_kv=True),
            "ff": _ff_init(next(keys), cfg.target_dim, cfg.target_ff_inner),
        }
        for _ in range(cfg.target_depth)
    ]
    if cfg.target_early_exit_layer > 0:
        # early-exit semantic head for speculative decoding (text2semantic.py:603-615):
        # Residual(FeedForward) -> RMSNorm -> Linear(V+1)
        k = next(keys)
        p["early_exit"] = {
            "ff": _ff_init(jax.random.fold_in(k, 0), cfg.target_dim, int(cfg.target_dim * 4 * 2 / 3)),
            "norm": L.rmsnorm_init(cfg.target_dim),
            "to_logits": L.linear_init(jax.random.fold_in(k, 1), cfg.target_dim, cfg.num_semantic_tokens + 1, bias=False),
        }
        if cfg.two_output:
            # CoMix extension (no reference counterpart — the reference's
            # early-exit CE vs a [B,T,2] target would not even run,
            # text2semantic.py:1037-1046): a second full-width head drafts
            # stream 2 so speculative decoding covers dual-stream dialogue.
            p["early_exit"]["to_logits2"] = L.linear_init(
                jax.random.fold_in(k, 2), cfg.target_dim, cfg.num_semantic_tokens + 1, bias=False)
    return p


def _ff(p, x):
    h = L.linear(p["w1"], L.rmsnorm(p["norm"], x))
    return L.linear(p["w2"], L.geglu(h))


def _self_attn_full(p, x, heads, *, mask=None, causal=False, rotary=True,
                    prefix_lens=None):
    """Full-sequence self-attention (training / encoder).

    `prefix_lens` ([B] int): when the key-padding mask is a PREFIX mask
    (right-padded batches — the collate contract, data_module.py:853), pass
    the per-row valid lengths instead of `mask` and the attention routes
    through the Pallas flash kernel on TPU (incl. causal; ops/
    flash_attention.py) — the T2S training hot path. An arbitrary bool
    `mask` keeps the XLA einsum path."""
    h = L.rmsnorm(p["norm"], x)
    q = L.split_heads(L.linear(p["q"], h), heads)
    k, v = jnp.split(L.linear(p["kv"], h), 2, axis=-1)
    k, v = L.split_heads(k, heads), L.split_heads(v, heads)
    if rotary:
        inv = L.rotary_freqs(q.shape[-1])
        pos = jnp.arange(x.shape[1])
        q, k = L.rotary_interleaved(pos, inv, q), L.rotary_interleaved(pos, inv, k)
    if prefix_lens is not None and mask is None:
        out = attend_flash_or_xla(q, k, v, valid_len=prefix_lens, causal=causal)
    else:
        out = L.attend(q, k, v, key_mask=mask, causal=causal)
    return L.linear(p["out"], L.merge_heads(out))


def _cross_attn(p, x, context_kv, heads, *, context_mask=None):
    """Cross-attention with prepended learned null-KV (text2semantic.py:253-260).
    context_kv: precomputed (k, v) [B,H,S,dh] WITHOUT the null slot."""
    h = L.rmsnorm(p["norm"], x)
    q = L.split_heads(L.linear(p["q"], h), heads)
    k, v = context_kv
    b = x.shape[0]
    nk = jnp.broadcast_to(p["null_kv"][0].astype(k.dtype), (b,) + p["null_kv"][0].shape)
    nv = jnp.broadcast_to(p["null_kv"][1].astype(v.dtype), (b,) + p["null_kv"][1].shape)
    k = jnp.concatenate([nk, k], axis=-2)
    v = jnp.concatenate([nv, v], axis=-2)
    if context_mask is not None:
        context_mask = jnp.concatenate([jnp.ones((b, 1), bool), context_mask], axis=-1)
    out = L.attend(q, k, v, key_mask=context_mask)
    return L.linear(p["out"], L.merge_heads(out))


def _context_kv(p_cross, context, heads):
    k, v = jnp.split(L.linear(p_cross["kv"], context), 2, axis=-1)
    return L.split_heads(k, heads), L.split_heads(v, heads)


def encode_source(params, cfg: T2SConfig, source_emb, source_mask, dtype=jnp.float32,
                  prefix_lens=None):
    """Source transformer (non-causal, rotary) + final RMSNorm
    (text2semantic.py:274-375, :556-570). `prefix_lens`: flash-kernel route
    for right-padded batches (see _self_attn_full)."""
    x = source_emb.astype(dtype)
    if cfg.no_source_transformer:
        return x  # empty_identity_encoder (text2semantic.py:385-400)
    mask = None if prefix_lens is not None else source_mask
    for lp in params["source_layers"]:
        x = _self_attn_full(lp["self_attn"], x, cfg.heads, mask=mask,
                            prefix_lens=prefix_lens) + x
        x = _ff(lp["ff"], x) + x
    return L.rmsnorm(params["source_final_norm"], x)


def embed_source(params, cfg: T2SConfig, source_ids, dtype=jnp.float32):
    """Token ids -> embeddings; two_input concatenates both streams' halves
    (text2semantic.py:730-736)."""
    ids = jnp.clip(source_ids, 0, cfg.num_text_tokens)
    if cfg.two_input:
        e1 = L.embedding(params["text_emb"], ids[..., 0], dtype)
        e2 = L.embedding(params["text_emb"], ids[..., 1], dtype)
        return jnp.concatenate([e1, e2], axis=-1)
    return L.embedding(params["text_emb"], ids, dtype)


def _embed_target(params, cfg: T2SConfig, t1, t2, dtype):
    e = L.embedding(params["sem_emb"], jnp.clip(t1, 0, cfg.num_semantic_tokens), dtype)
    if cfg.two_output:
        e2 = L.embedding(params["sem_emb"], jnp.clip(t2, 0, cfg.num_semantic_tokens), dtype)
        e = jnp.concatenate([e, e2], axis=-1)
    return e


def _sem_logits(params, h, dtype):
    """Weight-tied logits: h @ emb.T (text2semantic.py:535-545); includes the EOS row."""
    return (h @ params["sem_emb"]["w"].astype(dtype).T).astype(jnp.float32)


# ---------------------------------------------------------------------------
# training forward (text2semantic.py:851-1089)


def forward_loss(
    params,
    cfg: T2SConfig,
    source_ids: Optional[jnp.ndarray],   # [B, S] or [B, S, 2] (two_input); None with source_emb
    target_ids: jnp.ndarray,     # [B, T] or [B, T, 2] (two_output); pad = collate pad (501)
    *,
    key=None,
    source_mask: Optional[jnp.ndarray] = None,
    source_emb: Optional[jnp.ndarray] = None,  # precomputed text embeddings [B, S, dim]
    cond_drop: bool = False,
    dtype=jnp.float32,
    return_logits: bool = False,
):
    """Teacher-forced CE. Targets arrive padded with the collate pad value 501
    (data_module.py:853); semantic_pad_id=-1 means every position counts in the
    CE, matching the reference (ignore_index=-1 never fires).

    `source_emb` supports the frozen-external-text-encoder path (the
    reference's bert_init_emb/t5_init_emb collate option, data_module.py:
    918-930 + text2semantic.py:880-883): embeddings computed offline (or by
    any encoder) are fed directly with an explicit `source_mask`."""
    # a caller-supplied source_mask may be arbitrary; only masks this function
    # derives from right-padded ids are provably prefix masks (flash-eligible)
    mask_is_prefix = source_mask is None and source_emb is None
    if source_emb is not None:
        assert source_mask is not None, "precomputed source_emb requires source_mask"
        source_ids = None
    elif cfg.two_input:
        s1 = S.set_eos_id(source_ids[..., 0], cfg.text_eos_id, cfg.text_pad_id)
        s2 = S.set_eos_id(source_ids[..., 1], cfg.text_eos_id, cfg.text_pad_id)
        source_ids = jnp.stack([s1, s2], axis=-1)
        if source_mask is None:
            source_mask = s1 != cfg.text_pad_id
    else:
        source_ids = S.set_eos_id(source_ids, cfg.text_eos_id, cfg.text_pad_id)
        if source_mask is None:
            source_mask = source_ids != cfg.text_pad_id

    # auto EOS on target (text2semantic.py:921-926)
    if cfg.two_output:
        t1 = S.set_eos_id(target_ids[..., 0], cfg.semantic_eos_id, cfg.semantic_pad_id)
        t2 = S.set_eos_id(target_ids[..., 1], cfg.semantic_eos_id, cfg.semantic_pad_id)
    else:
        t1 = S.set_eos_id(target_ids if target_ids.ndim == 2 else target_ids[..., 0], cfg.semantic_eos_id, cfg.semantic_pad_id)
        t2 = t1

    target_mask = t1 != cfg.semantic_pad_id
    # attend to BOS (text2semantic.py:934-938). Batches are right-padded (the
    # collate contract, data_module.py:853), so the pad masks are PREFIX
    # masks; expressing them as per-row valid lengths keeps the decoder's
    # causal self-attention on the Pallas flash kernel on TPU instead of the
    # masked-einsum fallback (the T2S training hot path — 22% of step time at
    # the CoMix recipe shape before this, NOTES_r4.md).
    dec_lens = 1 + jnp.sum(target_mask, axis=-1, dtype=jnp.int32)
    src_lens = (jnp.sum(source_mask, axis=-1, dtype=jnp.int32)
                if mask_is_prefix else None)

    if source_emb is None:
        source_emb = embed_source(params, cfg, source_ids, dtype)
    context = encode_source(params, cfg, source_emb, source_mask, dtype,
                            prefix_lens=src_lens)

    context_mask = source_mask
    if cfg.classifier_free_guidance and cond_drop and key is not None:
        drop = jax.random.uniform(key, (context.shape[0],)) < cfg.cond_drop_prob
        context = jnp.where(drop[:, None, None], params["null_source_embedding"].astype(dtype)[None, None, :], context)

    start = jnp.broadcast_to(params["start_speech"].astype(dtype), (t1.shape[0], 1, cfg.target_dim))
    tgt_in = jnp.concatenate([start, _embed_target(params, cfg, t1, t2, dtype)], axis=1)

    x = tgt_in
    hiddens = []
    for lp in params["target_layers"]:
        x = _self_attn_full(lp["self_attn"], x, cfg.heads, causal=True,
                            prefix_lens=dec_lens) + x
        ckv = _context_kv(lp["cross_attn"], context, cfg.heads)
        x = _cross_attn(lp["cross_attn"], x, ckv, cfg.heads, context_mask=context_mask) + x
        x = _ff(lp["ff"], x) + x
        hiddens.append(x)
    x = L.rmsnorm(params["target_final_norm"], x)

    def ce(logits, tgt):
        # decoder input is [BOS ‖ targets-with-EOS], so logits cover one
        # position past the last target; drop it, leaving logits[:, i]
        # predicting tgt[:, i] (the standard one-step shift)
        logits = logits[:, :-1]
        valid = tgt != cfg.semantic_pad_id
        tgt_c = jnp.clip(tgt, 0, cfg.num_semantic_tokens)
        logp = jax.nn.log_softmax(logits, axis=-1)
        nll = -jnp.take_along_axis(logp, tgt_c[..., None], axis=-1)[..., 0]
        nll = jnp.where(valid, nll, 0.0)
        return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)

    if cfg.two_output:
        half = cfg.target_dim // 2
        logits1 = _sem_logits(params, x[..., :half], dtype)
        logits2 = _sem_logits(params, x[..., half:], dtype)
        loss = ce(logits1, t1) + ce(logits2, t2)
    else:
        logits = _sem_logits(params, x, dtype)
        loss = ce(logits, t1)

    # early-exit head CE for speculative decoding (text2semantic.py:1026-1046)
    if cfg.target_early_exit_layer > 0 and "early_exit" in params:
        early = hiddens[cfg.target_early_exit_layer - 1]
        if cfg.detach_early_exit_embed:
            early = jax.lax.stop_gradient(early)
        ee = params["early_exit"]
        h = early + _ff(ee["ff"], early)
        hn = L.rmsnorm(ee["norm"], h)
        ee_logits = L.linear(ee["to_logits"], hn).astype(jnp.float32)
        loss = loss + ce(ee_logits, t1)
        if cfg.two_output and "to_logits2" in ee:
            # train the stream-2 draft head too (framework extension; the
            # reference's single-head CE is stream-1-only and would crash on
            # a two-stream target, text2semantic.py:1037-1046)
            loss = loss + ce(L.linear(ee["to_logits2"], hn).astype(jnp.float32), t2)

    if return_logits:
        if cfg.two_output:
            return loss, (logits1, logits2)
        return loss, logits
    return loss


# ---------------------------------------------------------------------------
# autoregressive decode (text2semantic.py:662-848)


class GenerateResult(NamedTuple):
    tokens: jnp.ndarray        # [B, L] stream-1 tokens, pad-filled after EOS
    tokens2: jnp.ndarray       # [B, L] stream-2 (== tokens when not two_output)
    lengths: jnp.ndarray       # [B] number of decoded positions (incl. EOS)
    lengths2: jnp.ndarray
    num_steps: jnp.ndarray     # scalar: decode iterations executed


def generate(
    params,
    cfg: T2SConfig,
    key,
    source_ids: Optional[jnp.ndarray],   # [B, S] (or [B, S, 2] two_input); None with source_emb
    *,
    max_length: int = 2048,
    temperature: float = 1.0,
    top_k_thres: float = 0.1,
    cond_scale: float = 1.0,
    min_length: int = 0,
    no_repeat_ngram_size: int = 0,
    source_emb: Optional[jnp.ndarray] = None,
    source_mask: Optional[jnp.ndarray] = None,
    dtype=jnp.float32,
) -> GenerateResult:
    """Jit-compatible greedy/top-k AR decode with static max_length.

    Faithful to TextToSemantic.generate (text2semantic.py:749-826): per step ->
    logits of the last position -> top-k filter (k=ceil(0.1*vocab)) -> Gumbel
    sample; stop when every row has emitted EOS (two_output: when either stream
    has); after stopping, positions after EOS become pad via mask_after_eos.
    The pad fill value is semantic_pad_id (-1), which the pipeline strips.

    `min_length` masks the EOS logit for the first min_length steps (serving
    min-duration control; also makes benchmarks decode full-length honestly —
    the reference has no equivalent, its decode always may stop early)."""
    b = (source_ids if source_emb is None else source_emb).shape[0]
    heads, depth, dh = cfg.heads, cfg.target_depth, cfg.dim_head
    eos = cfg.semantic_eos_id
    pad = cfg.semantic_pad_id

    # ---- encode source once
    if source_emb is not None:
        assert source_mask is not None, "precomputed source_emb requires source_mask"
    else:
        if cfg.two_input:
            s1 = S.set_eos_id(source_ids[..., 0], cfg.text_eos_id, cfg.text_pad_id)
            s2 = S.set_eos_id(source_ids[..., 1], cfg.text_eos_id, cfg.text_pad_id)
            source_ids = jnp.stack([s1, s2], axis=-1)
            src_flat = s1
        else:
            source_ids = S.set_eos_id(source_ids, cfg.text_eos_id, cfg.text_pad_id)
            src_flat = source_ids
        source_mask = src_flat != cfg.text_pad_id
        source_emb = embed_source(params, cfg, source_ids, dtype)
    context = encode_source(params, cfg, source_emb, source_mask, dtype)

    use_cfg = cond_scale > 1.0
    if use_cfg:
        # fold the null-context branch into the batch (text2semantic.py:780-792)
        context = jnp.concatenate([context, context], axis=0)
        source_mask_all = jnp.concatenate([source_mask, jnp.zeros_like(source_mask)], axis=0)
        bb = 2 * b
    else:
        source_mask_all = source_mask
        bb = b

    # precompute cross-attention K/V per layer (constant across decode steps)
    cross_kvs = [_context_kv(lp["cross_attn"], context, heads) for lp in params["target_layers"]]

    inv = L.rotary_freqs(dh)

    # per-layer cache tuples (NOT one stacked [depth, ...] array): a stacked
    # cache forces a jnp.stack per decode step — a full-cache copy inside the
    # while_loop (~67 MB/step at the serving shape); tuple entries are
    # loop-carried leaves XLA updates in place via dynamic_update_slice
    cache_k = tuple(jnp.zeros((bb, heads, max_length, dh), dtype) for _ in range(depth))
    cache_v = tuple(jnp.zeros((bb, heads, max_length, dh), dtype) for _ in range(depth))
    tokens1 = jnp.full((b, max_length), pad, jnp.int32)
    tokens2 = jnp.full((b, max_length), pad, jnp.int32)
    done1 = jnp.zeros((b,), bool)
    done2 = jnp.zeros((b,), bool)

    def decode_step(i, tok1_prev, tok2_prev, cache_k, cache_v):
        """One decoder forward for the token at position i. Returns logits + new cache."""
        is_start = i == 0
        e = _embed_target(params, cfg, tok1_prev, tok2_prev, dtype)  # [b, tdim]
        x = jnp.where(is_start, params["start_speech"].astype(dtype)[None, :], e)
        if use_cfg:
            x = jnp.concatenate([x, x], axis=0)
        x = x[:, None, :]  # [bb, 1, tdim]
        pos = jnp.full((1,), i)
        kmask = (jnp.arange(max_length)[None, :] <= i) & jnp.ones((bb, 1), bool)
        new_ck, new_cv = [], []
        for li, lp in enumerate(params["target_layers"]):
            sa = lp["self_attn"]
            h = L.rmsnorm(sa["norm"], x)
            q = L.split_heads(L.linear(sa["q"], h), heads)
            k_new, v_new = jnp.split(L.linear(sa["kv"], h), 2, axis=-1)
            k_new, v_new = L.split_heads(k_new, heads), L.split_heads(v_new, heads)
            q = L.rotary_interleaved(pos, inv, q)
            k_new = L.rotary_interleaved(pos, inv, k_new)
            ck = jax.lax.dynamic_update_slice(cache_k[li], k_new, (0, 0, i, 0))
            cv = jax.lax.dynamic_update_slice(cache_v[li], v_new, (0, 0, i, 0))
            new_ck.append(ck)
            new_cv.append(cv)
            att = L.attend(q, ck, cv, key_mask=kmask)
            x = L.linear(sa["out"], L.merge_heads(att)) + x
            x = _cross_attn(lp["cross_attn"], x, cross_kvs[li], heads, context_mask=source_mask_all) + x
            x = _ff(lp["ff"], x) + x
        x = L.rmsnorm(params["target_final_norm"], x)[:, 0]  # [bb, tdim]
        return x, tuple(new_ck), tuple(new_cv)

    def head_logits(h):
        if cfg.two_output:
            half = cfg.target_dim // 2
            return _sem_logits(params, h[..., :half], dtype), _sem_logits(params, h[..., half:], dtype)
        lg = _sem_logits(params, h, dtype)
        return lg, lg

    def cond(state):
        i, _, _, _, _, done1, done2, _ = state
        if cfg.two_output:
            stop = jnp.all(done1) | jnp.all(done2)
        else:
            stop = jnp.all(done1)
        return (i < max_length) & ~stop

    def body(state):
        i, tokens1, tokens2, cache_k, cache_v, done1, done2, key = state
        key, k1, k2 = jax.random.split(key, 3)
        prev1 = tokens1[:, jnp.maximum(i - 1, 0)]
        prev2 = tokens2[:, jnp.maximum(i - 1, 0)]
        h, cache_k, cache_v = decode_step(i, prev1, prev2, cache_k, cache_v)
        lg1, lg2 = head_logits(h)
        if use_cfg:
            c1, n1 = lg1[:b], lg1[b:]
            lg1 = n1 + (c1 - n1) * cond_scale
            c2, n2 = lg2[:b], lg2[b:]
            lg2 = n2 + (c2 - n2) * cond_scale
        if min_length > 0:
            eos_mask = (jnp.arange(lg1.shape[-1]) == eos) & (i < min_length)
            lg1 = jnp.where(eos_mask[None, :], S.NEG_INF, lg1)
            lg2 = jnp.where(eos_mask[None, :], S.NEG_INF, lg2)
        if no_repeat_ngram_size > 0:
            # fairseq ngram_repeat_block capability (see ops/sampling.py) —
            # serving-side degeneracy control, no reference CLI equivalent
            lg1 = S.ban_repeated_ngrams(lg1, tokens1, i, no_repeat_ngram_size)
            if cfg.two_output:
                lg2 = S.ban_repeated_ngrams(lg2, tokens2, i, no_repeat_ngram_size)
        s1 = S.gumbel_sample(k1, S.top_k_filter(lg1, thres=top_k_thres), temperature).astype(jnp.int32)
        tokens1 = jax.lax.dynamic_update_slice(tokens1, s1[:, None], (0, i))
        done1 = done1 | (s1 == eos)
        if cfg.two_output:
            s2 = S.gumbel_sample(k2, S.top_k_filter(lg2, thres=top_k_thres), temperature).astype(jnp.int32)
            tokens2 = jax.lax.dynamic_update_slice(tokens2, s2[:, None], (0, i))
            done2 = done2 | (s2 == eos)
        else:
            tokens2 = tokens1
            done2 = done1
        return (i + 1, tokens1, tokens2, cache_k, cache_v, done1, done2, key)

    state = (jnp.int32(0), tokens1, tokens2, cache_k, cache_v, done1, done2, key)
    i, tokens1, tokens2, _, _, done1, done2, _ = jax.lax.while_loop(cond, body, state)

    # invalidate never-written tail positions, then pad-after-EOS
    valid = jnp.arange(max_length)[None, :] < i
    tokens1 = jnp.where(valid, tokens1, pad)
    tokens2 = jnp.where(valid, tokens2, pad)
    stopped = jnp.all(done1) | (jnp.all(done2) if cfg.two_output else False)
    # reference only masks after EOS when the loop broke (text2semantic.py:814-826)
    m1 = S.mask_after_eos(tokens1, eos, pad)
    m2 = S.mask_after_eos(tokens2, eos, pad)
    tokens1 = jnp.where(stopped, m1, tokens1)
    tokens2 = jnp.where(stopped, m2, tokens2)
    len1 = jnp.sum(tokens1 != pad, axis=-1)
    len2 = jnp.sum(tokens2 != pad, axis=-1)
    return GenerateResult(tokens1, tokens2, len1, len2, i)


# ---------------------------------------------------------------------------
# self-speculative decoding via the early-exit head
#
# The reference trains an early-exit semantic head "for speculative decoding,
# to speed up text-to-speech decoding" (text2semantic.py:600-615) but ships no
# decode loop for it. This is that loop, TPU-native: draft gamma tokens with
# decoder layers 1..E + the early-exit head (cheap), then verify all drafts in
# ONE full-depth forward over gamma+1 positions; accept the longest matching
# prefix plus the full model's bonus token. Greedy-lossless: the output is
# IDENTICAL to greedy full-model decoding, only faster when the draft agrees.


def _rotary_at(positions_b, inv_freq, t):
    """Per-row rotary: positions_b [B], t [B, H, 1, dh] (one query per row)."""
    freqs = positions_b[:, None].astype(jnp.float32) * inv_freq[None, :]  # [B, dh/2]
    freqs = jnp.repeat(freqs, 2, axis=-1)[:, None, None, :]               # [B,1,1,dh]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    shape = t.shape
    tp = t.reshape(shape[:-1] + (shape[-1] // 2, 2))
    rot = jnp.stack([-tp[..., 1], tp[..., 0]], axis=-1).reshape(shape)
    return (t * cos.astype(t.dtype) + rot * sin.astype(t.dtype)).astype(t.dtype)


def _rotary_at_span(start_b, inv_freq, t):
    """Per-row rotary over a span: start_b [B], t [B, H, S, dh] at absolute
    positions start_b + [0..S)."""
    s = t.shape[-2]
    pos = start_b[:, None] + jnp.arange(s)[None, :]                       # [B, S]
    freqs = pos[..., None].astype(jnp.float32) * inv_freq[None, None, :]  # [B,S,dh/2]
    freqs = jnp.repeat(freqs, 2, axis=-1)[:, None, :, :]                  # [B,1,S,dh]
    cos, sin = jnp.cos(freqs), jnp.sin(freqs)
    shape = t.shape
    tp = t.reshape(shape[:-1] + (shape[-1] // 2, 2))
    rot = jnp.stack([-tp[..., 1], tp[..., 0]], axis=-1).reshape(shape)
    return (t * cos.astype(t.dtype) + rot * sin.astype(t.dtype)).astype(t.dtype)


def _write_cache_at(cache, new, offsets):
    """cache [B,H,L,dh]; new [B,H,S,dh]; offsets [B] -> per-row dynamic write."""
    return jax.vmap(lambda c, n, o: jax.lax.dynamic_update_slice(c, n, (0, o, 0)))(cache, new, offsets)


def generate_speculative(
    params,
    cfg: T2SConfig,
    source_ids: jnp.ndarray,   # [B, S]
    *,
    max_length: int = 2048,
    gamma: int = 4,
    dtype=jnp.float32,
) -> GenerateResult:
    """Greedy speculative decode via the early-exit head (single-stream AND
    CoMix two_output dual-stream).

    Requires cfg.target_early_exit_layer > 0 and params['early_exit'] (plus
    its 'to_logits2' second draft head for two_output — a framework extension;
    reference checkpoints carry only the stream-1 head, text2semantic.py:
    603-615). Output equals greedy `generate` exactly: argmax drafts from
    decoder layers 1..E + the early-exit head, ONE full-depth forward verifies
    all gamma drafts, the longest matching prefix plus the full model's bonus
    token is accepted. For two_output, both streams draft from the shared
    early trunk and a position is accepted only when BOTH streams match
    (joint-lossless — stream 2's continuation depends on stream 1's tokens
    through the concatenated embedding, so per-stream acceptance would not be
    exact). Throughput gain scales with draft acceptance, i.e. with how well
    the early-exit head was trained (detach_early_exit_embed etc.)."""
    assert not cfg.two_input, "speculative decode: two_input not supported"
    assert cfg.target_early_exit_layer > 0 and "early_exit" in params, "needs the early-exit head"
    two = cfg.two_output
    if two:
        assert "to_logits2" in params["early_exit"], \
            "two_output speculative decode needs the stream-2 draft head " \
            "(train with this framework; reference checkpoints carry only stream 1)"
    b = source_ids.shape[0]
    heads, depth, dh = cfg.heads, cfg.target_depth, cfg.dim_head
    early = cfg.target_early_exit_layer
    eos, pad = cfg.semantic_eos_id, cfg.semantic_pad_id
    CL = max_length + gamma + 2  # cache length incl. margin for in-flight drafts

    src = S.set_eos_id(source_ids, cfg.text_eos_id, cfg.text_pad_id)
    source_mask = src != cfg.text_pad_id
    context = encode_source(params, cfg, embed_source(params, cfg, src, dtype), source_mask, dtype)
    cross_kvs = [_context_kv(lp["cross_attn"], context, heads) for lp in params["target_layers"]]
    inv = L.rotary_freqs(dh)

    # per-layer cache tuples — same rationale as `generate`: a stacked
    # [depth, ...] cache costs a full-stack copy per .at[li].set inside the
    # loop; tuple leaves alias in place
    cache_k = tuple(jnp.zeros((b, heads, CL, dh), dtype) for _ in range(depth))
    cache_v = tuple(jnp.zeros((b, heads, CL, dh), dtype) for _ in range(depth))
    tokens1 = jnp.full((b, CL), pad, jnp.int32)
    tokens2 = jnp.full((b, CL), pad, jnp.int32)
    lens = jnp.zeros((b,), jnp.int32)      # positions accepted per row
    done1 = jnp.zeros((b,), bool)          # stream EOS flags (EOS-only, like generate)
    done2 = jnp.zeros((b,), bool)
    # first-EOS position per row/stream (CL = "none yet"); needed to
    # reconstruct generate's GLOBAL stop step I = min over streams of
    # (max over rows of first-EOS) + 1 — rows that never EOS'd by I are
    # truncated there, exactly like the global while_loop does.
    p1 = jnp.full((b,), CL, jnp.int32)
    p2 = jnp.full((b,), CL, jnp.int32)

    pos_idx = jnp.arange(CL)

    def layer_step_single(lp, x, ck, cv, pos_b):
        """One decoder layer for a single per-row position. x [B,1,D]."""
        h = L.rmsnorm(lp["self_attn"]["norm"], x)
        q = L.split_heads(L.linear(lp["self_attn"]["q"], h), heads)
        k_new, v_new = jnp.split(L.linear(lp["self_attn"]["kv"], h), 2, axis=-1)
        k_new, v_new = L.split_heads(k_new, heads), L.split_heads(v_new, heads)
        q = _rotary_at(pos_b, inv, q)
        k_new = _rotary_at(pos_b, inv, k_new)
        ck = _write_cache_at(ck, k_new, pos_b)
        cv = _write_cache_at(cv, v_new, pos_b)
        kmask = pos_idx[None, :] <= pos_b[:, None]
        att = L.attend(q, ck, cv, key_mask=kmask)
        return L.linear(lp["self_attn"]["out"], L.merge_heads(att)) + x, ck, cv

    def draft_one(prev1, prev2, pos_b, cache_k, cache_v):
        """Draft layers 1..E + early-exit head(s). Returns (tok1, tok2, caches)."""
        e = _embed_target(params, cfg, prev1, prev2, dtype)  # [b, tdim]
        x = jnp.where((pos_b == 0)[:, None], params["start_speech"].astype(dtype)[None, :], e)[:, None, :]
        new_k, new_v = list(cache_k), list(cache_v)
        for li in range(early):
            lp = params["target_layers"][li]
            x, ck, cv = layer_step_single(lp, x, new_k[li], new_v[li], pos_b)
            new_k[li] = ck
            new_v[li] = cv
            x = _cross_attn(lp["cross_attn"], x, cross_kvs[li], heads, context_mask=source_mask) + x
            x = _ff(lp["ff"], x) + x
        ee = params["early_exit"]
        hn = L.rmsnorm(ee["norm"], x + _ff(ee["ff"], x))
        l1 = L.linear(ee["to_logits"], hn).astype(jnp.float32)[:, 0]
        t1 = jnp.argmax(l1, axis=-1).astype(jnp.int32)
        if two:
            l2 = L.linear(ee["to_logits2"], hn).astype(jnp.float32)[:, 0]
            t2 = jnp.argmax(l2, axis=-1).astype(jnp.int32)
        else:
            t2 = t1
        return t1, t2, tuple(new_k), tuple(new_v)

    def verify(drafts1, drafts2, lens, tokens1, tokens2, cache_k, cache_v):
        """Full-depth forward over gamma+1 per-row positions lens..lens+gamma.
        Input tokens at those positions: [token[lens-1], drafts...]."""
        span = gamma + 1
        prev_hot = (pos_idx[None, :] == jnp.maximum(lens - 1, 0)[:, None]).astype(jnp.int32)
        prev1 = jnp.sum(tokens1 * prev_hot, axis=1)
        prev2 = jnp.sum(tokens2 * prev_hot, axis=1)
        in1 = jnp.concatenate([prev1[:, None], drafts1], axis=1)  # [B, span]
        in2 = jnp.concatenate([prev2[:, None], drafts2], axis=1)
        e = _embed_target(params, cfg, in1, in2, dtype)           # [B, span, tdim]
        start = jnp.broadcast_to(params["start_speech"].astype(dtype), (b, cfg.target_dim))
        e = e.at[:, 0].set(jnp.where((lens == 0)[:, None], start, e[:, 0]))
        x = e
        new_k, new_v = list(cache_k), list(cache_v)
        for li, lp in enumerate(params["target_layers"]):
            h = L.rmsnorm(lp["self_attn"]["norm"], x)
            q = L.split_heads(L.linear(lp["self_attn"]["q"], h), heads)
            k_new, v_new = jnp.split(L.linear(lp["self_attn"]["kv"], h), 2, axis=-1)
            k_new, v_new = L.split_heads(k_new, heads), L.split_heads(v_new, heads)
            q = _rotary_at_span(lens, inv, q)
            k_new = _rotary_at_span(lens, inv, k_new)
            ck = _write_cache_at(new_k[li], k_new, lens)
            cv = _write_cache_at(new_v[li], v_new, lens)
            new_k[li] = ck
            new_v[li] = cv
            # causal over the cache: query at lens+j sees keys <= lens+j
            qpos = lens[:, None] + jnp.arange(span)[None, :]               # [B, span]
            kmask = pos_idx[None, None, :] <= qpos[:, :, None]             # [B, span, L]
            sim = jnp.einsum("bhid,bhjd->bhij", q, ck, preferred_element_type=jnp.float32) * (dh ** -0.5)
            sim = jnp.where(kmask[:, None], sim, -jnp.inf)
            att = jax.nn.softmax(sim, axis=-1)
            att = jnp.where(jnp.isnan(att), 0.0, att)
            o = jnp.einsum("bhij,bhjd->bhid", att.astype(cv.dtype), cv)
            x = L.linear(lp["self_attn"]["out"], L.merge_heads(o)) + x
            x = _cross_attn(lp["cross_attn"], x, cross_kvs[li], heads, context_mask=source_mask) + x
            x = _ff(lp["ff"], x) + x
        x = L.rmsnorm(params["target_final_norm"], x)
        if two:
            half = cfg.target_dim // 2
            f1 = jnp.argmax(_sem_logits(params, x[..., :half], dtype), axis=-1).astype(jnp.int32)
            f2 = jnp.argmax(_sem_logits(params, x[..., half:], dtype), axis=-1).astype(jnp.int32)
        else:
            f1 = jnp.argmax(_sem_logits(params, x, dtype), axis=-1).astype(jnp.int32)
            f2 = f1
        return f1, f2, tuple(new_k), tuple(new_v)  # greedy full-model tokens [B, span]

    def cond_fn(state):
        _, _, lens, done1, done2, _, _, _, _, it = state
        # a row is live until BOTH its streams EOS'd (generate keeps decoding
        # both streams until the GLOBAL stop; the global truncation at I is
        # reconstructed after the loop)
        active = ~(done1 & done2) & (lens < max_length)
        return jnp.any(active) & (it < max_length)

    span_idx = jnp.arange(gamma + 1)

    def body_fn(state):
        tokens1, tokens2, lens, done1, done2, p1, p2, cache_k, cache_v, it = state
        # ---- draft gamma token (pairs) sequentially with the early model
        drafts1 = jnp.zeros((b, gamma), jnp.int32)
        drafts2 = jnp.zeros((b, gamma), jnp.int32)
        dk, dv = cache_k, cache_v
        # prev token via one-hot reduce (per-row gathers lower to scatter/
        # gather ops that stall on this stack; [B, CL] compare+sum is cheap)
        prev_hot = (pos_idx[None, :] == jnp.maximum(lens - 1, 0)[:, None]).astype(jnp.int32)
        prev1 = jnp.sum(tokens1 * prev_hot, axis=1)
        prev2 = jnp.sum(tokens2 * prev_hot, axis=1)
        for j in range(gamma):
            t1_j, t2_j, dk, dv = draft_one(prev1, prev2, lens + j, dk, dv)
            drafts1 = drafts1.at[:, j].set(t1_j)
            drafts2 = drafts2.at[:, j].set(t2_j)
            prev1, prev2 = t1_j, t2_j
        # ---- verify with the full model (overwrites layer caches cleanly)
        full1, full2, cache_k, cache_v = verify(
            drafts1, drafts2, lens, tokens1, tokens2, cache_k, cache_v)
        # ---- accept longest JOINTLY matching prefix + bonus pair
        match = drafts1 == full1[:, :gamma]
        if two:
            match = match & (drafts2 == full2[:, :gamma])
        n_acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [B]
        active = ~(done1 & done2) & (lens < max_length)
        take = span_idx[None, :] <= n_acc[:, None]                          # [B, gamma+1]
        take = take & active[:, None]
        bonus_hot = span_idx[None, :] == n_acc[:, None]                     # [B, gamma+1]
        rel = pos_idx[None, :] - lens[:, None]                              # [B, CL]

        def write_stream(tokens, drafts, full):
            bonus = jnp.sum(full * bonus_hot, axis=1)                       # [B]
            out_span = jnp.concatenate([drafts, jnp.zeros((b, 1), jnp.int32)], axis=1)
            out_span = jnp.where(bonus_hot, bonus[:, None], out_span)       # [B, gamma+1]
            # scatter accepted span into the token buffer via masked select
            # (positions lens..lens+n_acc); untaken slots keep old values so
            # first_eos only ever sees take-masked entries
            scattered = jnp.zeros_like(tokens)
            for s in range(gamma + 1):
                scattered = scattered + jnp.where(rel == s, out_span[:, s:s + 1], 0)
            inspan = (rel >= 0) & (rel <= n_acc[:, None]) & active[:, None]
            tokens = jnp.where(inspan, scattered, tokens)
            return tokens, out_span

        tokens1, span1 = write_stream(tokens1, drafts1, full1)
        if two:
            tokens2, span2 = write_stream(tokens2, drafts2, full2)
        else:
            tokens2, span2 = tokens1, span1

        def first_eos(span, done, p):
            hit = (span == eos) & take                                       # [B, gamma+1]
            any_hit = jnp.any(hit, axis=1) & ~done
            first = jnp.argmax(hit, axis=1).astype(jnp.int32)                # first True
            return done | jnp.any(hit, axis=1), jnp.where(any_hit, lens + first, p)

        done1, p1 = first_eos(span1, done1, p1)
        done2, p2 = (first_eos(span2, done2, p2) if two else (done1, p1))
        lens = jnp.minimum(lens + jnp.where(active, n_acc + 1, 0), max_length)
        return (tokens1, tokens2, lens, done1, done2, p1, p2, cache_k, cache_v, it + 1)

    state = (tokens1, tokens2, lens, done1, done2, p1, p2, cache_k, cache_v, jnp.int32(0))
    tokens1, tokens2, lens, done1, done2, p1, p2, _, _, iters = \
        jax.lax.while_loop(cond_fn, body_fn, state)

    # reconstruct generate's global stop: it halts after the step where ALL
    # rows EOS'd on stream 1 OR all rows EOS'd on stream 2, so positions
    # >= I = min(max_r p1, max_r p2) + 1 were never decoded there
    i1 = jnp.where(jnp.all(done1), jnp.max(p1) + 1, max_length)
    i2 = jnp.where(jnp.all(done2), jnp.max(p2) + 1, max_length) if two else i1
    stop_i = jnp.minimum(jnp.minimum(i1, i2), max_length)
    valid = pos_idx[None, :] < stop_i
    tokens1 = jnp.where(valid, tokens1, pad)[:, :max_length]
    tokens2 = jnp.where(valid, tokens2, pad)[:, :max_length]
    stopped = jnp.all(done1) | (jnp.all(done2) if two else False)
    # generate only masks after EOS when the loop broke (text2semantic.py:814-826)
    tokens1 = jnp.where(stopped, S.mask_after_eos(tokens1, eos, pad), tokens1)
    tokens2 = jnp.where(stopped, S.mask_after_eos(tokens2, eos, pad), tokens2)
    len1 = jnp.sum(tokens1 != pad, axis=-1)
    len2 = jnp.sum(tokens2 != pad, axis=-1)
    return GenerateResult(tokens1, tokens2, len1, len2, iters)


# ---------------------------------------------------------------------------
# auxiliary training wrappers (text2semantic.py:1108-1201)


def semantic_to_text_loss(params, cfg: T2SConfig, semantic_ids, text_ids, *, dtype=jnp.float32):
    """Backtranslation task (SemanticToTextWrapper, text2semantic.py:1175-1201):
    source = speech tokens through the SPEECH embedding + encoder, target = text
    through the text embedding/decoder/logits (weight-tied). Requires
    target_dim == dim (the reference default when target_transformer_dim is None)."""
    assert cfg.target_dim == cfg.dim, "s2t decoding shares the decoder; set target_dim == dim"
    assert not cfg.two_output and not cfg.two_input

    src = S.set_eos_id(semantic_ids, cfg.semantic_eos_id, cfg.semantic_pad_id)
    source_mask = src != cfg.semantic_pad_id
    source_emb = L.embedding(params["sem_emb"], jnp.clip(src, 0, cfg.num_semantic_tokens), dtype)
    context = encode_source(params, cfg, source_emb, source_mask, dtype)

    tgt = S.set_eos_id(text_ids, cfg.text_eos_id, cfg.text_pad_id)
    tgt_mask = tgt != cfg.text_pad_id
    dec_mask = jnp.concatenate([jnp.ones((tgt.shape[0], 1), bool), tgt_mask], axis=-1)
    start = jnp.broadcast_to(params["start_text"].astype(dtype), (tgt.shape[0], 1, cfg.dim))
    x = jnp.concatenate([start, L.embedding(params["text_emb"], jnp.clip(tgt, 0, cfg.num_text_tokens), dtype)], axis=1)
    for lp in params["target_layers"]:
        x = _self_attn_full(lp["self_attn"], x, cfg.heads, mask=dec_mask, causal=True) + x
        ckv = _context_kv(lp["cross_attn"], context, cfg.heads)
        x = _cross_attn(lp["cross_attn"], x, ckv, cfg.heads, context_mask=source_mask) + x
        x = _ff(lp["ff"], x) + x
    x = L.rmsnorm(params["target_final_norm"], x)
    logits = (x @ params["text_emb"]["w"].astype(dtype).T).astype(jnp.float32)[:, :-1]
    valid = tgt != cfg.text_pad_id
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, jnp.clip(tgt, 0, cfg.num_text_tokens)[..., None], axis=-1)[..., 0]
    nll = jnp.where(valid, nll, 0.0)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(valid), 1)


def speech_speech_pretrain_loss(params, cfg: T2SConfig, key, semantic_ids, *, deletion_prob: float = 0.6, dtype=jnp.float32):
    """Denoising pretraining (SpeechSpeechPretrainWrapper, text2semantic.py:
    1108-1171, reconstruct_seq + mask_id path): a random `deletion_prob` subset
    of the speech tokens is replaced with a mask id; the model reconstructs the
    full sequence. The corrupted source goes through the TEXT path like the
    reference does (source_type='text')."""
    mask_id = cfg.num_text_tokens - 1  # reserve the last text id as [MASK]
    valid = semantic_ids != cfg.semantic_pad_id
    drop = (jax.random.uniform(key, semantic_ids.shape) < deletion_prob) & valid
    source = jnp.where(drop, mask_id, jnp.clip(semantic_ids, 0, cfg.num_text_tokens - 1))
    return forward_loss(params, cfg, source, semantic_ids, dtype=dtype)
