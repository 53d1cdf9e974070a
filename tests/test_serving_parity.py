"""Batched serving == per-file synthesis on mixed-length batches.

Round-2 VERDICT weak #2: serving.BatchedPipeline ran every row at the full
static span — rows whose decode stopped early attended over silence-157 fill
and zero cond, reintroducing the bucket-padding skew the per-file path fixed
(tests/test_bucket_skew.py quantified ~0.15 max-abs). The fix: per-row
left-packing + a per-row `valid_len` vector through the flow stage and a
per-row frame count through the vocoder (re-zeroed after every conv).

These tests prove the fix end to end:
  1. batched flow+vocoder with per-row valid lengths == independent
     exact-length runs per row (the reference convention,
     monologue_generation.py:168-177) to <1e-4;
  2. BatchedPipeline.__call__'s packing reproduces that direct computation
     exactly (T2S stubbed so both sides see identical tokens).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V
from covomix_tpu.serving import BatchedPipeline

AC_CFG = A.AcousticConfig(dim_in=160, dim=32, depth=2, heads=2, dim_head=16,
                          dim_phoneme_emb=16, num_phoneme_tokens=502, mode="two_one")
VOC_CFG = V.VocoderConfig(upsample_initial_channel=16)
T2S_CFG = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                      num_text_tokens=200, num_semantic_tokens=501, target_dim=32,
                      two_output=True)

B, PMAX, L = 3, 8, 24
PROMPT_LENS = np.array([8, 5, 8], np.int32)
GEN_LENS = np.array([24, 7, 15], np.int32)   # wildly different decode lengths
TOTAL = PMAX + L


def _packed_inputs(rs):
    """Serving layout: per row [prompt ‖ generated ‖ filler], plus the exact
    per-row slices a per-file run would see."""
    prompt_tok = rs.randint(0, 500, (B, PMAX, 2)).astype(np.int32)
    prompt_mel = rs.randn(B, PMAX, 160).astype(np.float32) * 0.1
    gen_tok = rs.randint(0, 500, (B, L, 2)).astype(np.int32)

    phonemes = np.full((B, TOTAL, 2), 157, np.int32)
    cond = np.zeros((B, TOTAL, 160), np.float32)
    for i in range(B):
        p, g = PROMPT_LENS[i], GEN_LENS[i]
        phonemes[i, :p] = prompt_tok[i, :p]
        phonemes[i, p : p + g] = gen_tok[i, :g]
        cond[i, :p] = prompt_mel[i, :p]
    valid = PROMPT_LENS + GEN_LENS
    return phonemes, cond, valid, prompt_tok, prompt_mel, gen_tok


def test_batched_flow_vocoder_matches_exact_per_row():
    rs = np.random.RandomState(0)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), AC_CFG)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(1), VOC_CFG)
    phonemes, cond, valid, prompt_tok, prompt_mel, gen_tok = _packed_inputs(rs)
    y0 = rs.randn(B, TOTAL, 80).astype(np.float32)
    up = VOC_CFG.total_upsample

    with jax.default_matmul_precision("highest"):
        mel_b = np.asarray(A.sample(
            ac_params, AC_CFG, jax.random.PRNGKey(2), jnp.asarray(phonemes),
            jnp.asarray(cond), cond_scale=0.7, valid_len=jnp.asarray(valid),
            noise=jnp.asarray(y0)))
        # left-aligned generated regions, batched vocode with per-row lengths
        mel_gen = np.stack([mel_b[i, PROMPT_LENS[i]: PROMPT_LENS[i] + L] for i in range(B)])
        wav_b = np.asarray(V.generator(voc_params, VOC_CFG, jnp.asarray(mel_gen),
                                       valid_len=jnp.asarray(GEN_LENS)))

        for i in range(B):
            p, g, v = int(PROMPT_LENS[i]), int(GEN_LENS[i]), int(valid[i])
            # exact-length run: what the per-file Synthesizer computes
            ph_i = np.concatenate([prompt_tok[i, :p], gen_tok[i, :g]])[None]
            cond_i = np.zeros((1, v, 160), np.float32)
            cond_i[0, :p] = prompt_mel[i, :p]
            mel_i = np.asarray(A.sample(
                ac_params, AC_CFG, jax.random.PRNGKey(2), jnp.asarray(ph_i),
                jnp.asarray(cond_i), cond_scale=0.7, noise=jnp.asarray(y0[i:i + 1, :v])))
            err_mel = np.abs(mel_b[i, :v] - mel_i[0]).max()
            assert err_mel < 1e-4, f"row {i}: flow mismatch {err_mel}"

            wav_i = np.asarray(V.generator(voc_params, VOC_CFG,
                                           jnp.asarray(mel_i[:, p:])))[0]
            err_wav = np.abs(wav_b[i, : g * up] - wav_i[: g * up]).max()
            assert err_wav < 1e-4, f"row {i}: vocoder mismatch {err_wav}"


import pytest


@pytest.mark.parametrize("fused", [False, True])
def test_batched_pipeline_call_equals_direct(fused):
    """The packing (staged numpy loop AND fused device-side dynamic_slice
    shifts) against a DIRECT stage-by-stage computation, with DISTINCT
    per-position tokens and wildly mixed prompt/decode lengths — this is the
    test that catches placement bugs (e.g. dynamic_slice start-clamping when
    the slice spans the whole buffer), which random-weight decode parity
    cannot see (near-constant token runs). fused differs only by XLA
    fusion/rounding order (1e-4); staged is bit-comparable (1e-6)."""
    rs = np.random.RandomState(1)
    key0 = jax.random.PRNGKey(0)
    t2s_params = jax.jit(T.init, static_argnums=1)(key0, T2S_CFG)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), AC_CFG)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), VOC_CFG)

    pipe = BatchedPipeline(t2s_params, T2S_CFG, ac_params, AC_CFG, voc_params, VOC_CFG,
                           decode_len=L, dtype=jnp.float32, fused=fused)

    # stub the T2S stage with handcrafted per-row lengths (pad-filled after)
    pad = T2S_CFG.semantic_pad_id
    tok1 = rs.randint(0, 500, (B, L)).astype(np.int32)
    tok2 = rs.randint(0, 500, (B, L)).astype(np.int32)
    len1 = np.array([24, 9, 15], np.int64)
    len2 = np.array([24, 7, 20], np.int64)   # min(len1, len2) == GEN_LENS
    for i in range(B):
        tok1[i, len1[i]:] = pad
        tok2[i, len2[i]:] = pad
    gen = T.GenerateResult(tokens=jnp.asarray(tok1), tokens2=jnp.asarray(tok2),
                           lengths=jnp.asarray(len1), lengths2=jnp.asarray(len2),
                           num_steps=jnp.int32(L))
    pipe._gen = lambda params, key, source_ids: gen

    prompt_tok = rs.randint(0, 500, (B, PMAX, 2)).astype(np.int32)
    prompt_mel = rs.randn(B, PMAX, 160).astype(np.float32) * 0.1
    text_ids = rs.randint(1, 200, (B, 6))

    key = jax.random.PRNGKey(7)
    wav, gen_out = pipe(key, text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    wav = np.asarray(wav)

    # direct computation with the same packing and the same k2
    _, k2 = jax.random.split(key)
    phonemes = np.full((B, TOTAL, 2), 157, np.int32)
    cond = np.zeros((B, TOTAL, 160), np.float32)
    for i in range(B):
        p, g = int(PROMPT_LENS[i]), int(GEN_LENS[i])
        phonemes[i, :p] = prompt_tok[i, :p]
        phonemes[i, p : p + g] = np.stack(
            [np.clip(tok1[i, :g], 0, 501), np.clip(tok2[i, :g], 0, 501)], axis=-1)
        cond[i, :p] = prompt_mel[i, :p]
    valid = PROMPT_LENS + GEN_LENS
    mel = np.asarray(pipe._sample(ac_params, key=k2, phoneme_ids=jnp.asarray(phonemes),
                                  cond=jnp.asarray(cond), valid_len=jnp.asarray(valid)))
    mel_gen = np.stack([mel[i, PROMPT_LENS[i]: PROMPT_LENS[i] + L] for i in range(B)])
    wav_ref = np.asarray(pipe._voc(voc_params, mel=jnp.asarray(mel_gen),
                                   valid_len=jnp.asarray(GEN_LENS)))
    assert wav.shape == wav_ref.shape
    assert np.abs(wav - wav_ref).max() < (1e-4 if fused else 1e-6)
    up = VOC_CFG.total_upsample
    for i in range(B):
        assert np.isfinite(wav[i, : int(GEN_LENS[i]) * up]).all()


def test_fused_placed_inputs_match_numpy_inputs():
    """pipe(key, *pipe.place(...)) == pipe(key, numpy inputs): place() only
    pre-uploads (the serving-bench methodology fix — per-call prompt upload
    was ~0.5 s at B=64 through the tunnel), it must not change results."""
    rs = np.random.RandomState(4)
    key0 = jax.random.PRNGKey(0)
    t2s_params = jax.jit(T.init, static_argnums=1)(key0, T2S_CFG)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), AC_CFG)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), VOC_CFG)
    pipe = BatchedPipeline(t2s_params, T2S_CFG, ac_params, AC_CFG, voc_params, VOC_CFG,
                           decode_len=L, dtype=jnp.float32, fused=True)
    prompt_tok = rs.randint(0, 500, (B, PMAX)).astype(np.int32)
    prompt_mel = rs.randn(B, PMAX, 160).astype(np.float32) * 0.1
    text_ids = rs.randint(1, 200, (B, 6))
    key = jax.random.PRNGKey(9)
    wav_np, _ = pipe(key, text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    placed = pipe.place(text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    wav_pl, _ = pipe(key, *placed)
    np.testing.assert_array_equal(np.asarray(wav_np), np.asarray(wav_pl))


def test_fused_matches_staged():
    """fused=True (the whole cascade as ONE jitted program, device-side
    packing) must reproduce fused=False (three dispatches, host-side numpy
    packing) bit-for-bit: same key split, same packing layout, same
    valid-length handling — with the REAL T2S decode in the loop."""
    rs = np.random.RandomState(3)
    t2s_params = jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(0), T2S_CFG)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), AC_CFG)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), VOC_CFG)

    kw = dict(decode_len=L, dtype=jnp.float32)
    fused = BatchedPipeline(t2s_params, T2S_CFG, ac_params, AC_CFG, voc_params, VOC_CFG,
                            fused=True, **kw)
    staged = BatchedPipeline(t2s_params, T2S_CFG, ac_params, AC_CFG, voc_params, VOC_CFG,
                             fused=False, **kw)

    prompt_tok = rs.randint(0, 500, (B, PMAX)).astype(np.int32)  # [B, P]: exercises 2-stream stacking
    prompt_mel = rs.randn(B, PMAX, 160).astype(np.float32) * 0.1
    text_ids = rs.randint(1, 200, (B, 6))
    key = jax.random.PRNGKey(11)

    wav_f, gen_f = fused(key, text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    wav_s, gen_s = staged(key, text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    np.testing.assert_array_equal(np.asarray(gen_f.tokens), np.asarray(gen_s.tokens))
    np.testing.assert_array_equal(np.asarray(gen_f.lengths), np.asarray(gen_s.lengths))
    assert wav_f.shape == wav_s.shape
    # one fused XLA program vs three staged programs: same math, different
    # fusion/rounding order — equality up to a few f32 ulp of the ~0.05 wav scale
    assert np.abs(np.asarray(wav_f) - np.asarray(wav_s)).max() < 1e-4


def test_fused_matches_staged_single_stream():
    """Same check on the single-stream (VoSingle) packing branch."""
    rs = np.random.RandomState(4)
    ac_cfg = dataclasses.replace(AC_CFG, dim_in=80, mode="single")
    t2s_cfg = dataclasses.replace(T2S_CFG, two_output=False, target_dim=32)
    t2s_params = jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(0), t2s_cfg)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), ac_cfg)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), VOC_CFG)

    kw = dict(decode_len=L, dtype=jnp.float32)
    fused = BatchedPipeline(t2s_params, t2s_cfg, ac_params, ac_cfg, voc_params, VOC_CFG,
                            fused=True, **kw)
    staged = BatchedPipeline(t2s_params, t2s_cfg, ac_params, ac_cfg, voc_params, VOC_CFG,
                             fused=False, **kw)

    prompt_tok = rs.randint(0, 500, (B, PMAX)).astype(np.int32)
    prompt_mel = rs.randn(B, PMAX, 80).astype(np.float32) * 0.1
    text_ids = rs.randint(1, 200, (B, 6))
    key = jax.random.PRNGKey(13)

    wav_f, gen_f = fused(key, text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    wav_s, gen_s = staged(key, text_ids, prompt_tok, prompt_mel, prompt_lens=PROMPT_LENS)
    np.testing.assert_array_equal(np.asarray(gen_f.tokens), np.asarray(gen_s.tokens))
    assert np.abs(np.asarray(wav_f) - np.asarray(wav_s)).max() < 1e-4


def test_fused_min_length_forces_full_decode():
    """min_length == decode_len masks EOS for every step (serving min-duration
    control; also how bench.py keeps random-weight decodes honest)."""
    t2s_params = jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(0), T2S_CFG)
    ac_params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(1), AC_CFG)
    voc_params = jax.jit(V.init_generator, static_argnums=1)(jax.random.PRNGKey(2), VOC_CFG)
    pipe = BatchedPipeline(t2s_params, T2S_CFG, ac_params, AC_CFG, voc_params, VOC_CFG,
                           decode_len=L, dtype=jnp.float32, min_length=L)
    rs = np.random.RandomState(5)
    wav, gen = pipe(jax.random.PRNGKey(3), rs.randint(1, 200, (B, 6)),
                    rs.randint(0, 500, (B, PMAX)).astype(np.int32),
                    rs.randn(B, PMAX, 160).astype(np.float32) * 0.1,
                    prompt_lens=PROMPT_LENS)
    assert int(np.asarray(gen.num_steps)) == L
    assert (np.asarray(gen.lengths) == L).all()
