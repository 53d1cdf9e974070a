"""Training-time sampling evals, mirroring covomix/util/inference.py.

  * acoustic (VoSingle): generate the FIRST 70% of each held-out utterance
    conditioned on the trailing 30% and report MSE over the generated region
    as 'l2' (inference.py:32-75: acoustic_mask True on the first 70%,
    mel_input keeps frames after 70%, cond_scale 0.7)
  * VoMix variants: two_two pairs a random other utterance's A-stream
    (inference.py:79-135); two_one uses the A/B/mixed triplet and scores the
    second half against the MIXED mel (inference.py:151-227); both use a 50%
    split with the first half as prompt
  * T2S: decode held-out texts and report WER between predicted and GT
    token-id strings after padding both to equal length with 501
    (inference.py:287-358, jiwer on id strings) — computed with the native
    C++ levenshtein when built, else a numpy fallback.

Checkpoint selection in the reference keeps top-10 on this 'l2' (train.py:72-76)."""

from __future__ import annotations

import functools
from typing import Dict, Iterable, List

import jax
import jax.numpy as jnp
import numpy as np


def token_wer(ref: Iterable[int], hyp: Iterable[int]) -> float:
    """Word-error-rate over token-id sequences (jiwer on id strings in the
    reference, inference.py:345-354)."""
    from covomix_tpu.native import levenshtein

    ref = list(map(int, ref))
    hyp = list(map(int, hyp))
    if not ref:
        return 0.0 if not hyp else 1.0
    return levenshtein(ref, hyp) / len(ref)


def _uniform_indices(n_total: int, n_eval: int) -> List[int]:
    """torch.linspace(0, N-1, num_eval_files).int() (inference.py:39-40)."""
    if n_total <= 0:
        return []
    return [int(x) for x in np.linspace(0, n_total - 1, min(n_eval, max(n_total, 1)))]


def evaluate_acoustic(params, cfg, eval_batches, key, *, mask_frac: float = 0.7,
                      cond_scale: float = 0.7, dtype=jnp.float32) -> Dict[str, float]:
    """Batched eval, mode-aware like the reference dispatch:

    * VoSingle ('single'): the mask covers the FIRST mask_frac of the
      sequence (region generated + scored); cond keeps only the trailing
      context (inference.py:49-70).
    * two-stream modes: the 50% protocol — the FIRST half is the prompt
      (cond kept), the SECOND half is generated and scored
      (inference.py:79-135, :151-227).

    Rows are handled at their TRUE lengths: pad frames are exactly
    MEL_PAD=-15 in every dim (real log-mel floors at log(1e-5)=-11.51), the
    per-row length rides into sample() as valid_len so padding stays out of
    attention, and the split/score regions are per row — otherwise the 'l2'
    used for top-10 checkpoint selection would depend on how much bucket
    padding each batch happened to carry (review r3)."""
    from covomix_tpu.models import acoustic as A

    sample = jax.jit(functools.partial(A.sample, cfg=cfg, cond_scale=cond_scale, dtype=dtype))
    two = cfg.mode != "single"
    frac = 0.5 if two else mask_frac
    l2s = []
    for batch in eval_batches:
        x = np.asarray(batch["x"])
        lens = (np.abs(x - (-15.0)) > 1e-6).any(-1).sum(-1).astype(np.int32)  # true frames
        if cfg.mode == "two_one":
            target, cond = x[..., -80:], x[..., :-80].copy()
        else:
            target, cond = x, x.copy()
        splits = (lens * frac).astype(int)
        for i in range(x.shape[0]):
            if two:
                cond[i, splits[i]:] = 0.0    # prompt = first half
            else:
                cond[i, : splits[i]] = 0.0   # prompt = trailing context
        key, sub = jax.random.split(key)
        pred = np.asarray(sample(params, key=sub, phoneme_ids=jnp.asarray(batch["phonemes"]),
                                 cond=jnp.asarray(cond), valid_len=jnp.asarray(lens)))
        for i in range(x.shape[0]):
            s, li = int(splits[i]), int(lens[i])
            region = slice(s, li) if two else slice(0, s)
            if region.stop > region.start:
                l2s.append(float(np.mean((pred[i, region] - target[i, region]) ** 2)))
    return {"l2": float(np.mean(l2s)) if l2s else float("nan")}


def _pad_bucket(arr, bucket, pad_value):
    t = arr.shape[0]
    n = ((t + bucket - 1) // bucket) * bucket
    if arr.ndim == 1:
        return np.pad(arr, (0, n - t), constant_values=pad_value)
    return np.pad(arr, ((0, n - t),) + ((0, 0),) * (arr.ndim - 1), constant_values=pad_value)


def evaluate_acoustic_files(params, cfg, mel_files: List[str], num_eval_files: int, key, *,
                            cond_scale: float = 0.7, bucket: int = 128, dtype=jnp.float32) -> Dict[str, float]:
    """File-level VoSingle eval (inference.py:32-75): uniform index selection
    over the validation mel list, exact-length mel/code pairing, first-70%
    generation conditioned on the tail, per-file masked MSE. Lengths are
    bucket-padded (pad mel -15 / code 501) so jit executables are reused."""
    from covomix_tpu.data.oracle import _load_pair
    from covomix_tpu.models import acoustic as A

    sample = jax.jit(functools.partial(A.sample, cfg=cfg, cond_scale=cond_scale, dtype=dtype),
                     static_argnames=())
    l2s = []
    for i in _uniform_indices(len(mel_files), num_eval_files):
        mel, codes = _load_pair(mel_files[i])
        t = len(codes)
        split = int(t * 0.7)
        cond = mel.copy()
        cond[:split] = 0.0
        cond_p = _pad_bucket(cond, bucket, 0.0)
        codes_p = _pad_bucket(codes, bucket, 501)
        key, sub = jax.random.split(key)
        # valid_len: bucket padding must stay out of attention, or the score
        # depends on how much padding each file happened to get
        pred = np.asarray(sample(params, key=sub, phoneme_ids=jnp.asarray(codes_p)[None],
                                 cond=jnp.asarray(cond_p)[None], valid_len=jnp.int32(t)))[0]
        l2s.append(float(np.mean((pred[:split] - mel[:split]) ** 2)))
    return {"l2": float(np.mean(l2s)) if l2s else float("nan")}


def evaluate_acoustic_two_one_files(params, cfg, mel_files: List[str], num_eval_files: int, key, *,
                                    cond_scale: float = 0.7, bucket: int = 128, dtype=jnp.float32) -> Dict[str, float]:
    """File-level VoMix (2 input, 1 mixed output) eval (inference.py:151-227):
    per file, the A/B channel mels condition the first half; the second half of
    the predicted MIXED mel is scored against the ground-truth mixed mel."""
    from covomix_tpu.data.oracle import load_two_stream_example
    from covomix_tpu.models import acoustic as A

    sample = jax.jit(functools.partial(A.sample, cfg=cfg, cond_scale=cond_scale, dtype=dtype))
    l2s = []
    for i in _uniform_indices(len(mel_files), num_eval_files):
        path_a = mel_files[i].replace(".mel.npy", "-A.mel.npy")
        mel2, codes2, mixed = load_two_stream_example(path_a)
        if mixed is None:
            continue
        t = len(codes2)
        split = int(t * 0.5)
        cond = mel2.copy()
        cond[split:] = 0.0   # first half visible (inference.py:188-192)
        cond_p = _pad_bucket(cond, bucket, 0.0)
        codes_p = _pad_bucket(codes2, bucket, 501)
        key, sub = jax.random.split(key)
        pred = np.asarray(sample(params, key=sub, phoneme_ids=jnp.asarray(codes_p)[None],
                                 cond=jnp.asarray(cond_p)[None], valid_len=jnp.int32(t)))[0]
        l2s.append(float(np.mean((pred[split:t] - mixed[split:t]) ** 2)))
    return {"l2": float(np.mean(l2s)) if l2s else float("nan")}


def evaluate_acoustic_two_two_files(params, cfg, mel_files: List[str], num_eval_files: int, key, *,
                                    cond_scale: float = 0.7, bucket: int = 128, dtype=jnp.float32,
                                    seed: int = 0) -> Dict[str, float]:
    """File-level VoMix (2 input, 2 output) eval (inference.py:79-135): the
    partner stream is a RANDOM other utterance's A-stream; second half scored
    against the stacked ground truth."""
    import random as _random

    from covomix_tpu.data.oracle import load_two_stream_example
    from covomix_tpu.models import acoustic as A

    rng = _random.Random(seed)
    sample = jax.jit(functools.partial(A.sample, cfg=cfg, cond_scale=cond_scale, dtype=dtype))
    l2s = []
    for i in _uniform_indices(len(mel_files), num_eval_files):
        path_a = mel_files[i].replace(".mel.npy", "-A.mel.npy")
        mel2, codes2, _ = load_two_stream_example(path_a, rng=rng, random_partner=mel_files)
        t = len(codes2)
        split = int(t * 0.5)
        cond = mel2.copy()
        cond[split:] = 0.0
        cond_p = _pad_bucket(cond, bucket, 0.0)
        codes_p = _pad_bucket(codes2, bucket, 501)
        key, sub = jax.random.split(key)
        pred = np.asarray(sample(params, key=sub, phoneme_ids=jnp.asarray(codes_p)[None],
                                 cond=jnp.asarray(cond_p)[None], valid_len=jnp.int32(t)))[0]
        l2s.append(float(np.mean((pred[split:t] - mel2[split:t]) ** 2)))
    return {"l2": float(np.mean(l2s)) if l2s else float("nan")}


def evaluate_t2s(params, cfg, eval_batches, key, *, max_length: int = 512,
                 temperature: float = 1.0, cond_scale: float = 1.0,
                 dtype=jnp.float32) -> Dict[str, float]:
    """Decode and score token WER (inference.py:287-358): both sequences are
    padded to equal length with 501 before the WER, exactly like the reference
    (pads then count as matching 'words'). Also reports exact-prefix accuracy
    as a secondary diagnostic (not in the reference)."""
    from covomix_tpu.models import text2semantic as T

    from covomix_tpu.native import BleuScorer

    gen = jax.jit(functools.partial(T.generate, cfg=cfg, max_length=max_length,
                                    temperature=temperature, cond_scale=cond_scale, dtype=dtype))
    wers, accs = [], []
    # token-level corpus BLEU as a secondary order-sensitive diagnostic (the
    # fairseq scoring surface the native BleuScorer provides; pad/eos/unk ids
    # chosen outside the semantic vocab so nothing trims or unk-matches)
    bleu = BleuScorer(pad=-1, eos=-2, unk=-3)
    for batch in eval_batches:
        key, sub = jax.random.split(key)
        out = gen(params, key=sub, source_ids=jnp.asarray(batch["text_ids"]))
        toks = np.asarray(out.tokens)
        sem = np.asarray(batch["semantic_ids"])
        if sem.ndim == 3:
            sem = sem[..., 0]   # two_output: first half == stream 1 (inference.py:323-325)
        for b in range(toks.shape[0]):
            hyp = toks[b][toks[b] != cfg.semantic_pad_id]
            ref = sem[b][sem[b] != 501]
            n = max(len(ref), len(hyp))
            ref_p = np.pad(ref, (0, n - len(ref)), constant_values=501)
            hyp_p = np.pad(hyp, (0, n - len(hyp)), constant_values=501)
            wers.append(token_wer(ref_p, hyp_p))
            m = min(len(ref), len(hyp))
            accs.append(float(np.mean(ref[:m] == hyp[:m])) if m else 0.0)
            # generate() keeps the sampled EOS (501) in the token stream; the
            # reference strips all 501s from both sides, so strip the
            # hypothesis too — otherwise every sentence carries one
            # guaranteed-unmatchable token that deflates short-sequence BLEU
            bleu.add(ref, hyp[hyp != 501])
    return {"l2": float(np.mean(wers)) if wers else float("nan"),  # logged as 'l2' like the reference
            "accuracy": float(np.mean(accs)) if accs else float("nan"),
            "token_bleu": bleu.score()}


def evaluate_t2s_files(params, cfg, tokenizer, code_files: List[str], num_eval_files: int, key, *,
                       max_length: int = 2048, temperature: float = 1.0, cond_scale: float = 1.0,
                       bucket: int = 32, dtype=jnp.float32) -> Dict[str, float]:
    """File-level T2S eval, the reference's evaluate_text2semantic
    (inference.py:287-358): uniform selection over validation code files, text
    from the sibling .txt ('-16k.hubert_code.npy' / '_1.hubert_code.npy' ->
    '.txt'), BERT-tokenize, decode with NO prompt (the reference passes
    prompt_mel=None), two_output keeps the first half (:323-325), pad both
    sequences to equal length with 501, jiwer-style WER averaged over files and
    reported as 'l2'. Text ids are bucket-padded (pad 0 = BERT [PAD], which the
    source mask drops) so jit executables are reused across lengths."""
    from covomix_tpu.models import text2semantic as T

    gen = jax.jit(functools.partial(T.generate, cfg=cfg, max_length=max_length,
                                    temperature=temperature, cond_scale=cond_scale, dtype=dtype))
    wers = []
    for i in _uniform_indices(len(code_files), num_eval_files):
        code_path = code_files[i]
        txt_path = code_path.replace("-16k.hubert_code.npy", ".txt").replace("_1.hubert_code.npy", ".txt")
        if txt_path == code_path:
            txt_path = code_path.replace(".hubert_code.npy", ".txt")
        with open(txt_path) as f:
            text = f.read()
        from covomix_tpu.data.datasets import load_codes

        gt = load_codes(code_path).reshape(-1)
        ids = np.asarray(tokenizer.encode(text), np.int32)
        ids = _pad_bucket(ids, bucket, 0)
        key, sub = jax.random.split(key)
        out = gen(params, key=sub, source_ids=jnp.asarray(ids)[None])
        # GenerateResult.tokens is stream 1 (== the first half the reference
        # keeps from its flat two-stream concat, inference.py:323-325)
        hyp = np.asarray(out.tokens)[0]
        hyp = hyp[hyp != cfg.semantic_pad_id]
        n = max(len(gt), len(hyp))
        wers.append(token_wer(np.pad(gt, (0, n - len(gt)), constant_values=501),
                              np.pad(hyp, (0, n - len(hyp)), constant_values=501)))
    return {"l2": float(np.mean(wers)) if wers else float("nan")}
