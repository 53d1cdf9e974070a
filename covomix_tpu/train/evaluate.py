"""Training-time sampling evals, mirroring covomix/util/inference.py.

  * acoustic: synthesize a 70%-masked continuation of held-out utterances and
    report MSE vs ground-truth mel as 'l2' (inference.py:32-75; VoMix variants
    :79-135, :151-227)
  * T2S: decode held-out texts and report WER between predicted and GT token-id
    strings (inference.py:287-358) — computed with the native C++ levenshtein
    when built, else a numpy fallback.

Checkpoint selection in the reference keeps top-10 on this 'l2' (train.py:72-76)."""

from __future__ import annotations

import functools
from typing import Dict, Iterable

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


def evaluate_acoustic(params, cfg, eval_batches, key, *, mask_frac: float = 0.7, cond_scale: float = 1.0, dtype=jnp.float32) -> Dict[str, float]:
    """For each eval batch: mask the trailing `mask_frac` of the sequence, zero
    cond there, sample, report masked-region MSE (inference.py:32-75)."""
    from covomix_tpu.models import acoustic as A

    sample = jax.jit(functools.partial(A.sample, cfg=cfg, cond_scale=cond_scale, dtype=dtype))
    l2s = []
    for batch in eval_batches:
        x = np.asarray(batch["x"])
        if cfg.mode == "two_one":
            target, cond = x[..., -80:], x[..., :-80].copy()
        else:
            target, cond = x, x.copy()
        t = x.shape[1]
        split = int(t * (1 - mask_frac))
        cond[:, split:] = 0.0
        key, sub = jax.random.split(key)
        pred = np.asarray(sample(params, key=sub, phoneme_ids=jnp.asarray(batch["phonemes"]), cond=jnp.asarray(cond)))
        l2s.append(float(np.mean((pred[:, split:] - target[:, split:]) ** 2)))
    return {"l2": float(np.mean(l2s)) if l2s else float("nan")}


def evaluate_t2s(params, cfg, eval_batches, key, *, max_length: int = 512, dtype=jnp.float32) -> Dict[str, float]:
    """Decode and score token WER + exact-prefix accuracy (inference.py:287-358)."""
    from covomix_tpu.models import text2semantic as T

    gen = jax.jit(functools.partial(T.generate, cfg=cfg, max_length=max_length, dtype=dtype))
    wers, accs = [], []
    for batch in eval_batches:
        key, sub = jax.random.split(key)
        out = gen(params, key=sub, source_ids=jnp.asarray(batch["text_ids"]))
        toks = np.asarray(out.tokens)
        sem = np.asarray(batch["semantic_ids"])
        if sem.ndim == 3:
            sem = sem[..., 0]
        for b in range(toks.shape[0]):
            hyp = toks[b][toks[b] != cfg.semantic_pad_id]
            ref = sem[b][sem[b] != 501]
            wers.append(token_wer(ref, hyp))
            n = min(len(ref), len(hyp))
            accs.append(float(np.mean(ref[:n] == hyp[:n])) if n else 0.0)
    return {"l2": float(np.mean(wers)) if wers else float("nan"),  # logged as 'l2' like the reference
            "accuracy": float(np.mean(accs)) if accs else float("nan")}
