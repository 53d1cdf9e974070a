"""One-command verification of the released reference checkpoints.

The converters are parity-tested on random weights (tests/test_torch_parity.py,
test_convert.py, test_vocoder.py); this script proves the SAME claims against
the real released assets the day they are available:

    python verify_reference_ckpts.py \
        --t2s_ckpt cosingle.ckpt --acous_ckpt covosingle.ckpt \
        --hifigan_ckpt g_00400000 --bert_vocab vocab.txt \
        [--comix_t2s_ckpt comix.ckpt --comix_acous_ckpt vomix.ckpt] \
        [--hubert_pt hubert_fisher.pt --km hubert_fisher_km_500.bin] \
        --out_dir verify_out

Asset inventory follows the reference CLIs (monologue_generation.py:323-399:
t2s_ckpt / acous_ckpt / hifigan_ckpt + vocoder_config.json sidecar;
get_fisher_semantic_tokens_parallel.py: hubert_fisher.pt + km .bin).

Per checkpoint it (1) converts to .npz exactly the way the generation CLIs do
(EMA shadow selection, weight-norm fold, hubert+km merge), then (2) EXECUTES
the reference torch module with the original weights next to our model with
the converted weights on shared inputs and enforces budgets:

    acoustic   field-eval max|Δ|            <= --atol   (default 2e-3)
    t2s        logits max|Δ|                <= --atol
    t2s        near-greedy decode tokens    exact match (temperature -> 0)
    vocoder    waveform max|Δ|              <= 10*--atol
    vocoder    MCD(mel(ref wav), mel(ours)) <= --mcd_budget (default 0.1 dB)
    hubert     converted codes valid; torch-side math is covered by the
               mirror parity tests (fairseq itself is not importable here)

and (3) runs the full covosingle (and covomix, if the CoMix pair is given)
synthesis cascade on prompts derived from the hifi-gan/hifigan_test fixture
wavs, writing audible .wav outputs + config.txt provenance. The vocoder-stage
MCD on the real fixture mels is the "0.1 dB budget" headline: it is computed
between the torch reference generator's waveform and ours on identical inputs,
so a pass means converted-checkpoint audio is numerically interchangeable with
the reference's. Stage (4) then runs the PRODUCTION fused single-jit serving
path (serving.BatchedPipeline, fused=True default) on the same weights against
its staged counterpart and enforces MCD(fused, staged) <= --mcd_budget — so
the one-command proof covers the batched serving default, not just the
per-file path.

Stochastic stages (flow-matching sample, T2S sampling at temperature>0) cannot
be compared sample-for-sample across frameworks (different RNG streams), which
is why parity is enforced at every deterministic boundary instead: field eval,
argmax decode, vocoder. Exit code 0 iff every run stage passed; the full
report lands in <out_dir>/verify_report.json.

Tested end-to-end with random-weight stand-ins in reference formats by
tests/test_verify_ckpts.py.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import covomix_tpu.util.jaxcache  # noqa: F401  (persistent compile cache)


# ---------------------------------------------------------------------------
# report plumbing


class Report:
    def __init__(self):
        self.stages = []

    def add(self, stage: str, status: str, **detail):
        rec = {"stage": stage, "status": status, **detail}
        self.stages.append(rec)
        extras = " ".join(f"{k}={v}" for k, v in detail.items())
        print(f"[{status:4s}] {stage}  {extras}", flush=True)

    @property
    def failed(self):
        return [s for s in self.stages if s["status"] == "FAIL"]


def _maxabs(a, b) -> float:
    import numpy as np

    return float(np.max(np.abs(np.asarray(a, np.float32) - np.asarray(b, np.float32))))


# ---------------------------------------------------------------------------
# stage 1: conversion (same path as the generation CLIs / convert_checkpoint.py)


def convert_all(args, rep: Report) -> dict:
    """Returns {name: npz_path} for every checkpoint provided."""
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.checkpoint import torch_convert as tc

    out = {}

    def _save(name, params, meta):
        dst = os.path.join(args.out_dir, name + ".npz")
        cio.save_params(dst, params, meta=meta)
        n_params = sum(
            int(v.size) for v in jax_leaves(params)
        )
        rep.add(f"convert/{name}", "PASS", params=n_params, dst=dst)
        out[name] = dst

    def jax_leaves(tree):
        import jax

        return jax.tree_util.tree_leaves(tree)

    for name, path in [("t2s", args.t2s_ckpt), ("acoustic", args.acous_ckpt),
                       ("comix_t2s", args.comix_t2s_ckpt),
                       ("comix_acoustic", args.comix_acous_ckpt)]:
        if not path:
            continue
        if path.endswith(".npz"):
            rep.add(f"convert/{name}", "SKIP", reason="already .npz", dst=path)
            out[name] = path
            continue
        params, hp = tc.convert_lightning_ckpt(path, use_ema=not args.no_ema)
        _save(name, params, {"kind": name, "config": _cfg_from_hparams(hp),
                             "hparams": {k: v for k, v in hp.items()
                                         if isinstance(v, (int, float, str, bool))},
                             "source": path, "ema": not args.no_ema})

    if args.hifigan_ckpt:
        if args.hifigan_ckpt.endswith(".npz"):
            rep.add("convert/vocoder", "SKIP", reason="already .npz", dst=args.hifigan_ckpt)
            out["vocoder"] = args.hifigan_ckpt
        else:
            h = _vocoder_json(args)
            params = tc.convert_hifigan_ckpt(args.hifigan_ckpt, h)
            _save("vocoder", params, {"kind": "vocoder", "config": h, "source": args.hifigan_ckpt})

    if args.hubert_pt:
        if args.hubert_pt.endswith(".npz"):
            rep.add("convert/hubert", "SKIP", reason="already .npz", dst=args.hubert_pt)
            out["hubert"] = args.hubert_pt
        else:
            params = tc.convert_hubert_ckpt(args.hubert_pt, args.km)
            _save("hubert", params, {"kind": "hubert", "config": {},
                                     "source": args.hubert_pt, "km": args.km})
    return out


def _cfg_from_hparams(hp: dict) -> dict:
    """hparams -> our config dict; shared with the generation CLIs."""
    from covomix_tpu.checkpoint.torch_convert import cfg_kwargs_from_hparams
    return cfg_kwargs_from_hparams(hp)


def _vocoder_json(args) -> dict:
    cfg_file = args.vocoder_config or os.path.join(
        os.path.dirname(args.hifigan_ckpt), "vocoder_config.json")
    if os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            return json.load(f)
    return {}


# ---------------------------------------------------------------------------
# stage 2: cross-framework parity with the REAL weights


def _ref_module_from_ckpt(path: str, *, use_ema: bool, reference: str):
    """Instantiate the reference torch module from a PL ckpt's hyper_parameters
    and load its (optionally EMA-swapped) weights. Executes reference code via
    the import shim — never copies it."""
    import torch

    from covomix_tpu.checkpoint import torch_convert as tc
    from covomix_tpu.util.reference_compat import load_reference_covomix

    ref_ac, ref_t2s = load_reference_covomix(reference)
    ckpt = tc.load_torch_file(path)
    hp = dict(ckpt.get("hyper_parameters", {}))
    sd = ckpt["state_dict"]
    if use_ema and "ema" in ckpt:
        sd = tc.apply_ema(sd, ckpt["ema"])
    if hp.get("text2semantic", False):
        tt_dim = hp.get("target_transformer_dim") or hp.get("CoVoMix_dim_transformer", 512)
        m = ref_t2s.TextToSemantic(
            dim=int(hp.get("CoVoMix_dim_transformer", 512)),
            source_depth=int(hp.get("text2semantic_source_depth", 4)),
            target_depth=int(hp.get("text2semantic_target_depth", 4)),
            semantic_pad_id=-1, text_pad_id=0,
            heads=int(hp.get("text2semantic_head", 8)),
            num_text_token_ids=int(hp.get("num_text_token_ids", 30528)),
            num_semantic_token_ids=int(hp.get("text2semantic_tokens", 501)),
            no_source_transformer=bool(hp.get("no_source_transformer", False)),
            two_output=bool(hp.get("text2semantic_two_output", False)),
            target_transformer_dim=int(tt_dim),
        )
        prefix = "cfm_wrapper.model."
    else:
        m = ref_ac.CoVoMix(
            dim=int(hp.get("CoVoMix_dim_transformer", 1024)),
            dim_in=int(hp.get("CoVoMix_dim", 80)),
            num_phoneme_tokens=int(hp.get("CoVoMix_num_phoneme_tokens", 502)),
            depth=int(hp.get("CoVoMix_depth", 8)),
            dim_head=int(hp.get("CoVoMix_dim_head", 64)),
            heads=int(hp.get("CoVoMix_heads", 16)),
            twocondition_twooutput=bool(hp.get("twocondition_twooutput", False)),
            twocondition_oneoutput=bool(hp.get("twocondition_oneoutput", False)),
        )
        prefix = "cfm_wrapper.CoVoMix."
    inner = {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}
    m.load_state_dict({k: v for k, v in inner.items() if not k.endswith("rotary_emb_inv_freq")},
                      strict=False)
    m.eval()
    return m, hp


def parity_acoustic(args, npz_path: str, ckpt_path: str, rep: Report, name="acoustic"):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import acoustic as A

    m, hp = _ref_module_from_ckpt(ckpt_path, use_ema=not args.no_ema, reference=args.reference)
    params = cio.load_params(npz_path)
    cfg = A.AcousticConfig(**{k: v for k, v in cio.load_meta(npz_path)["config"].items()
                              if k in {f.name for f in dataclasses.fields(A.AcousticConfig)}})
    rng = np.random.RandomState(args.seed)
    b, t = 2, 64
    x = rng.randn(b, t, cfg.mel_dim).astype(np.float32)
    cond = rng.randn(b, t, cfg.dim_in).astype(np.float32)
    ph_shape = (b, t, 2) if cfg.n_phoneme_streams == 2 else (b, t)
    ph = rng.randint(0, cfg.num_phoneme_tokens, ph_shape).astype(np.int64)
    times = rng.rand(b).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(x), phoneme_ids=torch.from_numpy(ph),
                cond=torch.from_numpy(cond), times=torch.from_numpy(times),
                cond_drop_prob=0.0).numpy()
    with jax.default_matmul_precision("highest"):
        mine = np.asarray(A.forward(params, cfg, jnp.asarray(x), jnp.asarray(ph),
                                    jnp.asarray(cond), jnp.asarray(times)))
    d = _maxabs(mine, ref)
    rep.add(f"parity/{name}_field_eval", "PASS" if d <= args.atol else "FAIL",
            max_abs=f"{d:.2e}", budget=args.atol)


def parity_t2s(args, npz_path: str, ckpt_path: str, rep: Report, name="t2s"):
    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import text2semantic as T

    m, hp = _ref_module_from_ckpt(ckpt_path, use_ema=not args.no_ema, reference=args.reference)
    params = cio.load_params(npz_path)
    cfg = T.T2SConfig(**{k: v for k, v in cio.load_meta(npz_path)["config"].items()
                         if k in {f.name for f in dataclasses.fields(T.T2SConfig)}})
    rng = np.random.RandomState(args.seed)
    b, s, t = 2, 12, 16
    src = rng.randint(1, cfg.num_text_tokens, (b, s)).astype(np.int64)
    tgt_shape = (b, t, 2) if cfg.two_output else (b, t)
    tgt = rng.randint(0, cfg.num_semantic_tokens, tgt_shape).astype(np.int64)
    with torch.no_grad():
        ref_loss, ref_logits = m(torch.from_numpy(src), torch.from_numpy(tgt),
                                 source_type="text", target_type="speech",
                                 return_loss=True, return_logits=True)
    with jax.default_matmul_precision("highest"):
        loss, logits = T.forward_loss(params, cfg, jnp.asarray(src), jnp.asarray(tgt),
                                      return_logits=True)
    l1 = logits[0] if cfg.two_output else logits
    mine_logits = np.asarray(l1)[:, :-1].transpose(0, 2, 1)
    d = _maxabs(mine_logits, ref_logits.numpy())
    dl = abs(float(loss) - ref_loss.item())
    rep.add(f"parity/{name}_logits", "PASS" if d <= args.atol else "FAIL",
            max_abs=f"{d:.2e}", loss_abs=f"{dl:.2e}", budget=args.atol)

    # near-greedy AR decode: argmax loops must match token-for-token
    src1 = src[:1]
    L = 48
    with torch.no_grad():
        ref_tok = m.generate(torch.from_numpy(src1), source_type="text",
                             target_type="speech", temperature=1e-8,
                             max_length=L).numpy()
    with jax.default_matmul_precision("highest"):
        res = T.generate(params, cfg, jax.random.PRNGKey(0), jnp.asarray(src1),
                         max_length=L, temperature=1e-8, top_k_thres=0.1)
    if cfg.two_output:
        n = ref_tok.shape[1] // 2
        mine_flat = np.concatenate([np.asarray(res.tokens)[:, :n],
                                    np.asarray(res.tokens2)[:, :n]], axis=1)
    else:
        n = ref_tok.shape[1]
        mine_flat = np.asarray(res.tokens)[:, :n]
    match = float((mine_flat == ref_tok).mean())
    rep.add(f"parity/{name}_decode", "PASS" if match == 1.0 else "FAIL",
            token_match=f"{match:.4f}", steps=n)


def parity_vocoder(args, npz_path: str, ckpt_path: str, rep: Report):
    """The 0.1 dB headline: torch reference Generator vs ours on the real
    hifigan_test fixture mels (or synthetic mel when fixtures are absent)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    import torch

    from covomix_tpu.audio import MelConfig, mel_spectrogram
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import vocoder as V
    from covomix_tpu.util.metrics import mcd
    from covomix_tpu.util.reference_compat import load_reference_vocoder

    ref_models = load_reference_vocoder(args.reference)
    from covomix.vocoder.env import AttrDict

    h = _vocoder_json(args)
    defaults = dict(resblock="1", upsample_rates=[5, 4, 4, 2],
                    upsample_kernel_sizes=[8, 8, 4, 4], upsample_initial_channel=500,
                    resblock_kernel_sizes=[3, 7, 11],
                    resblock_dilation_sizes=[[1, 3, 5]] * 3, num_mels=80,
                    sampling_rate=8000)
    defaults.update(h)
    h = defaults
    g = ref_models.Generator(AttrDict(h))
    ckpt = torch.load(ckpt_path, map_location="cpu", weights_only=False)
    g.load_state_dict(ckpt["generator"] if "generator" in ckpt else ckpt)
    g.eval()
    g.remove_weight_norm()

    params = cio.load_params(npz_path)
    cfg = V.VocoderConfig(
        num_mels=int(h["num_mels"]),
        upsample_initial_channel=int(h["upsample_initial_channel"]),
        upsample_rates=tuple(h["upsample_rates"]),
        upsample_kernel_sizes=tuple(h["upsample_kernel_sizes"]),
        resblock_kernel_sizes=tuple(h["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(tuple(d) for d in h["resblock_dilation_sizes"]),
        resblock=str(h["resblock"]), sampling_rate=int(h["sampling_rate"]))

    mels = _fixture_mels(args, num_mels=cfg.num_mels, max_files=args.max_fixture_files)
    if not mels:
        rng = np.random.RandomState(args.seed)
        mels = [("synthetic", rng.randn(160, cfg.num_mels).astype(np.float32) * 2.0 - 6.0)]
    mel_cfg = MelConfig(sample_rate=cfg.sampling_rate)
    worst_wav, worst_mcd = 0.0, 0.0
    for fname, mel in mels:
        with torch.no_grad():
            ref_wav = g(torch.from_numpy(mel.T[None]))[0, 0].numpy()
        with jax.default_matmul_precision("highest"):
            mine_wav = np.asarray(V.generator(params, cfg, jnp.asarray(mel[None])))[0]
        n = min(len(ref_wav), len(mine_wav))
        worst_wav = max(worst_wav, _maxabs(mine_wav[:n], ref_wav[:n]))
        m_ref = np.asarray(mel_spectrogram(jnp.asarray(ref_wav[None, :n]), mel_cfg))[0].T
        m_mine = np.asarray(mel_spectrogram(jnp.asarray(mine_wav[None, :n]), mel_cfg))[0].T
        worst_mcd = max(worst_mcd, mcd(m_ref, m_mine))
    ok = worst_wav <= 10 * args.atol and worst_mcd <= args.mcd_budget
    rep.add("parity/vocoder", "PASS" if ok else "FAIL",
            files=len(mels), wav_max_abs=f"{worst_wav:.2e}",
            mcd_db=f"{worst_mcd:.4f}", mcd_budget=args.mcd_budget)


def _fixture_mels(args, num_mels: int, max_files: int):
    """hifigan_test input mels ([80, T] .npy, hifi-gan/meldataset conventions)."""
    import numpy as np

    d = os.path.join(args.fixtures, "input_mel")
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d))[:max_files]:
        if f.endswith(".npy"):
            m = np.load(os.path.join(d, f)).astype(np.float32)
            if m.ndim == 3:
                m = m[0]
            if m.shape[0] == num_mels:
                m = m.T  # -> [T, 80]
            out.append((f, m[: args.max_fixture_frames]))
    return out


def check_hubert(args, npz_path: str, rep: Report):
    """Converted hubert+km produces valid codes on fixture audio (fairseq is
    not importable here; the torch-side math is covered by the mirror parity
    tests in tests/test_hubert.py)."""
    import numpy as np

    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import hubert as H

    params = cio.load_params(npz_path)
    cfg = H.HubertConfig()
    if "kmeans" not in params:
        rep.add("check/hubert", "FAIL", reason="no k-means centroids in converted params")
        return
    n_units = int(params["kmeans"].shape[0])
    wavs = _fixture_wavs(args, max_files=1, sr=cfg.sample_rate)
    if wavs:
        wav = wavs[0][1][: cfg.sample_rate * 4]
    else:
        wav = np.random.RandomState(args.seed).randn(cfg.sample_rate * 2).astype(np.float32) * 0.1
    codes = H.wav2units(params, cfg, wav)
    ok = codes.ndim == 1 and len(codes) > 0 and (codes >= 0).all() and (codes < n_units).all()
    rep.add("check/hubert", "PASS" if ok else "FAIL",
            frames=int(len(codes)), units=n_units,
            distinct=int(len(np.unique(codes))))


def _fixture_wavs(args, max_files: int, sr: int = 8000):
    """Fixture wavs at `sr`. The mel path runs at 8 kHz (covomix config); the
    HuBERT path MUST request sr=16000 — the tokenizer's conv stack is a
    16 kHz model (HubertConfig.sample_rate; hop 320 = 20 ms at 16 kHz), and
    feeding 8 kHz audio would yield a 2x time-compressed semantic prompt
    misaligned with the mel prompt (review r3)."""
    from covomix_tpu.audio import load_wav

    d = os.path.join(args.fixtures, "input_wav")
    if not os.path.isdir(d):
        return []
    out = []
    for f in sorted(os.listdir(d))[:max_files]:
        if f.endswith(".wav"):
            wav, _ = load_wav(os.path.join(d, f), sr=sr)
            out.append((f, wav))
    return out


# ---------------------------------------------------------------------------
# stage 3: end-to-end synthesis on fixture-derived prompts


def _load_npz_model(path, cfg_cls):
    """Converted-.npz -> (params, cfg) with the JSON-sidecar config coerced
    back into the dataclass (lists -> tuples, unknown keys dropped)."""
    from covomix_tpu.checkpoint import io as cio

    params = cio.load_params(path)
    meta = cio.load_meta(path)
    fields = {f.name for f in dataclasses.fields(cfg_cls)}
    cfg = cfg_cls(**{k: (tuple(tuple(x) if isinstance(x, list) else x for x in v)
                         if isinstance(v, list) else v)
                     for k, v in meta.get("config", {}).items() if k in fields})
    return params, cfg


def _e2e_prompt(args, npz: dict, mel_cfg):
    """Fixture-derived (fname, semantic tokens [n], mel prompt [n, 80]).

    Prompt prep contract (monologue_generation.py:82-90): wav -> mel; semantic
    codes from the converted hubert when available (16 kHz input so the 50 Hz
    token stream lines up 1:1 with 8 kHz/hop-160 mel frames), else silence."""
    import numpy as np
    import jax.numpy as jnp

    from covomix_tpu.audio import mel_spectrogram
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import hubert as H
    from covomix_tpu.pipeline import SILENCE_TOKEN

    wavs = _fixture_wavs(args, max_files=1)
    wavs16 = _fixture_wavs(args, max_files=1, sr=16000)
    if wavs:
        fname, wav = wavs[0]
        wav = wav[: 8000 * 4]
        wav16 = wavs16[0][1][: 16000 * 4]
    else:
        fname = "synthetic"
        rs = np.random.RandomState(args.seed)
        wav = rs.randn(8000 * 2).astype(np.float32) * 0.05
        wav16 = np.repeat(wav, 2)
    mel_prompt = np.asarray(mel_spectrogram(jnp.asarray(wav[None]), mel_cfg))[0].T
    if "hubert" in npz:
        hp = cio.load_params(npz["hubert"])
        codes = np.asarray(H.wav2units(hp, H.HubertConfig(), wav16))
    else:
        codes = np.full((len(mel_prompt),), SILENCE_TOKEN, np.int64)
    n = min(len(codes), len(mel_prompt), 400)
    return fname, codes[:n].astype(np.int64), mel_prompt[:n]


def run_e2e(args, npz: dict, rep: Report, *, comix: bool):
    import numpy as np
    import jax

    from covomix_tpu.audio import MelConfig, save_wav
    from covomix_tpu.data.tokenizer import load_covomix_tokenizer
    from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V
    from covomix_tpu.pipeline import Synthesizer

    name = "covomix" if comix else "covosingle"
    t2s_key = "comix_t2s" if comix else "t2s"
    ac_key = "comix_acoustic" if comix else "acoustic"
    if t2s_key not in npz or ac_key not in npz or "vocoder" not in npz:
        rep.add(f"e2e/{name}", "SKIP", reason=f"missing {t2s_key}/{ac_key}/vocoder checkpoint")
        return

    t2s_params, t2s_cfg = _load_npz_model(npz[t2s_key], T.T2SConfig)
    ac_params, ac_cfg = _load_npz_model(npz[ac_key], A.AcousticConfig)
    voc_params, voc_cfg = _load_npz_model(npz["vocoder"], V.VocoderConfig)
    # strict=False: without --bert_vocab the e2e stage still runs the full
    # numerical cascade on the fallback vocab (stand-in harness); pass
    # --bert_vocab for checkpoint-compatible text ids on real assets
    tok = load_covomix_tokenizer(args.bert_vocab, strict=False)
    mel_cfg = MelConfig(sample_rate=voc_cfg.sampling_rate)
    synth = Synthesizer(t2s_params, t2s_cfg, ac_params, ac_cfg, voc_params, voc_cfg,
                        tok, mel_cfg=mel_cfg, t2s_max_length=args.t2s_max_length)

    fname, sem_prompt, mel_prompt = _e2e_prompt(args, npz, mel_cfg)

    text = args.text
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    if comix:
        k1, k2 = jax.random.split(key)
        s1, s2 = synth.text_to_tokens_2stream(text, k1)
        wav_out = synth.synthesize_two_stream(
            np.concatenate([sem_prompt, s1]), np.concatenate([sem_prompt, s2]),
            np.concatenate([mel_prompt, mel_prompt], axis=-1), len(sem_prompt), k2)
    else:
        wav_out = synth.synthesize_turn(text, sem_prompt, mel_prompt, key)
    dt = time.time() - t0
    wav_out = np.asarray(wav_out)
    dur = len(wav_out) / voc_cfg.sampling_rate
    dst = os.path.join(args.out_dir, f"{name}_{os.path.splitext(fname)[0]}.wav")
    save_wav(dst, wav_out, voc_cfg.sampling_rate)
    # fail on numerical breakage (NaN/empty/silence), not on decode length —
    # how many tokens the AR decoder emits before EOS is the model's call
    ok = (len(wav_out) > 0 and np.isfinite(wav_out).all()
          and float(np.abs(wav_out).max()) > 1e-6)
    rep.add(f"e2e/{name}", "PASS" if ok else "FAIL",
            dur_s=f"{dur:.2f}", wall_s=f"{dt:.1f}", out=dst)
    # config.txt provenance (monologue_generation.py:395-399)
    with open(os.path.join(args.out_dir, "config.txt"), "a") as f:
        f.write(f"{name}: t2s={npz[t2s_key]} acoustic={npz[ac_key]} "
                f"vocoder={npz['vocoder']} seed={args.seed}\n")


# ---------------------------------------------------------------------------
# stage 4: fused single-jit serving path on the converted checkpoints


def run_e2e_fused(args, npz: dict, rep: Report, *, comix: bool):
    """Prove the PRODUCTION serving path on these weights, not just the
    per-file one: the same prompt/text runs through serving.BatchedPipeline
    with fused=True (whole cascade as ONE jitted program — the default,
    serving.py:59) and fused=False (three staged programs), and the MCD
    between the two wavs' mels must be <= --mcd_budget. A mixed-length B=2
    batch (full prompt + a 2/3-truncated one) exercises the per-row
    left-packing that the per-file path never touches."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from covomix_tpu.audio import MelConfig, mel_spectrogram
    from covomix_tpu.data.tokenizer import load_covomix_tokenizer
    from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V
    from covomix_tpu.serving import BatchedPipeline
    from covomix_tpu.util.metrics import mcd
    from covomix_tpu.util.misc import round_up

    name = "covomix" if comix else "covosingle"
    t2s_key = "comix_t2s" if comix else "t2s"
    ac_key = "comix_acoustic" if comix else "acoustic"
    if t2s_key not in npz or ac_key not in npz or "vocoder" not in npz:
        rep.add(f"serve_fused/{name}", "SKIP",
                reason=f"missing {t2s_key}/{ac_key}/vocoder checkpoint")
        return

    t2s_params, t2s_cfg = _load_npz_model(npz[t2s_key], T.T2SConfig)
    ac_params, ac_cfg = _load_npz_model(npz[ac_key], A.AcousticConfig)
    voc_params, voc_cfg = _load_npz_model(npz["vocoder"], V.VocoderConfig)
    mel_cfg = MelConfig(sample_rate=voc_cfg.sampling_rate)
    _, sem_prompt, mel_prompt = _e2e_prompt(args, npz, mel_cfg)

    tok = load_covomix_tokenizer(args.bert_vocab, strict=False)
    ids, _ = tok.batch_encode([args.text, args.text])
    s = round_up(max(ids.shape[1], 1), 16)
    text_ids = np.pad(np.asarray(ids), ((0, 0), (0, s - ids.shape[1])))

    # B=2 mixed prompt lengths: row 1 truncated to 2/3 (pad rows to pmax with
    # the same values the pipeline masks out past prompt_lens)
    pmax = len(sem_prompt)
    plens = np.array([pmax, max(1, (2 * pmax) // 3)], np.int32)
    prompt_tokens = np.stack([sem_prompt, sem_prompt]).astype(np.int32)
    cond_dim = ac_cfg.dim_in
    pm = mel_prompt if cond_dim == mel_prompt.shape[-1] else np.concatenate(
        [mel_prompt, mel_prompt], axis=-1)  # VoMix 160-d two-channel cond
    prompt_mels = np.stack([pm, pm]).astype(np.float32)

    kw = dict(t2s_params=t2s_params, t2s_cfg=t2s_cfg,
              acoustic_params=ac_params, acoustic_cfg=ac_cfg,
              vocoder_params=voc_params, vocoder_cfg=voc_cfg,
              decode_len=args.t2s_max_length, min_length=8)
    key = jax.random.PRNGKey(args.seed)
    t0 = time.time()
    wav_f, gen_f = BatchedPipeline(fused=True, **kw)(
        key, text_ids, prompt_tokens, prompt_mels, plens)
    t_fused = time.time() - t0
    t0 = time.time()
    wav_s, gen_s = BatchedPipeline(fused=False, **kw)(
        key, text_ids, prompt_tokens, prompt_mels, plens)
    t_staged = time.time() - t0

    wav_f, wav_s = np.asarray(wav_f, np.float32), np.asarray(wav_s, np.float32)
    lens_f = np.asarray(jnp.minimum(gen_f.lengths, gen_f.lengths2) if comix else gen_f.lengths)
    lens_s = np.asarray(jnp.minimum(gen_s.lengths, gen_s.lengths2) if comix else gen_s.lengths)
    tokens_match = bool(np.array_equal(np.asarray(gen_f.tokens), np.asarray(gen_s.tokens))
                        and np.array_equal(lens_f, lens_s))
    worst = 0.0
    for i in range(wav_f.shape[0]):
        n = int(lens_f[i]) * mel_cfg.hop_size
        if n <= 0 or not tokens_match:
            continue
        mf = np.asarray(mel_spectrogram(jnp.asarray(wav_f[i, :n][None]), mel_cfg))[0].T
        ms = np.asarray(mel_spectrogram(jnp.asarray(wav_s[i, :n][None]), mel_cfg))[0].T
        worst = max(worst, mcd(ms, mf))
    ok = (tokens_match and np.isfinite(wav_f).all() and lens_f.min() > 0
          and float(np.abs(wav_f).max()) > 1e-6 and worst <= args.mcd_budget)
    rep.add(f"serve_fused/{name}", "PASS" if ok else "FAIL",
            tokens_match=tokens_match, mcd_fused_vs_staged_db=f"{worst:.4f}",
            mcd_budget=args.mcd_budget, gen_lens=lens_f.tolist(),
            fused_wall_s=f"{t_fused:.1f}", staged_wall_s=f"{t_staged:.1f}")


# ---------------------------------------------------------------------------


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    p.add_argument("--t2s_ckpt", default=None, help="cosingle T2S PL .ckpt (or .npz)")
    p.add_argument("--acous_ckpt", default=None, help="covosingle acoustic PL .ckpt (or .npz)")
    p.add_argument("--comix_t2s_ckpt", default=None, help="CoMix two-output T2S .ckpt")
    p.add_argument("--comix_acous_ckpt", default=None, help="VoMix two-stream acoustic .ckpt")
    p.add_argument("--hifigan_ckpt", default=None, help="g_<step> generator ckpt (or .npz)")
    p.add_argument("--vocoder_config", default=None, help="vocoder_config.json (default: beside ckpt)")
    p.add_argument("--hubert_pt", default=None, help="fairseq hubert_fisher.pt (or .npz)")
    p.add_argument("--km", default=None, help="k-means .bin for hubert")
    p.add_argument("--bert_vocab", default=None, help="bert-base-uncased vocab.txt")
    p.add_argument("--fixtures", default="/root/reference/hifi-gan/hifigan_test",
                   help="hifigan_test fixture dir (input_mel/ input_wav/)")
    p.add_argument("--reference", default=os.environ.get("COVOMIX_REFERENCE", "/root/reference"),
                   help="reference repo for torch-side execution")
    p.add_argument("--out_dir", default="verify_out")
    p.add_argument("--seed", type=int, default=30)
    p.add_argument("--atol", type=float, default=2e-3,
                   help="max|Δ| budget for field-eval / logits parity (f32 HIGHEST)")
    p.add_argument("--mcd_budget", type=float, default=0.1,
                   help="vocoder-stage MCD budget in dB")
    p.add_argument("--no-ema", action="store_true", help="use raw (non-EMA) weights")
    p.add_argument("--max_fixture_files", type=int, default=4)
    p.add_argument("--max_fixture_frames", type=int, default=400)
    p.add_argument("--t2s_max_length", type=int, default=512)
    p.add_argument("--text", default="hello this is a checkpoint verification run")
    p.add_argument("--skip_parity", action="store_true", help="conversion + e2e only")
    p.add_argument("--skip_e2e", action="store_true", help="conversion + parity only")
    p.add_argument("--cpu", action="store_true",
                   help="force the CPU backend (jax.config override; the "
                        "JAX_PLATFORMS env var is ignored by this jax build)")
    args = p.parse_args(argv)

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    os.makedirs(args.out_dir, exist_ok=True)
    rep = Report()
    from covomix_tpu.util.reference_compat import reference_available

    torch_ok = reference_available(args.reference)

    npz = convert_all(args, rep)

    if not args.skip_parity:
        if torch_ok:
            for nm, (npz_key, ck) in {"acoustic": ("acoustic", args.acous_ckpt),
                                      "comix_acoustic": ("comix_acoustic", args.comix_acous_ckpt)}.items():
                if ck and not ck.endswith(".npz"):
                    parity_acoustic(args, npz[npz_key], ck, rep, name=nm)
            for nm, (npz_key, ck) in {"t2s": ("t2s", args.t2s_ckpt),
                                      "comix_t2s": ("comix_t2s", args.comix_t2s_ckpt)}.items():
                if ck and not ck.endswith(".npz"):
                    parity_t2s(args, npz[npz_key], ck, rep, name=nm)
            if args.hifigan_ckpt and not args.hifigan_ckpt.endswith(".npz"):
                parity_vocoder(args, npz["vocoder"], args.hifigan_ckpt, rep)
        else:
            rep.add("parity", "SKIP", reason=f"reference repo not found at {args.reference}")
    if "hubert" in npz:
        check_hubert(args, npz["hubert"], rep)

    if not args.skip_e2e:
        run_e2e(args, npz, rep, comix=False)
        if args.comix_t2s_ckpt and args.comix_acous_ckpt:
            run_e2e(args, npz, rep, comix=True)
        # production (fused single-jit) serving path on the same weights
        run_e2e_fused(args, npz, rep, comix=False)
        if args.comix_t2s_ckpt and args.comix_acous_ckpt:
            run_e2e_fused(args, npz, rep, comix=True)

    report_path = os.path.join(args.out_dir, "verify_report.json")
    with open(report_path, "w") as f:
        json.dump({"stages": rep.stages, "failed": len(rep.failed)}, f, indent=1)
    n_fail = len(rep.failed)
    print(f"\n{len(rep.stages)} stages, {n_fail} failed -> {report_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
