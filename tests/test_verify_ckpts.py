"""verify_reference_ckpts.py end-to-end on random-weight stand-ins saved in
the reference checkpoint formats (PL .ckpt with EMA state, {'generator': sd}
HiFi-GAN ckpt + vocoder_config.json sidecar). Proves the one-command
real-checkpoint verification path is runnable the day the released assets
land (monologue_generation.py:323-399 asset inventory).

The hubert branch is exercised separately by test_convert/test_hubert — a
default-shaped (hubert-base, ~95M param) random .pt would dominate the suite's
runtime for no extra coverage.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

from conftest import reference_available, load_reference_covomix

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

pytestmark = pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")


def _ema_state(m):
    """torch_ema-shaped state with identical-clone shadows: exercises the EMA
    selection path while keeping converted == raw weights (dedup by id,
    registration order — torch_ema ExponentialMovingAverage semantics)."""
    seen, shadow = set(), []
    for p in m.parameters():
        if p.requires_grad and id(p) not in seen:
            seen.add(id(p))
            shadow.append(p.detach().clone())
    return {"shadow_params": shadow, "decay": 0.999, "num_updates": 10}


def _save_lightning(path, module, prefix, hp):
    sd = {(prefix + k): v for k, v in module.state_dict().items()}
    torch.save({"state_dict": sd, "hyper_parameters": hp, "ema": _ema_state(module)}, path)


@pytest.fixture(scope="module")
def standin_assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("verify_standins")
    ref_ac, ref_t2s = load_reference_covomix()
    torch.manual_seed(0)

    def _damp(m, factor=0.3):
        """Torch default inits through 64 ODE field evals can blow past f32
        range (inf - inf -> NaN downstream); damping keeps the random-weight
        flow bounded while leaving the parity math untouched."""
        with torch.no_grad():
            for p in m.parameters():
                p.mul_(factor)
        return m

    # covosingle acoustic: hparams only record what conditional_model.py:99-108
    # passes; everything else (dim_phoneme_emb, conv_pos kernel, ff_mult) rides
    # the constructor defaults — exactly like the released checkpoints.
    # num_phoneme_tokens at the real 502 so the silence token (157) is in-vocab.
    ac = _damp(ref_ac.CoVoMix(dim=64, dim_in=80, num_phoneme_tokens=502, depth=2,
                              dim_head=16, heads=2))
    ac.eval()
    _save_lightning(str(root / "acoustic.ckpt"), ac, "cfm_wrapper.CoVoMix.", {
        "text2semantic": False, "CoVoMix_dim": 80, "CoVoMix_dim_transformer": 64,
        "CoVoMix_depth": 2, "CoVoMix_dim_head": 16, "CoVoMix_heads": 2,
        "CoVoMix_num_phoneme_tokens": 502})

    # VoMix two-condition one-output acoustic — the covomix inference variant
    # (monologue_generation.py covomix mode: 160-d cond, 80-d mel out)
    vx = _damp(ref_ac.CoVoMix(dim=64, dim_in=160, num_phoneme_tokens=502, depth=2,
                              dim_head=16, heads=2, twocondition_oneoutput=True))
    vx.eval()
    _save_lightning(str(root / "vomix.ckpt"), vx, "cfm_wrapper.CoVoMix.", {
        "text2semantic": False, "CoVoMix_dim": 160, "CoVoMix_dim_transformer": 64,
        "CoVoMix_depth": 2, "CoVoMix_dim_head": 16, "CoVoMix_heads": 2,
        "CoVoMix_num_phoneme_tokens": 502, "twocondition_oneoutput": True})

    # cosingle T2S (num_text_token_ids at the real BERT size so any tokenizer
    # output stays in-vocab) + CoMix two-output variant
    t2s = ref_t2s.TextToSemantic(dim=48, source_depth=1, target_depth=1,
                                 num_text_token_ids=30528, num_semantic_token_ids=30,
                                 heads=2, target_transformer_dim=48)
    t2s.eval()
    _save_lightning(str(root / "t2s.ckpt"), t2s, "cfm_wrapper.model.", {
        "text2semantic": True, "CoVoMix_dim_transformer": 48,
        "text2semantic_source_depth": 1, "text2semantic_target_depth": 1,
        "text2semantic_head": 2, "num_text_token_ids": 30528,
        "text2semantic_tokens": 30, "target_transformer_dim": 48})
    comix = ref_t2s.TextToSemantic(dim=48, source_depth=1, target_depth=1,
                                   num_text_token_ids=30528, num_semantic_token_ids=30,
                                   heads=2, two_output=True, target_transformer_dim=96)
    comix.eval()
    _save_lightning(str(root / "comix_t2s.ckpt"), comix, "cfm_wrapper.model.", {
        "text2semantic": True, "CoVoMix_dim_transformer": 48,
        "text2semantic_source_depth": 1, "text2semantic_target_depth": 1,
        "text2semantic_head": 2, "num_text_token_ids": 30528,
        "text2semantic_tokens": 30, "text2semantic_two_output": True,
        "target_transformer_dim": 96})

    # HiFi-GAN generator in the released format ({'generator': sd}, weight
    # norm NOT removed) + vocoder_config.json sidecar
    sys.path.insert(0, "/root/reference")
    from covomix.vocoder.models import Generator
    from covomix.vocoder.env import AttrDict

    h = dict(resblock="1", upsample_rates=[5, 4, 4, 2], upsample_kernel_sizes=[8, 8, 4, 4],
             upsample_initial_channel=32, resblock_kernel_sizes=[3, 7, 11],
             resblock_dilation_sizes=[[1, 3, 5]] * 3, num_mels=80, sampling_rate=8000)
    g = Generator(AttrDict(h))
    g.eval()
    torch.save({"generator": g.state_dict()}, str(root / "g_00000001"))
    with open(root / "vocoder_config.json", "w") as f:
        json.dump(h, f)

    # hifigan_test-shaped fixtures: input_mel/*.npy [80, T] + input_wav/*.wav
    from covomix_tpu.audio import save_wav

    (root / "fixtures" / "input_mel").mkdir(parents=True)
    (root / "fixtures" / "input_wav").mkdir(parents=True)
    rng = np.random.RandomState(0)
    for i in range(2):
        mel = (rng.randn(80, 40 + 10 * i).astype(np.float32) * 1.5 - 6.0)
        np.save(str(root / "fixtures" / "input_mel" / f"f{i}.npy"), mel)
    save_wav(str(root / "fixtures" / "input_wav" / "p0.wav"),
             rng.randn(8000).astype(np.float32) * 0.05, 8000)
    return root


def test_verify_script_standins(standin_assets, tmp_path):
    out = tmp_path / "verify_out"
    env = dict(os.environ, COVOMIX_FORCE_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "verify_reference_ckpts.py"),
         "--t2s_ckpt", str(standin_assets / "t2s.ckpt"),
         "--acous_ckpt", str(standin_assets / "acoustic.ckpt"),
         "--comix_t2s_ckpt", str(standin_assets / "comix_t2s.ckpt"),
         "--comix_acous_ckpt", str(standin_assets / "vomix.ckpt"),
         "--hifigan_ckpt", str(standin_assets / "g_00000001"),
         "--vocoder_config", str(standin_assets / "vocoder_config.json"),
         "--fixtures", str(standin_assets / "fixtures"),
         "--out_dir", str(out), "--t2s_max_length", "32", "--atol", "1e-3"],
        capture_output=True, text=True, timeout=1200, env=env, cwd=str(standin_assets))
    assert r.returncode == 0, f"stdout:\n{r.stdout[-3000:]}\nstderr:\n{r.stderr[-3000:]}"

    with open(out / "verify_report.json") as f:
        report = json.load(f)
    assert report["failed"] == 0
    by_stage = {s["stage"]: s["status"] for s in report["stages"]}
    # every advertised stage ran: conversion, both model parities (incl. the
    # CoMix pair), the vocoder MCD headline, and both e2e modes
    for stage in ["convert/t2s", "convert/acoustic", "convert/comix_t2s",
                  "convert/comix_acoustic", "convert/vocoder",
                  "parity/acoustic_field_eval", "parity/comix_acoustic_field_eval",
                  "parity/t2s_logits", "parity/t2s_decode",
                  "parity/comix_t2s_logits", "parity/comix_t2s_decode",
                  "parity/vocoder", "e2e/covosingle", "e2e/covomix",
                  # production fused-serving path proved on the same weights
                  "serve_fused/covosingle", "serve_fused/covomix"]:
        assert by_stage.get(stage) == "PASS", (stage, by_stage)
    # identical-clone EMA shadows: converted weights equal raw ones, so the
    # parity stages above double as an EMA-selection regression check
    assert (out / "config.txt").exists()
    wavs = [f for f in os.listdir(out) if f.endswith(".wav")]
    assert len(wavs) == 2, wavs


def test_verify_script_skip_flags(standin_assets, tmp_path):
    """--skip_parity --skip_e2e = conversion-only mode still writes a report."""
    out = tmp_path / "conv_only"
    env = dict(os.environ, COVOMIX_FORCE_CPU="1")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "verify_reference_ckpts.py"),
         "--acous_ckpt", str(standin_assets / "acoustic.ckpt"),
         "--out_dir", str(out), "--skip_parity", "--skip_e2e"],
        capture_output=True, text=True, timeout=600, env=env)
    assert r.returncode == 0, r.stderr[-2000:]
    with open(out / "verify_report.json") as f:
        report = json.load(f)
    assert report["failed"] == 0 and any(
        s["stage"] == "convert/acoustic" and s["status"] == "PASS" for s in report["stages"])
