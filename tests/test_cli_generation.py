"""End-to-end CLI tests: run monologue_generation.py / dialogue_generation.py
as subprocesses on tiny random checkpoints and reference-convention fixture
files (the fairseq test_binaries pattern, SURVEY §4: tiny models through the
real CLI on generated data)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def tiny_assets(tmp_path_factory):
    from covomix_tpu.audio import save_wav
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V

    root = tmp_path_factory.mktemp("cli")
    key = jax.random.PRNGKey(0)

    t2s_cfg = T.T2SConfig(num_text_tokens=512, num_semantic_tokens=502, dim=32,
                          source_depth=1, target_depth=1, heads=2, dim_head=16,
                          two_output=True, target_dim=32)
    cio.save_params(str(root / "t2s.npz"), T.init(key, t2s_cfg),
                    meta={"config": t2s_cfg.__dict__, "kind": "t2s"})

    # VoMix (2-stream, covosinx/covomix) and VoSingle (covosingle) variants
    ac_cfg = A.AcousticConfig(dim_in=160, dim=32, depth=2, heads=2, dim_head=16,
                              dim_phoneme_emb=16, num_phoneme_tokens=502, mode="two_one")
    cio.save_params(str(root / "acoustic.npz"), A.init(jax.random.fold_in(key, 1), ac_cfg),
                    meta={"config": ac_cfg.__dict__, "kind": "acoustic"})
    acs_cfg = A.AcousticConfig(dim_in=80, dim=32, depth=2, heads=2, dim_head=16,
                               dim_phoneme_emb=16, num_phoneme_tokens=502, mode="single")
    cio.save_params(str(root / "acoustic_single.npz"), A.init(jax.random.fold_in(key, 3), acs_cfg),
                    meta={"config": acs_cfg.__dict__, "kind": "acoustic"})

    voc_cfg = V.VocoderConfig(upsample_initial_channel=32)
    cio.save_params(str(root / "vocoder.npz"), V.init_generator(jax.random.fold_in(key, 2), voc_cfg),
                    meta={"config": voc_cfg.__dict__, "kind": "vocoder"})

    # fixture files per the reference conventions: <name>.txt scripts +
    # <name>(.|_1.|_2.).hubert_code.npy prompts with sibling .wav
    texts = root / "texts"
    prompts = root / "prompts"
    texts.mkdir()
    prompts.mkdir()
    (texts / "utt1.txt").write_text("hello world this is a test")
    rng = np.random.RandomState(0)
    for stem in ("utt1", "utt1_1", "utt1_2"):
        codes = rng.randint(0, 500, size=30).astype(str)  # string array (reference quirk)
        np.save(str(prompts / f"{stem}.hubert_code.npy"), codes)
        save_wav(str(prompts / f"{stem}.wav"), rng.randn(30 * 160).astype(np.float32) * 0.05, 8000)
    return root


def _run(script, args, cwd):
    env = dict(os.environ, COVOMIX_FORCE_CPU="1")
    # random-weight smoke checkpoints: the char-fallback vocab is fine here,
    # and the CLIs now refuse it without this flag (checkpoint-garbage trap)
    return subprocess.run([sys.executable, os.path.join(REPO, script)] + args
                          + ["--allow_fallback_vocab"],
                          capture_output=True, text=True, timeout=900, env=env, cwd=cwd)


@pytest.mark.parametrize("mode", ["covosingle", "covomix"])
def test_monologue_cli(tiny_assets, mode, tmp_path):
    out = tmp_path / f"out_{mode}"
    acous = "acoustic_single.npz" if mode == "covosingle" else "acoustic.npz"
    r = _run("monologue_generation.py", [
        "--t2s_ckpt", str(tiny_assets / "t2s.npz"),
        "--acous_ckpt", str(tiny_assets / acous),
        "--hifigan_ckpt", str(tiny_assets / "vocoder.npz"),
        "--text_dir", str(tiny_assets / "texts"),
        "--prompt_dir", str(tiny_assets / "prompts"),
        "--saved_dir", str(out), "--mode", mode], cwd=str(tiny_assets))
    assert r.returncode == 0, r.stderr[-2000:]
    wav = out / "utt1.wav"
    assert wav.exists(), f"no wav written; stdout={r.stdout[-500:]}"
    assert (out / "config.txt").exists()
    from covomix_tpu.audio import load_wav

    w, sr = load_wav(str(wav))
    assert sr == 8000 and len(w) > 0 and np.isfinite(w).all()


def test_dialogue_cli_covomix(tiny_assets, tmp_path):
    texts = tmp_path / "dtexts"
    texts.mkdir()
    (texts / "utt1.txt").write_text("hi there [spkchange] hello back")
    out = tmp_path / "dout"
    r = _run("dialogue_generation.py", [
        "--t2s_ckpt", str(tiny_assets / "t2s.npz"),
        "--acous_ckpt", str(tiny_assets / "acoustic.npz"),
        "--hifigan_ckpt", str(tiny_assets / "vocoder.npz"),
        "--text_dir", str(texts),
        "--prompt_dir", str(tiny_assets / "prompts"),
        "--saved_dir", str(out), "--mode", "covomix"], cwd=str(tiny_assets))
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "utt1.wav").exists(), r.stdout[-500:]
