"""Synthesizer pipeline: all 3 modes at tiny scale on synthetic fixtures."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from covomix_tpu.audio import MelConfig, save_wav
from covomix_tpu.data.tokenizer import WordPieceTokenizer, COVOMIX_ADDED_TOKENS
from covomix_tpu.models import acoustic as A, text2semantic as T, vocoder as V
from covomix_tpu.pipeline import Synthesizer


@pytest.fixture(scope="module")
def tiny_synths(tmp_path_factory):
    key = jax.random.PRNGKey(0)
    t2s_cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                          num_text_tokens=200, num_semantic_tokens=501, target_dim=32)
    comix_cfg = T.T2SConfig(**{**t2s_cfg.__dict__, "two_output": True})
    vosingle_cfg = A.AcousticConfig(dim_in=80, dim=32, depth=2, heads=2, dim_head=16,
                                    dim_phoneme_emb=16, num_phoneme_tokens=502)
    vomix_cfg = A.AcousticConfig(dim_in=160, dim=32, depth=2, heads=2, dim_head=16,
                                 dim_phoneme_emb=16, num_phoneme_tokens=502, mode="two_one")
    voc_cfg = V.VocoderConfig(upsample_initial_channel=16)
    tok = WordPieceTokenizer(None, added_tokens=COVOMIX_ADDED_TOKENS)

    def mk(t2s, ac):
        return Synthesizer(
            jax.jit(T.init, static_argnums=1)(key, t2s), t2s,
            jax.jit(A.init, static_argnums=1)(key, ac), ac,
            jax.jit(V.init_generator, static_argnums=1)(key, voc_cfg), voc_cfg,
            tok, bucket=32, t2s_max_length=16)

    return mk(t2s_cfg, vosingle_cfg), mk(t2s_cfg, vomix_cfg), mk(comix_cfg, vomix_cfg)


@pytest.fixture(scope="module")
def prompt_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("prompts")
    rs = np.random.RandomState(0)
    for name in ("utt", "dlg_1", "dlg_2"):
        save_wav(str(d / f"{name}.wav"), (rs.randn(8000) * 0.05).astype(np.float32), 8000)
        np.save(str(d / f"{name}.hubert_code.npy"), rs.randint(0, 500, 49).astype(str))
    return str(d)


def test_prepare_prompt_contract(tiny_synths, prompt_dir):
    synth, _, _ = tiny_synths
    sem, mel = synth.prepare_prompt(os.path.join(prompt_dir, "utt.hubert_code.npy"))
    assert len(sem) == len(mel) <= 400
    assert mel.shape[1] == 80
    assert sem.dtype.kind in "iu"  # string array cast to int


def test_monologue_covosingle(tiny_synths, prompt_dir):
    synth, _, _ = tiny_synths
    wav = synth.monologue("covosingle", "hello world", os.path.join(prompt_dir, "utt.hubert_code.npy"), jax.random.PRNGKey(1))
    assert wav.ndim == 1 and len(wav) > 0
    assert np.isfinite(wav).all()


def test_monologue_covosinx(tiny_synths, prompt_dir):
    _, synth, _ = tiny_synths
    wav = synth.monologue("covosinx", "hello world", os.path.join(prompt_dir, "utt.hubert_code.npy"), jax.random.PRNGKey(2))
    assert wav.ndim == 1 and len(wav) > 0


def test_dialogue_covomix(tiny_synths, prompt_dir):
    _, _, synth = tiny_synths
    wav = synth.dialogue("covomix", "hi there [spkchange] hello back",
                         os.path.join(prompt_dir, "dlg_1.hubert_code.npy"),
                         os.path.join(prompt_dir, "dlg_2.hubert_code.npy"), jax.random.PRNGKey(3))
    assert wav.ndim == 1 and len(wav) > 0


def test_dialogue_covosinx_routing(tiny_synths, prompt_dir):
    _, synth, _ = tiny_synths
    wav = synth.dialogue("covosinx", "one [spkchange] two",
                         os.path.join(prompt_dir, "dlg_1.hubert_code.npy"),
                         os.path.join(prompt_dir, "dlg_2.hubert_code.npy"), jax.random.PRNGKey(4))
    assert wav.ndim == 1 and len(wav) > 0


def test_synthesizer_fuse_tail_knob_contract():
    """fuse_tail=True vocodes WITHOUT valid_len masking (allowing the fused
    Pallas tail on TPU): off-TPU the conv path is identical except that
    bucket-pad frames leak into the generator's ~16-frame receptive field, so
    the head of the wav must match the exact path and only the tail may
    differ."""
    import dataclasses as _dc

    import jax
    import jax.numpy as jnp
    import numpy as np

    from covomix_tpu.models import vocoder as V
    from covomix_tpu.pipeline import Synthesizer

    voc_cfg = V.VocoderConfig(upsample_initial_channel=32)
    voc_params = V.init_generator(jax.random.PRNGKey(0), voc_cfg)

    def mk(fuse):
        import functools

        s = Synthesizer.__new__(Synthesizer)  # vocode only needs these fields
        s.vocoder_params, s.vocoder_cfg, s.dtype = voc_params, voc_cfg, jnp.float32
        s.bucket, s.fuse_tail = 64, fuse
        from covomix_tpu.audio import MelConfig

        s.mel_cfg = MelConfig()
        s._voc_fn = jax.jit(functools.partial(V.generator, cfg=voc_cfg, dtype=jnp.float32))
        return s

    mel = np.random.RandomState(0).randn(50, 80).astype(np.float32) * 1.5 - 6.0
    exact = mk(False).vocode(mel)
    fused = mk(True).vocode(mel)
    assert exact.shape == fused.shape == (50 * 160,)
    assert np.isfinite(fused).all()
    # receptive field ~16 mel frames * 160 samples; the head must agree
    head = (50 - 20) * 160
    np.testing.assert_allclose(fused[:head], exact[:head], atol=1e-5)
