"""Oracle prompt-pairing helpers + file-level eval variants
(online_feature_extraction.py:217-324, util/inference.py:32-227)."""

import os
import random

import numpy as np
import jax
import pytest

from covomix_tpu.data import oracle
from covomix_tpu.models import acoustic as A
from covomix_tpu.train import evaluate as E

TINY = A.AcousticConfig(dim_in=80, dim=32, depth=2, heads=2, dim_head=16,
                        dim_phoneme_emb=16, num_phoneme_tokens=502)
TINY_MIX = A.AcousticConfig(dim_in=160, dim=32, depth=2, heads=2, dim_head=16,
                            dim_phoneme_emb=16, num_phoneme_tokens=502, mode="two_one")


def _write_utt(d, name, frames, with_streams=False, seed=0):
    rng = np.random.RandomState(seed)
    base = os.path.join(d, name)
    np.save(base + ".mel.npy", rng.randn(80, frames).astype(np.float32))
    np.save(base + ".hubert_code.npy", rng.randint(0, 500, frames).astype(str))
    if with_streams:
        for suf in ("-A", "-B"):
            np.save(base + suf + ".mel.npy", rng.randn(80, frames).astype(np.float32))
            np.save(base + suf + "-16k.hubert_code.npy", rng.randint(0, 500, frames).astype(str))
    return base + ".mel.npy"


@pytest.fixture
def mel_dir(tmp_path):
    files = []
    for spk in ("fe_03_00001", "fe_03_00002"):
        for k in range(3):
            files.append(_write_utt(str(tmp_path), f"{spk}-{k:02d}", 400 + 30 * k,
                                    with_streams=True, seed=hash((spk, k)) % 1000))
    return sorted(files)


def test_choose_prompt_prefers_same_speaker(mel_dir):
    rng = random.Random(0)
    for i in range(len(mel_dir)):
        j = oracle.choose_prompt(mel_dir, i, rng)
        spk_i = os.path.basename(mel_dir[i]).split("-")[0]
        spk_j = os.path.basename(mel_dir[j]).split("-")[0]
        assert spk_i == spk_j  # small fixture: a same-spk neighbor always exists


def test_oracle_example_shapes_and_mask(mel_dir):
    rng = random.Random(1)
    mel, codes, mask = oracle.prepare_oracle_example_with_prompt(mel_dir, 2, rng=rng)
    assert mel.shape[0] == codes.shape[0] == mask.shape[0]
    assert mel.shape[1] == 80
    # prompt region (mask False) comes first, 100-200 frames
    p = int(np.argmax(mask)) if mask.any() else 0
    assert 100 <= p <= 200
    assert not mask[:p].any() and mask[p:].all()


def test_two_stream_example_same_file_pairs_b_channel(mel_dir):
    path_a = mel_dir[0].replace(".mel.npy", "-A.mel.npy")
    mel2, codes2, mixed = oracle.load_two_stream_example(path_a)
    assert mel2.shape[1] == 160
    assert codes2.shape[-1] == 2
    # mixed GT is the base '<utt>.mel.npy'
    assert mixed is not None and mixed.shape[1] == 80


def test_evaluate_acoustic_files_runs(mel_dir):
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(0), TINY)
    out = E.evaluate_acoustic_files(params, TINY, mel_dir, 2, jax.random.PRNGKey(1),
                                    cond_scale=1.0, bucket=128)
    assert np.isfinite(out["l2"]) and out["l2"] > 0


def test_evaluate_two_one_files_runs(mel_dir):
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(2), TINY_MIX)
    out = E.evaluate_acoustic_two_one_files(params, TINY_MIX, mel_dir, 2, jax.random.PRNGKey(3),
                                            cond_scale=1.0, bucket=128)
    assert np.isfinite(out["l2"]) and out["l2"] > 0


def test_evaluate_t2s_files_runs(tmp_path):
    """File-level T2S WER eval (inference.py:287-358): .txt sibling lookup,
    no-prompt decode, 501-padded WER."""
    from covomix_tpu.data.tokenizer import COVOMIX_ADDED_TOKENS, WordPieceTokenizer
    from covomix_tpu.models import text2semantic as T

    import warnings
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tok = WordPieceTokenizer(None, added_tokens=COVOMIX_ADDED_TOKENS)
    rng = np.random.RandomState(0)
    files = []
    for k in range(3):
        base = os.path.join(str(tmp_path), f"utt{k}")
        np.save(base + "-16k.hubert_code.npy", rng.randint(0, 500, 20 + k).astype(str))
        with open(base + ".txt", "w") as f:
            f.write("hello there [laughter] yes\n")
        files.append(base + "-16k.hubert_code.npy")

    cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                      num_text_tokens=tok.vocab_size, num_semantic_tokens=501)
    params = T.init(jax.random.PRNGKey(0), cfg)
    out = E.evaluate_t2s_files(params, cfg, tok, files, 2, jax.random.PRNGKey(1),
                               max_length=32)
    assert np.isfinite(out["l2"]) and out["l2"] >= 0


def test_evaluate_acoustic_batch_orientation():
    """Reference scores the FIRST 70% (generated) conditioned on the tail
    (inference.py:49-70): check cond is zeroed at the front."""
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(4), TINY)
    x = np.random.RandomState(0).randn(1, 64, 80).astype(np.float32)
    ph = np.zeros((1, 64), np.int32)
    out = E.evaluate_acoustic(params, TINY, [{"x": x, "phonemes": ph}], jax.random.PRNGKey(5),
                              cond_scale=1.0)
    assert np.isfinite(out["l2"])


def test_evaluate_t2s_reports_token_bleu():
    """Batch-level T2S eval includes the corpus token-BLEU diagnostic (the
    native BleuScorer's consumer); a perfect hypothesis scores 100."""
    from covomix_tpu.native import BleuScorer
    from covomix_tpu.models import text2semantic as T

    sc = BleuScorer(pad=-1, eos=-2, unk=-3)
    seq = np.arange(5, 30)
    sc.add(seq, seq)
    assert abs(sc.score() - 100.0) < 1e-9

    cfg = T.T2SConfig(dim=32, source_depth=1, target_depth=1, heads=2, dim_head=16,
                      num_text_tokens=50, num_semantic_tokens=30, target_dim=32)
    params = jax.jit(T.init, static_argnums=1)(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    batches = [{"text_ids": rng.randint(1, 50, (2, 6)),
                "semantic_ids": rng.randint(0, 30, (2, 10))}]
    m = E.evaluate_t2s(params, cfg, batches, jax.random.PRNGKey(1), max_length=12)
    assert 0.0 <= m["token_bleu"] <= 100.0


def test_evaluate_acoustic_per_row_lengths_and_mode():
    """review-r3 regressions for the checkpoint-selection metric:
    (1) bucket padding (-15 rows) must not enter the score — a padded batch
    scores the same as the exact-length batch; (2) two-stream modes use the
    50% first-half-prompt protocol (cond kept on the FIRST half)."""
    params = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(4), TINY)
    rs = np.random.RandomState(1)
    x = rs.randn(1, 48, 80).astype(np.float32)
    ph = np.zeros((1, 48), np.int32)
    key = jax.random.PRNGKey(9)
    exact = E.evaluate_acoustic(params, TINY, [{"x": x, "phonemes": ph}], key, cond_scale=1.0)
    xp = np.full((1, 64, 80), -15.0, np.float32)
    xp[:, :48] = x
    php = np.full((1, 64), 501, np.int32)
    php[:, :48] = ph
    padded = E.evaluate_acoustic(params, TINY, [{"x": xp, "phonemes": php}], key, cond_scale=1.0)
    np.testing.assert_allclose(padded["l2"], exact["l2"], rtol=1e-4)

    # two_one: runs with the 160-d cond split and 50% protocol
    params2 = jax.jit(A.init, static_argnums=1)(jax.random.PRNGKey(5), TINY_MIX)
    x2 = rs.randn(1, 48, 240).astype(np.float32)
    ph2 = np.zeros((1, 48, 2), np.int32)
    out2 = E.evaluate_acoustic(params2, TINY_MIX, [{"x": x2, "phonemes": ph2}],
                               key, cond_scale=1.0)
    assert np.isfinite(out2["l2"])
