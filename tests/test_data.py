"""Data pipeline: tokenizer, datasets on synthetic on-disk fixtures, collate."""

import os

import numpy as np
import pytest

from covomix_tpu.data.tokenizer import WordPieceTokenizer, COVOMIX_ADDED_TOKENS, remove_punctuation
from covomix_tpu.data.datasets import CoVoMixDataset, collate_acoustic, collate_t2s, data_loader


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    """Tiny real-format vocab exercising the WordPiece path."""
    words = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "hello", "world", "play", "##ing", "##ed", "un", "##believ", "##able",
             "a", "b", "c", "'", "the"]
    p = tmp_path_factory.mktemp("tok") / "vocab.txt"
    p.write_text("\n".join(words))
    return str(p)


def test_wordpiece_matches_hf_bert(vocab_file):
    """Parity with transformers.BertTokenizer on the same vocab (offline)."""
    from transformers import BertTokenizer

    hf = BertTokenizer(vocab_file=vocab_file, do_lower_case=True)
    hf.add_tokens(COVOMIX_ADDED_TOKENS)
    mine = WordPieceTokenizer(vocab_file, added_tokens=COVOMIX_ADDED_TOKENS)
    texts = [
        "hello world",
        "playing played plays",
        "unbelievable",
        "hello [laughter] world [spkchange] the playing",
        "the 'a' b c",
    ]
    for t in texts:
        ref = hf(t).input_ids
        got = mine.encode(t)
        assert got == ref, f"{t!r}: {got} != {ref}"


def test_batch_encode_padding(vocab_file):
    tok = WordPieceTokenizer(vocab_file, added_tokens=COVOMIX_ADDED_TOKENS)
    ids, mask = tok.batch_encode(["hello", "hello world the"])
    assert ids.shape == mask.shape
    assert mask[0].sum() < mask[1].sum()
    assert (ids[0][~mask[0]] == tok.pad_id).all()


def test_tokenizer_strict_refuses_fallback(vocab_file, monkeypatch):
    """strict=True raises instead of building the checkpoint-incompatible
    char-fallback tokenizer (the silent-garbage trap: fallback ids decode
    garbage through any T2S checkpoint trained on the real vocab); with a
    real vocab file, strict succeeds."""
    from covomix_tpu.data.tokenizer import load_covomix_tokenizer

    monkeypatch.delenv("COVOMIX_BERT_VOCAB", raising=False)
    monkeypatch.setenv("HOME", "/nonexistent_home")  # hide any HF cache
    with pytest.raises(FileNotFoundError, match="fallback"):
        load_covomix_tokenizer(None, strict=True)
    tok = load_covomix_tokenizer(vocab_file, strict=True)
    assert tok.encode("hello world")
    # non-strict keeps the warning-only legacy behavior
    with pytest.warns(UserWarning, match="fallback"):
        load_covomix_tokenizer(None, strict=False)


def test_remove_punctuation_keeps_special_tokens():
    out = remove_punctuation("Hello, World! [spkchange] what's up?")
    assert "," not in out and "!" not in out and "'" not in out
    assert "[spkchange]" in out


@pytest.fixture(scope="module")
def fisher_dir(tmp_path_factory):
    """Synthetic Fisher-style corpus (fairseq dummy-data pattern, tests/utils.py)."""
    root = tmp_path_factory.mktemp("fisher")
    rs = np.random.RandomState(0)
    for i in range(4):
        T = 120 + 40 * i
        np.save(root / f"utt{i}.mel.npy", rs.randn(80, T).astype(np.float32))
        # string-array codes, like the reference extraction CLI writes
        codes = rs.randint(0, 500, T).astype(str)
        np.save(root / f"utt{i}.hubert_code.npy", codes)
        (root / f"utt{i}.txt").write_text(f"synthetic text number {i}")
    return str(root)


def test_hubert_fisher_dataset(fisher_dir):
    ds = CoVoMixDataset(fisher_dir, format="hubert_fisher", max_len=100)
    assert len(ds) == 4
    item = ds[0]
    assert item["x"].shape[1] == 80
    assert item["x"].shape[0] == len(item["phonemes"]) == len(item["mask"]) <= 100
    batch = collate_acoustic([ds[i] for i in range(3)], bucket=32)
    assert batch["x"].shape[0] == 3 and batch["x"].shape[1] % 32 == 0
    assert batch["phonemes"].dtype == np.int32
    # pad values
    lens = [len(ds[i]["mask"]) for i in range(3)]
    assert (batch["x"][0, max(lens):] == -15.0).all() or batch["x"].shape[1] == max(lens)


def test_t2s_dataset_and_collate(fisher_dir, vocab_file):
    ds = CoVoMixDataset(fisher_dir, format="text2semantic")
    item = ds[0]
    assert isinstance(item["text"], str) and item["semantic"].ndim == 1
    tok = WordPieceTokenizer(vocab_file, added_tokens=COVOMIX_ADDED_TOKENS)
    batch = collate_t2s([ds[0], ds[1]], tok)
    assert batch["text_ids"].shape[0] == 2
    assert batch["semantic_ids"].shape[0] == 2
    assert (batch["semantic_ids"] <= 501).all()


def test_t2s_2output_augmentation(fisher_dir, vocab_file):
    ds = CoVoMixDataset(fisher_dir, format="text2semantic_2output", seed=3)
    seen_shapes = set()
    for i in range(4):
        item = ds[i]
        assert item["semantic"].ndim == 2 and item["semantic"].shape[1] == 2
        seen_shapes.add(item["semantic"].shape[0])
    # silence-token padding present in the single-speaker cases
    vals = np.unique(ds[0]["semantic"])
    assert 157 in vals or len(vals) > 0


def test_data_loader_yields_static_batches(fisher_dir):
    ds = CoVoMixDataset(fisher_dir, format="hubert_fisher", max_len=100)
    loader = data_loader(ds, 2, lambda items: collate_acoustic(items, bucket=128), seed=1)
    b1, b2 = next(loader), next(loader)
    assert b1["x"].shape == b2["x"].shape  # bucketed to the same static shape


def test_compress_token_runs():
    """Run-length compression matches the reference's compress_sequence /
    compress_tensor_sequence semantics (data_module.py:162-193): per-stream
    unique runs + counts, streams padded to equal length with 501 / 0."""
    from covomix_tpu.data.datasets import compress_token_runs

    u, d = compress_token_runs(np.array([7, 7, 7, 3, 3, 9]))
    np.testing.assert_array_equal(u[:, 0], [7, 3, 9])
    np.testing.assert_array_equal(d[:, 0], [3, 2, 1])
    assert int(d.sum()) == 6

    # two streams of different compressed lengths: shorter padded 501/0
    two = np.stack([[5, 5, 5, 5], [1, 2, 2, 3]], axis=1)
    u, d = compress_token_runs(two)
    np.testing.assert_array_equal(u[:, 0], [5, 501, 501])
    np.testing.assert_array_equal(d[:, 0], [4, 0, 0])
    np.testing.assert_array_equal(u[:, 1], [1, 2, 3])
    np.testing.assert_array_equal(d[:, 1], [1, 2, 1])

    u, d = compress_token_runs(np.zeros((0,), np.int64))
    assert u.shape == (0, 1) and d.shape == (0, 1)


def test_collate_t2s_duration(fisher_dir, vocab_file):
    from covomix_tpu.data.tokenizer import WordPieceTokenizer, COVOMIX_ADDED_TOKENS
    from covomix_tpu.data.datasets import CoVoMixDataset, collate_t2s_duration

    tok = WordPieceTokenizer(vocab_file, added_tokens=COVOMIX_ADDED_TOKENS)
    ds = CoVoMixDataset(str(fisher_dir), format="text2semantic")
    batch = collate_t2s_duration([ds[0], ds[1]], tok, bucket=8)
    assert batch["semantic_ids"].shape == batch["durations"].shape
    assert batch["semantic_ids"].ndim == 2  # single stream squeezed
    # durations of non-pad rows reconstruct the original lengths
    for i, it in enumerate([ds[0], ds[1]]):
        assert int(batch["durations"][i].sum()) == len(it["semantic"])


@pytest.fixture(scope="module")
def overlap_dir(tmp_path_factory):
    """Dialogue corpus with per-channel -A/-B mels; the parent directory name
    deliberately contains '-B' (regression: the file filter must check
    basenames, not path substrings). Mixed base mels exist for dialogues 0-1
    only — two_input_two_output must not require them."""
    root = tmp_path_factory.mktemp("fisher-B-corpus")
    rs = np.random.RandomState(1)
    for i in range(3):
        T = 100 + 20 * i
        for ch in ("A", "B"):
            np.save(root / f"dlg{i}-{ch}.mel.npy", rs.randn(80, T).astype(np.float32))
            np.save(root / f"dlg{i}-{ch}-16k.hubert_code.npy", rs.randint(0, 500, T).astype(str))
        if i < 2:
            np.save(root / f"dlg{i}.mel.npy", rs.randn(80, T).astype(np.float32))
    return str(root)


def test_two_input_two_output_dataset(overlap_dir):
    """File list = channel-stripped base names derived from -A mels (the
    mixed mel need not exist); items stack both channels."""
    ds = CoVoMixDataset(overlap_dir, format="hubert_overlap_two_input_two_output", max_len=80)
    assert len(ds) == 3
    for i in range(3):
        item = ds[i]
        assert item["x"].shape[1] == 160            # [mel_A | mel_B]
        assert item["phonemes"].shape[1] == 2
        assert len(item["mask"]) == item["x"].shape[0]


def test_two_input_one_output_dataset(overlap_dir):
    """one_output items additionally carry the mixed mel (the training
    target), so the list keeps only dialogues whose mixed base mel exists;
    the '-B' directory name must not filter the list to empty."""
    ds = CoVoMixDataset(overlap_dir, format="hubert_overlap_two_input_one_output", max_len=80)
    assert len(ds) == 2   # dlg2 lacks the mixed mel on disk
    for i in range(2):
        item = ds[i]
        assert item["x"].shape[1] == 240           # [A | B | mixed]
        assert item["phonemes"].shape[1] == 2


def test_t2s_2output_short_pool_excludes_pair_files(fisher_dir, tmp_path):
    """The 20% synthetic 2-speaker branch must never draw a _1/_2 pair file
    (read_txt would open a nonexistent 'xxx_1.txt')."""
    import shutil

    root = tmp_path / "mix"
    shutil.copytree(fisher_dir, root)
    rs = np.random.RandomState(2)
    codes = rs.randint(0, 500, 50).astype(str)
    np.save(root / "pair_1.hubert_code.npy", codes)
    np.save(root / "pair_2.hubert_code.npy", codes)
    (root / "pair.txt").write_text("a pair dialogue")
    ds = CoVoMixDataset(str(root), format="text2semantic_2output", seed=0)
    assert any(f.endswith("pair_1.hubert_code.npy") for f in ds.files)
    assert not any(os.path.basename(f).endswith("_1.hubert_code.npy") for f in ds.short_files)
    # every item constructible regardless of the augmentation draw
    for i in range(len(ds)):
        for _ in range(6):   # multiple draws hit all three branches
            item = ds[i]
            assert item["semantic"].shape[1] == 2
