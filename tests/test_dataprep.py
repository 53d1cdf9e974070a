"""Fisher data preparation: transcript parsing, turn merging, segmentation."""

import os

import numpy as np
import pytest
from scipy.io import wavfile

import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data_preparation"))

from prepare_fisher import (merge_turns, normalize_text, parse_transcript,
                            process_conversation_file, process_monologue_file)


def test_normalize_text():
    out = normalize_text("Hello, World! [laughter] (AND) [noise] 'quoted' mp3")
    assert "," not in out and "(" not in out
    assert "[laughter]" in out
    assert "[noise]" not in out
    assert "quoted" in out and "'" not in out
    assert "m p three" in out


def test_merge_turns_spkchange():
    utts = [(0.0, 1.0, "A", "hi there"), (1.2, 2.0, "B", "hello"), (2.1, 3.0, "B", "yes"), (3.2, 4.0, "A", "ok")]
    txt = merge_turns(utts)
    assert txt == "hi there [spkchange] hello yes [spkchange] ok"


@pytest.fixture
def fisher_pair(tmp_path):
    trans = tmp_path / "fe_03_00001.txt"
    trans.write_text(
        "# header comment\n"
        "\n"
        "0.00 2.00 A: hello how are you\n"
        "2.50 4.00 B: i am fine thanks\n"
        "3.80 5.00 A: [laughter] that is great\n"       # overlaps B's turn
        "20.00 22.00 B: much later utterance\n"
        "22.50 24.00 A: and a reply\n"
        "80.00 81.00 B: (( low confidence ))\n"
    )
    sr = 8000
    audio = (np.random.RandomState(0).randn(sr * 90, 2) * 1000).astype(np.int16)
    wav = tmp_path / "fe_03_00001.wav"
    wavfile.write(wav, sr, audio)
    return str(trans), str(wav), tmp_path


def test_parse_transcript_skips_comments_and_lowconf(fisher_pair):
    trans, _, _ = fisher_pair
    utts = list(parse_transcript(trans))
    assert len(utts) == 5  # low-confidence line dropped
    assert utts[0][2] == "A"


def test_conversation_segmentation(fisher_pair):
    trans, wav, tmp = fisher_pair
    dest = str(tmp / "out")
    n = process_conversation_file(trans, wav, dest)
    assert n >= 1
    files = sorted(os.listdir(dest))
    base = files[0].rsplit(".", 1)[0].replace("_1", "").replace("_2", "")
    # mixed + per-speaker + transcript files exist
    assert f"{base}.wav" in files and f"{base}_1.wav" in files and f"{base}_2.wav" in files
    txt = open(os.path.join(dest, f"{base}.txt")).read()
    assert "[spkchange]" in txt
    # overlapping utterances merged into one segment in time order
    assert "hello how are you" in txt


def test_monologue_segmentation(fisher_pair):
    trans, wav, tmp = fisher_pair
    dest = str(tmp / "mono")
    n = process_monologue_file(trans, wav, dest, min_duration=2.0)
    assert n >= 1
    files = os.listdir(dest)
    assert any(f.endswith(".wav") for f in files)
    assert any(f.endswith(".txt") for f in files)
