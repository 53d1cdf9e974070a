"""Fisher data preparation: normalization, segmentation, golden parity vs the
reference scripts run as subprocesses on a synthetic stereo fixture."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
from scipy.io import wavfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "data_preparation"))

from conftest import REFERENCE, reference_available
from prepare_fisher import (TAG_MAP_CONV, TAG_MAP_MONO, Partitioner, merge_turns,
                            normalize_text, process_utterance)

TRANS_TEXT = (
    "# fe_03_00001.sph\n"
    "# transcribed by x\n"
    "\n"
    "0.00 2.00 A: Hello, how are you?\n"
    "2.50 4.00 B: i am fine thanks [noise]\n"
    "3.80 5.00 A: [laughter] that is great\n"
    "6.00 8.50 A: more talking from speaker a\n"
    "20.00 22.00 B: much later utterance mp3\n"
    "22.50 24.00 A: and a 'quoted' reply\n"
    "26.00 27.50 B: closing remark here\n"
    "80.00 81.00 B: (( low confidence ))\n"
)


def _make_fixture(root, layout="flat"):
    """Synthetic 90 s stereo Fisher file. layout='ldc' uses the reference
    directory scheme <set>/fe_03_p1_tran/data/trans/000/."""
    sr = 8000
    audio = (np.random.RandomState(0).randn(sr * 90, 2) * 1000).astype(np.int16)
    if layout == "ldc":
        tdir = os.path.join(root, "LDC2004S13-Part1", "fe_03_p1_tran", "data", "trans", "000")
        adir = os.path.join(root, "LDC2004S13-Part1", "audio_wav")
    else:
        tdir = adir = str(root)
    os.makedirs(tdir, exist_ok=True)
    os.makedirs(adir, exist_ok=True)
    trans = os.path.join(tdir, "fe_03_00001.txt")
    with open(trans, "w") as f:
        f.write(TRANS_TEXT)
    wav = os.path.join(adir, "fe_03_00001.wav")
    wavfile.write(wav, sr, audio)
    return trans, wav


def test_normalize_text_contract():
    out = normalize_text("Hello, World! (AND) 'quoted' .period a-b")
    assert "," not in out and "(" not in out and "!" not in out
    assert "quoted" in out and "'" not in out
    assert "period" in out
    assert out == out.lower()


def test_process_utterance_tables():
    u = process_utterance("fe_03_00001", "1.00 2.00 A: mp3 and [noise] stuff\n",
                          keep_low_conf=False, rem_noises=True, emojify=False,
                          tag_map=TAG_MAP_MONO)
    assert u is not None
    assert "m p three" in u[3] and "[noise]" not in u[3]
    # conversation tag map keeps [laughter] under remove_noises
    u2 = process_utterance("fe_03_00001", "1.00 2.00 B: ha [laughter] ok\n",
                           keep_low_conf=False, rem_noises=True, emojify=False,
                           tag_map=TAG_MAP_CONV)
    assert "[laughter]" in u2[3]
    # low confidence dropped
    assert process_utterance("f", "1.0 2.0 A: (( maybe ))\n", keep_low_conf=False,
                             rem_noises=False, emojify=False, tag_map=TAG_MAP_MONO) is None
    # TRANSCRIPT_BUGS line ids are built with str(t_start*10) which renders
    # floats as "3353.0" while the table keys say "3353" — in the reference the
    # fix table therefore NEVER matches (process_fisher_data.py:202-205). We
    # reproduce that behavior bit-for-bit for golden parity:
    ub = process_utterance("fe_03_00265", "335.30 338.10 B: korrect\n",
                           keep_low_conf=False, rem_noises=False, emojify=False,
                           tag_map=TAG_MAP_MONO)
    assert ub[3] == "korrect"  # faithfully not fixed, like the reference


def test_merge_turns_spkchange():
    utts = [(0.0, 1.0, "A", "hi there"), (1.2, 2.0, "B", "hello"), (2.1, 3.0, "B", "yes"), (3.2, 4.0, "A", "ok")]
    assert merge_turns(utts) == "hi there [spkchange] hello yes [spkchange] ok"


def test_partitioner_split():
    p = Partitioner(100, split=True)
    assert p(0) == "train" and p(79) == "train" and p(80) == "val" and p(89) == "val" and p(90) == "test"
    mono = Partitioner(100, split=False)
    assert mono(0) == mono(99) == "train"


def _run(script, mode, audio_root, trans_root, dest, extra=()):
    cmd = [sys.executable, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                                        "data_preparation", "prepare_fisher.py"),
           mode, "--audio_root", audio_root, "--transcript_root", trans_root,
           "--dest_root", dest, *extra]
    subprocess.run(cmd, check=True, capture_output=True, text=True)


def _run_reference(script_name, audio_root, trans_root, dest, extra=()):
    cmd = [sys.executable, os.path.join(REFERENCE, "data_preparation", script_name),
           "--audio_root", audio_root, "--transcript_root", trans_root,
           "--dest_root", dest, *extra]
    return subprocess.run(cmd, check=True, capture_output=True, text=True)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_monologue_golden_vs_reference(tmp_path):
    """Segment boundaries, transcripts, durations and audio bytes must match
    process_fisher_data.py on the same fixture."""
    root = str(tmp_path / "src")
    _make_fixture(root, layout="ldc")
    ref_out = str(tmp_path / "ref")
    my_out = str(tmp_path / "mine")
    _run_reference("process_fisher_data.py", root, root, ref_out,
                   extra=["--min_slice_duration", "2.0"])
    _run(None, "monologue", root, root, my_out,
         extra=["--data_sets", "LDC2004S13-Part1", "--min_slice_duration", "2.0"])

    ref_rows = [json.loads(l) for l in open(os.path.join(ref_out, "manifest_train.json"))]
    my_rows = [json.loads(l) for l in open(os.path.join(my_out, "manifest_train.json"))]
    assert len(ref_rows) == len(my_rows) > 0
    for r, m in zip(ref_rows, my_rows):
        assert os.path.basename(r["audio_filepath"]) == os.path.basename(m["audio_filepath"])
        assert r["text"] == m["text"]
        assert r["duration"] == pytest.approx(m["duration"])
        sr_r, a_r = wavfile.read(r["audio_filepath"])
        sr_m, a_m = wavfile.read(m["audio_filepath"])
        assert sr_r == sr_m
        np.testing.assert_array_equal(a_r, a_m)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
def test_dialogue_golden_vs_reference(tmp_path):
    """Stereo span, _1/_2 channel ordering, and [spkchange] transcript must
    match process_fisher_data_conversation_overlap_text2semantic.py."""
    root = str(tmp_path / "src")
    _make_fixture(root, layout="ldc")
    ref_out = str(tmp_path / "ref")
    my_out = str(tmp_path / "mine")
    _run_reference("process_fisher_data_conversation_overlap_text2semantic.py",
                   root, root, ref_out)
    _run(None, "dialogue", root, root, my_out, extra=["--data_sets", "LDC2004S13-Part1"])

    def segs(d):
        out = {}
        for part in ("train", "val", "test"):
            pdir = os.path.join(d, part)
            if not os.path.isdir(pdir):
                continue
            for f in sorted(os.listdir(pdir)):
                if f.endswith(".txt"):
                    out[f] = open(os.path.join(pdir, f)).read()
        return out

    ref_segs, my_segs = segs(ref_out), segs(my_out)
    assert ref_segs and ref_segs == my_segs
    # audio: mixed stereo + channel files byte-identical
    for part in ("train", "val", "test"):
        pdir = os.path.join(ref_out, part)
        if not os.path.isdir(pdir):
            continue
        for f in sorted(os.listdir(pdir)):
            if not f.endswith(".wav"):
                continue
            _, a_r = wavfile.read(os.path.join(ref_out, part, f))
            _, a_m = wavfile.read(os.path.join(my_out, part, f))
            np.testing.assert_array_equal(a_r, a_m)
