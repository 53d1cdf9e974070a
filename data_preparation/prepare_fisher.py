"""Fisher corpus preparation for CoVoMix training — fresh TPU-repo port of the
reference data_preparation/process_fisher_data*.py capability.

Subcommands:
  monologue     single-speaker slices >= min duration per channel
                (process_fisher_data.py behavior)
  conversation  2-speaker dialogue segments: utterances from both channels are
                merged in time order; `[spkchange]` is inserted at speaker
                turns; overlapping utterances extend the segment; segments
                longer than 40 s are dropped; writes mixed `<id>_<n>.wav`,
                per-channel `<id>_<n>_1.wav` / `_2.wav` (speaker-1 = first
                talker), and the `[spkchange]` transcript `.txt`
                (process_fisher_data_conversation_overlap_text2semantic.py:
                227-375 behavior)

Transcript format: LDC Fisher `fe_03_*.txt` lines `t_start t_end A:|B: text`;
comment lines start with '#'; '((' marks low-confidence. Text normalization
follows the reference: lowercase, strip `()*;:"!&{},.-?`, keep `[laughter]`
style tags (mapped below), expand a small number table, unquote words."""

from __future__ import annotations

import argparse
import glob
import os
import re
from math import ceil, floor

import numpy as np
from scipy.io import wavfile

# tags kept (the CoVoMix tokenizer knows [laughter]); the rest removed
TAG_KEEP = {"[laughter]": "[laughter]", "[laugh]": "[laughter]"}
TAG_DROP = ["[noise]", "[sigh]", "[cough]", "[mn]", "[breath]", "[lipsmack]", "[[skip]]", "[pause]", "[sneeze]",
            "[vocalized-noise]"]
NUMBER_TABLE = {
    "401k": "four o one k", "f16": "f sixteen", "m16": "m sixteen", "ak47": "a k forty seven",
    "v8": "v eight", "y2k": "y two k", "mp3": "m p three", "vh1": "v h one",
    "90210": "nine o two one o", "espn2": "e s p n two", "u2": "u two", "3d": "three d",
}


def normalize_text(utt: str) -> str:
    table = str.maketrans(dict.fromkeys('()*;:"!&{},.-?'))
    utt = utt.lower()
    utt = utt.replace("[uh]", "uh").replace("[um]", "um")
    utt = utt.replace("<noise>", "[noise]").replace("<spoken_noise>", "[vocalized-noise]")
    utt = utt.replace(".period", "period").replace(".dot", "dot").replace("-hyphen", "hyphen").replace("._", " ")
    for k, v in NUMBER_TABLE.items():
        utt = utt.replace(k, v)
    utt = utt.translate(table)
    utt = re.sub(r"'([a-z]+)'", r"\1", utt)
    for k, v in TAG_KEEP.items():
        utt = utt.replace(k, v)
    for t in TAG_DROP:
        utt = utt.replace(t, "")
    return " ".join(utt.split())


def parse_transcript(path: str, keep_low_conf: bool = False):
    """Yields (t_start, t_end, channel 'A'|'B', text)."""
    with open(path, encoding="utf-8", errors="replace") as f:
        for line in f:
            if line.startswith("#") or not line.strip() or (not keep_low_conf and "((" in line):
                continue
            parts = line.split()
            if len(parts) < 4 or parts[2] not in ("A:", "B:"):
                continue
            try:
                t0, t1 = float(parts[0]), float(parts[1])
            except ValueError:
                continue
            if t0 < 0 or t1 < t0:
                continue
            text = normalize_text(" ".join(parts[3:]))
            if text:
                yield t0, t1, parts[2][0], text


def merge_turns(utts, sep_token: str = "[spkchange]") -> str:
    """Time-ordered utterances -> transcript with [spkchange] at turn changes."""
    utts = sorted(utts, key=lambda u: u[0])
    out, last = [], None
    for t0, t1, spk, text in utts:
        if last is not None and spk != last:
            out.append(sep_token)
        out.append(text)
        last = spk
    return " ".join(out)


def _write_segment(dest: str, file_id: str, count: int, sr: int, audio: np.ndarray, text: str, first_spk: str):
    os.makedirs(dest, exist_ok=True)
    base = os.path.join(dest, f"{file_id}_{count:03}")
    mixed = audio.mean(axis=1).astype(audio.dtype) if audio.ndim == 2 else audio
    wavfile.write(base + ".wav", sr, mixed)
    if audio.ndim == 2:
        a, b = (0, 1) if first_spk == "A" else (1, 0)
        wavfile.write(base + "_1.wav", sr, audio[:, a])
        wavfile.write(base + "_2.wav", sr, audio[:, b])
    with open(base + ".txt", "w") as f:
        f.write(text)


def process_conversation_file(trans_path: str, audio_path: str, dest: str, *, max_duration: float = 40.0,
                              keep_low_conf: bool = False) -> int:
    """Segment one Fisher conversation into dialogue training examples."""
    file_id = os.path.basename(trans_path).rsplit(".", 1)[0]
    sr, audio = wavfile.read(audio_path)
    if audio.ndim == 1:
        audio = audio[:, None].repeat(2, axis=1)
    count = 0
    buffer = []
    for t0, t1, spk, text in parse_transcript(trans_path, keep_low_conf):
        if not buffer:
            buffer.append((t0, t1, spk, text))
            continue
        seg_start = min(u[0] for u in buffer)
        seg_end = max(u[1] for u in buffer)
        both_speakers = len({u[2] for u in buffer}) == 2
        # reference flush rule (process_fisher_data_conversation_overlap_
        # text2semantic.py:289-345): write only once BOTH channels have spoken
        # and the next utterance does not overlap the buffered span; overlong
        # (>40 s) buffers are dropped, not written
        if t0 < seg_end or not both_speakers:
            buffer.append((t0, t1, spk, text))  # overlap / single-speaker: keep accumulating
            continue
        if seg_end - seg_start <= max_duration:
            transcript = merge_turns(buffer)
            first_spk = sorted(buffer, key=lambda u: u[0])[0][2]
            clip = audio[floor(seg_start * sr): ceil(seg_end * sr)]
            if len(clip) > 0 and transcript:
                count += 1
                _write_segment(dest, file_id, count, sr, clip, transcript, first_spk)
        buffer = [(t0, t1, spk, text)]
    return count


def process_monologue_file(trans_path: str, audio_path: str, dest: str, *, min_duration: float = 10.0,
                           keep_low_conf: bool = False) -> int:
    """Accumulate consecutive same-channel utterances into >= min_duration
    single-speaker slices (process_fisher_data.py behavior)."""
    file_id = os.path.basename(trans_path).rsplit(".", 1)[0]
    sr, audio = wavfile.read(audio_path)
    if audio.ndim == 1:
        audio = audio[:, None].repeat(2, axis=1)
    count = 0
    acc = {"A": [], "B": []}
    for t0, t1, spk, text in parse_transcript(trans_path, keep_low_conf):
        acc[spk].append((t0, t1, text))
        dur = sum(u[1] - u[0] for u in acc[spk])
        if dur >= min_duration:
            seg_start, seg_end = acc[spk][0][0], acc[spk][-1][1]
            ch = 0 if spk == "A" else 1
            clip = audio[floor(seg_start * sr): ceil(seg_end * sr), ch]
            transcript = " ".join(u[2] for u in acc[spk])
            count += 1
            os.makedirs(dest, exist_ok=True)
            base = os.path.join(dest, f"{file_id}_{spk}_{count:03}")
            wavfile.write(base + ".wav", sr, clip)
            with open(base + ".txt", "w") as f:
                f.write(transcript)
            acc[spk] = []
    return count


def main():
    p = argparse.ArgumentParser()
    p.add_argument("mode", choices=["monologue", "conversation"])
    p.add_argument("--audio_root", required=True)
    p.add_argument("--transcript_root", required=True)
    p.add_argument("--dest_root", required=True)
    p.add_argument("--min_slice_duration", type=float, default=10.0)
    p.add_argument("--max_duration", type=float, default=40.0)
    p.add_argument("--keep_low_conf", action="store_true")
    args = p.parse_args()

    transcripts = sorted(glob.glob(os.path.join(args.transcript_root, "**", "*.txt"), recursive=True))
    total = 0
    for trans in transcripts:
        file_id = os.path.basename(trans).rsplit(".", 1)[0]
        audio = None
        for cand in (os.path.join(args.audio_root, file_id + ".wav"),
                     os.path.join(args.audio_root, "audio_wav", file_id + ".wav")):
            if os.path.isfile(cand):
                audio = cand
                break
        if audio is None:
            continue
        if args.mode == "conversation":
            total += process_conversation_file(trans, audio, args.dest_root,
                                               max_duration=args.max_duration,
                                               keep_low_conf=args.keep_low_conf)
        else:
            total += process_monologue_file(trans, audio, args.dest_root,
                                            min_duration=args.min_slice_duration,
                                            keep_low_conf=args.keep_low_conf)
    print(f"wrote {total} segments to {args.dest_root}")


if __name__ == "__main__":
    main()
