"""Fisher corpus preparation for CoVoMix training — TPU-repo port of all three
reference data_preparation/process_fisher_data*.py scripts, as one CLI.

Modes (matching the reference scripts' behavior bit-for-bit on the same flags):
  monologue     process_fisher_data.py: single-speaker slices per channel —
                utterances accumulate per channel and flush once the summed
                duration reaches --min_slice_duration; the audio written is the
                CONCATENATION of the utterance intervals (gaps dropped); every
                file partitions to train/ (TRAIN_END==VAL_END==NUM_FILES,
                process_fisher_data.py:72-73); manifest_{part}.json JSONL rows
                {audio_filepath, duration, text} (:140-151)
  conversation  process_fisher_data_conversation.py: same accumulation but the
                audio keeps BOTH channels (stereo slices, :273) and files split
                80/10/10 across train/val/test (:72-73); [laughter] is kept
                even under --remove_noises (TAG_MAP has no [laughter], :106)
  dialogue      process_fisher_data_conversation_overlap_text2semantic.py:
                2-speaker dialogue segments — utterances buffer until a new
                utterance no longer overlaps the buffered span AND both
                speakers spoke; writes the stereo span `<id>_<n>.wav`,
                per-speaker `_1.wav`/`_2.wav` ordered by first talker
                (:120-154), and the `[spkchange]`-separated transcript `.txt`
                (:227-236); buffers spanning > 40 s are dropped (:314-343)

Transcript lines: `t_start t_end A:|B: text`; '#' comments; '((' marks low
confidence. Text normalization (lowercase, strip `()*;:"!&{},.-?`, tag/number
tables, Mozilla bug fixes) follows process_fisher_data.py:78-170 exactly —
these tables are the behavioral contract for tokenizer compatibility."""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
from math import ceil, floor

import numpy as np
from scipy.io import wavfile

# Known transcription errors and their fixes (process_fisher_data.py:78-88)
TRANSCRIPT_BUGS = {
    "fe_03_00265-B-3353-3381": "correct",
    "fe_03_00991-B-52739-52829": "that's one of those",
    "fe_03_10282-A-34442-34484.wav": "they don't want",
    "fe_03_10677-B-10104-10641": "uh my mine yeah the german shepherd "
    "pitbull mix he snores almost as loud "
    "as i do",
    "fe_03_00027-B-39380-39405": None,
    "fe_03_11487-B-3109-23406": None,
    "fe_03_01326-A-30742-30793": None,
}

# (process_fisher_data.py:90-105)
NUMBER_TABLE = {
    "401k": "four o one k", "f16": "f sixteen", "m16": "m sixteen",
    "ak47": "a k forty seven", "v8": "v eight", "y2k": "y two k",
    "mp3": "m p three", "vh1": "v h one", "90210": "nine o two one o",
    "espn2": "e s p n two", "u2": "u two", "dc3s": "d c threes",
    "book 2": "book two", "s2b": "s two b", "3d": "three d",
}

# noise-tag handling (process_fisher_data.py:107-119). The conversation /
# dialogue variants OMIT [laughter] so it survives --remove_noises — it is a
# CoVoMix tokenizer token (process_fisher_data_conversation.py:106)
TAG_MAP_MONO = {
    "[laughter]": "\U0001f923", "[laugh]": "\U0001f923", "[noise]": "\U0001f615",
    "[sigh]": "\U0001f615", "[cough]": "\U0001f615", "[mn]": "\U0001f615",
    "[breath]": "\U0001f615", "[lipsmack]": "\U0001f615", "[[skip]]": "",
    "[pause]": "", "[sneeze]": "\U0001f615",
}
TAG_MAP_CONV = {k: v for k, v in TAG_MAP_MONO.items() if k != "[laughter]"}

# Fisher corpus size; drives the train/val/test split boundaries
NUM_FILES_DEFAULT = 5850 + 5849


def normalize_text(utt: str) -> str:
    """__normalize (process_fisher_data.py:154-170), bit-for-bit."""
    table = str.maketrans(dict.fromkeys('()*;:"!&{},.-?'))
    utt = (
        utt.lower()
        .replace("[uh]", "uh")
        .replace("[um]", "um")
        .replace("<noise>", "[noise]")
        .replace("<spoken_noise>", "[vocalized-noise]")
        .replace(".period", "period")
        .replace(".dot", "dot")
        .replace("-hyphen", "hyphen")
        .replace("._", " ")
        .translate(table)
    )
    return re.sub(r"'([a-z]+)'", r"\1", utt)


def process_utterance(file_id: str, line: str, *, keep_low_conf: bool, rem_noises: bool,
                      emojify: bool, tag_map: dict):
    """One transcript line -> (t_start, t_end, channel_idx, text, 'A'|'B') or
    None (process_fisher_data.py:172-222)."""
    if line.startswith("#") or not line.strip() or (not keep_low_conf and "((" in line):
        return None
    parts = line.split()
    if len(parts) < 3:
        return None
    try:
        t_start, t_end = float(parts[0]), float(parts[1])
    except ValueError:
        return None
    if t_start < 0 or t_end < t_start:
        return None
    channel = parts[2]
    if channel not in ("A:", "B:"):
        return None
    idx = 0 if channel == "A:" else 1
    line_id = "-".join([file_id, channel[0], str(t_start * 10), str(t_end * 10)])
    content = TRANSCRIPT_BUGS.get(line_id, " ".join(parts[3:]))
    if content is None:
        return None
    for tag, newtag in NUMBER_TABLE.items():
        content = content.replace(tag, newtag)
    content = normalize_text(content)
    if rem_noises:
        for k in tag_map:
            content = content.replace(k, "")
    elif emojify:
        for k, v in tag_map.items():
            content = content.replace(k, v)
    if not content.strip():
        return None
    return t_start, t_end, idx, content, channel[0]


class Partitioner:
    """train/val/test by file index (__partition_name, :300-306). Only the
    conversation script splits (0.8/0.9 boundaries); monologue and dialogue
    send everything to 'train'."""

    def __init__(self, num_files: int, split: bool):
        self.train_end = int(num_files * 0.8) if split else num_files
        self.val_end = int(num_files * 0.9) if split else num_files

    def __call__(self, file_count: int) -> str:
        if file_count >= self.val_end:
            return "test"
        if file_count >= self.train_end:
            return "val"
        return "train"


def _append_manifest(dest: str, partition: str, audio_path: str, duration: float, text: str):
    with open(os.path.join(dest, f"manifest_{partition}.json"), "a") as f:
        json.dump({"audio_filepath": audio_path, "duration": duration, "text": text}, f)
        f.write("\n")


def process_slices_file(trans_path: str, sr: int, audio: np.ndarray, file_id: str, dest: str,
                        *, min_slice_duration: float, file_count: int, partition: Partitioner,
                        keep_low_conf: bool, rem_noises: bool, emojify: bool,
                        stereo: bool) -> int:
    """monologue/conversation accumulation (process_fisher_data.py:225-299):
    per-channel buffers flush at >= min_slice_duration; audio written is the
    concatenation of the utterance intervals. `stereo` keeps both channels
    (conversation variant :273)."""
    tag_map = TAG_MAP_CONV if stereo else TAG_MAP_MONO
    count = 0
    texts = ["", ""]
    clips: list[list] = [[], []]
    durs = [0.0, 0.0]
    part = partition(file_count)
    os.makedirs(os.path.join(dest, part), exist_ok=True)
    with open(trans_path, encoding="utf-8", errors="replace") as fin:
        fin.readline()  # sph filename comment
        fin.readline()  # transcriber comment
        for line in fin:
            u = process_utterance(file_id, line, keep_low_conf=keep_low_conf,
                                  rem_noises=rem_noises, emojify=emojify, tag_map=tag_map)
            if u is None:
                continue
            t0, t1, idx, content, _ = u
            texts[idx] += content
            sl = audio[floor(t0 * sr): ceil(t1 * sr)]
            clips[idx].append(sl if stereo else sl[:, idx])
            durs[idx] += t1 - t0
            if durs[idx] < min_slice_duration:
                texts[idx] += " "
                continue
            count += 1
            path = os.path.join(dest, part, f"{file_id}_{count:03}.wav")
            wavfile.write(path, sr, np.concatenate(clips[idx], axis=0))
            _append_manifest(dest, part, path, durs[idx], texts[idx])
            texts[idx], clips[idx], durs[idx] = "", [], 0.0
    # trailing scraps below min duration are dropped (reference note :296-298)
    return count


def merge_turns(utts, sep_token: str = "[spkchange]") -> str:
    """create_overlap_content (overlap_text2semantic.py:227-236)."""
    out, last = [], None
    for _, _, spk, text in utts:
        if last is not None and spk != last:
            out.append(sep_token)
        out.append(text)
        last = spk
    return " ".join(out)


def process_dialogue_file(trans_path: str, sr: int, audio: np.ndarray, file_id: str, dest: str,
                          *, max_duration: float, file_count: int, partition: Partitioner,
                          keep_low_conf: bool, rem_noises: bool, emojify: bool) -> int:
    """overlap_text2semantic segmentation (:239-375): buffer utterances per
    channel; when a new utterance no longer overlaps the buffered span and both
    channels spoke, write the stereo span + per-speaker channels + transcript;
    drop buffers spanning > max_duration."""
    count = 0
    buf_a: list = []
    buf_b: list = []
    part = partition(file_count)
    os.makedirs(os.path.join(dest, part), exist_ok=True)

    def write_segment(combined):
        nonlocal count
        t0 = combined[0][0]
        first_spk = combined[0][2]
        t1 = max(u[1] for u in combined)
        text = merge_turns(combined)
        clip = audio[floor(t0 * sr): ceil(t1 * sr), :]
        count += 1
        base = os.path.join(dest, part, f"{file_id}_{count:03}")
        wavfile.write(base + ".wav", sr, clip)
        a, b = (0, 1) if first_spk == "A" else (1, 0)
        wavfile.write(base + "_1.wav", sr, clip[:, a])
        wavfile.write(base + "_2.wav", sr, clip[:, b])
        with open(base + ".txt", "w") as f:
            f.write(text)

    with open(trans_path, encoding="utf-8", errors="replace") as fin:
        fin.readline()
        fin.readline()
        for line in fin:
            u = process_utterance(file_id, line, keep_low_conf=keep_low_conf,
                                  rem_noises=rem_noises, emojify=emojify, tag_map=TAG_MAP_CONV)
            if u is None:
                continue
            t0, t1, _, content, ch = u
            if buf_a and buf_b:
                combined = sorted(buf_a + buf_b, key=lambda x: x[0])
                span_start = combined[0][0]
                span_end = max(x[1] for x in combined)
                if t0 < span_end:
                    pass  # overlaps the buffer: keep accumulating
                else:
                    if span_end - span_start <= max_duration:
                        write_segment(combined)
                    buf_a, buf_b = [], []  # >40 s buffers are dropped unwritten
            (buf_a if ch == "A" else buf_b).append((t0, t1, ch, content))
    # trailing buffer dropped, like the reference
    return count


def find_transcripts(transcript_root: str, data_set: str | None):
    """Reference layout <root>/<set>/fe_03_p*_tran*/data/trans/*/*.txt
    (process_fisher_data.py:330), falling back to a recursive *.txt glob."""
    if data_set:
        pattern = os.path.join(transcript_root, data_set, "fe_03_p*_tran*", "data", "trans", "*", "*.txt")
        hits = sorted(glob.glob(pattern))
        if hits:
            return hits
        transcript_root = os.path.join(transcript_root, data_set)
    return sorted(glob.glob(os.path.join(transcript_root, "**", "*.txt"), recursive=True))


def find_audio(audio_root: str, data_set: str | None, file_id: str):
    roots = [os.path.join(audio_root, data_set)] if data_set else [audio_root]
    roots.append(audio_root)
    for r in roots:
        for cand in (os.path.join(r, "audio_wav", file_id + ".wav"),
                     os.path.join(r, file_id + ".wav")):
            if os.path.isfile(cand):
                return cand
    return None


def main():
    p = argparse.ArgumentParser(description="Fisher Data Processing (TPU repo)")
    p.add_argument("mode", choices=["monologue", "conversation", "dialogue"])
    p.add_argument("--audio_root", required=True)
    p.add_argument("--transcript_root", required=True)
    p.add_argument("--dest_root", required=True)
    p.add_argument("--data_sets", default="",
                   help="comma list, e.g. LDC2004S13-Part1,LDC2005S13-Part2 (empty: flat layout)")
    p.add_argument("--min_slice_duration", type=float, default=10.0)
    p.add_argument("--max_duration", type=float, default=40.0, help="dialogue: drop longer buffers")
    p.add_argument("--keep_low_conf", action="store_true")
    p.add_argument("--remove_noises", action="store_true")
    p.add_argument("--noises_to_emoji", action="store_true")
    p.add_argument("--num_files", type=int, default=NUM_FILES_DEFAULT,
                   help="expected corpus size for the 80/10/10 split boundaries")
    args = p.parse_args()

    for part in ("train", "val", "test"):
        os.makedirs(os.path.join(args.dest_root, part), exist_ok=True)
        mpath = os.path.join(args.dest_root, f"manifest_{part}.json")
        open(mpath, "w").close()  # wipe manifests like the reference (:371-375)

    # ONLY conversation mode splits 80/10/10; monologue AND dialogue
    # (overlap_text2semantic) send every file to train — both reference
    # scripts set TRAIN_END_IDX = VAL_END_IDX = NUM_FILES
    # (process_fisher_data.py:71-73,
    # process_fisher_data_conversation_overlap_text2semantic.py:71-73; the
    # 0.8/0.9 factors exist only in process_fisher_data_conversation.py:72-73)
    partition = Partitioner(args.num_files, split=args.mode == "conversation")
    data_sets = [d for d in args.data_sets.split(",") if d] or [None]
    file_count = 0
    total = 0
    for data_set in data_sets:
        for trans in find_transcripts(args.transcript_root, data_set):
            file_id = os.path.basename(trans).rsplit(".", 1)[0]
            audio_path = find_audio(args.audio_root, data_set, file_id)
            if audio_path is None:
                continue
            sr, audio = wavfile.read(audio_path)
            if audio.ndim == 1:
                audio = np.stack([audio, audio], axis=1)
            if args.mode == "dialogue":
                total += process_dialogue_file(
                    trans, sr, audio, file_id, args.dest_root,
                    max_duration=args.max_duration, file_count=file_count,
                    partition=partition, keep_low_conf=args.keep_low_conf,
                    rem_noises=args.remove_noises, emojify=args.noises_to_emoji)
            else:
                total += process_slices_file(
                    trans, sr, audio, file_id, args.dest_root,
                    min_slice_duration=args.min_slice_duration, file_count=file_count,
                    partition=partition, keep_low_conf=args.keep_low_conf,
                    rem_noises=args.remove_noises, emojify=args.noises_to_emoji,
                    stereo=args.mode == "conversation")
            file_count += 1
    print(f"wrote {total} segments from {file_count} files to {args.dest_root}")


if __name__ == "__main__":
    main()
