"""Oracle prompt-pairing helpers for training-time eval and prompt-conditioned
training examples — port of covomix/online_feature_extraction.py:217-324.

File convention: `<utt>.mel.npy` [80, T] with sibling `<utt>.hubert_code.npy`
(string-array token ids). Speaker identity is the filename prefix before the
first '-' (Fisher slice naming), which `choose_prompt` uses to pick a
same-speaker neighbor and `choose_different_spk` a different-speaker one."""

from __future__ import annotations

import os
import random
from typing import List, Optional, Tuple

import numpy as np


def _spk(path: str) -> str:
    return os.path.basename(path).split("-")[0]


def choose_prompt(mel_files: List[str], i: int, rng: Optional[random.Random] = None) -> int:
    """Index of a same-speaker neighbor within +-30 files (online_feature_
    extraction.py:281-294): retry up to 10 times, else accept the mismatch."""
    rng = rng or random
    j = rng.randint(max(i - 30, 0), min(i + 30, len(mel_files) - 1))
    tries = 0
    while _spk(mel_files[i]) != _spk(mel_files[j]) and tries < 10:
        j = rng.randint(max(i - 30, 0), min(i + 30, len(mel_files) - 1))
        tries += 1
    return j


def choose_different_spk(mel_files: List[str], i: int, rng: Optional[random.Random] = None) -> int:
    """Index of a different-speaker utterance within +-150/+-500 files
    (online_feature_extraction.py:297-306)."""
    rng = rng or random
    j = rng.randint(max(i - 150, 0), min(i + 150, len(mel_files) - 1))
    tries = 0
    while _spk(mel_files[i]) == _spk(mel_files[j]) and tries < 10:
        j = rng.randint(max(i - 500, 0), min(i + 500, len(mel_files) - 1))
        tries += 1
    return j


def _load_pair(mel_path: str) -> Tuple[np.ndarray, np.ndarray]:
    """(mel [T, 80], phonemes [T]) truncated to equal length
    (online_feature_extraction.py:219-233)."""
    from covomix_tpu.data.datasets import load_codes

    mel = np.load(mel_path)
    codes = load_codes(mel_path.replace(".mel.npy", ".hubert_code.npy"))
    n = min(codes.shape[0], mel.shape[1])
    return mel[:, :n].T.astype(np.float32), codes[:n].astype(np.int32)


def _crop(mel, codes, lo, hi, rng, shuffle_spec):
    """Random-length center/random crop (online_feature_extraction.py:236-246)."""
    max_len = rng.randint(lo, hi - 1)
    cur = mel.shape[0]
    if cur > max_len:
        start = int(rng.uniform(0, cur - max_len)) if shuffle_spec else (cur - max_len) // 2
        mel = mel[start : start + max_len]
        codes = codes[start : start + max_len]
    return mel, codes


def prepare_oracle_example_with_prompt(
    mel_files: List[str],
    i: int,
    *,
    rng: Optional[random.Random] = None,
    shuffle_spec: bool = False,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """One prompt-conditioned training/eval example
    (prepare_oracle_data_for_training_with_prompt, online_feature_extraction.py
    :217-277): target cropped to 300-700 frames, a same-speaker prompt cropped
    to 100-200 frames, concatenated [prompt | target]; mask is False on the
    prompt region and True on the target (the region to infill/score)."""
    rng = rng or random
    mel, codes = _load_pair(mel_files[i])
    mel, codes = _crop(mel, codes, 300, 700, rng, shuffle_spec)

    j = choose_prompt(mel_files, i, rng)
    pmel, pcodes = _load_pair(mel_files[j])
    pmel, pcodes = _crop(pmel, pcodes, 100, 200, rng, shuffle_spec)

    full_mel = np.concatenate([pmel, mel], axis=0)
    full_codes = np.concatenate([pcodes, codes], axis=0)
    mask = np.ones(full_codes.shape[0], bool)
    mask[: pcodes.shape[0]] = False
    return full_mel, full_codes, mask


def load_two_stream_example(mel_path_a: str, *, rng: Optional[random.Random] = None,
                            random_partner: Optional[List[str]] = None):
    """VoMix-style paired example. `mel_path_a` is the '-A.mel.npy' file; the
    partner stream is '-B' of the same utterance (2input_1output,
    util/inference.py:151-190) or a random other file's '-A' when
    `random_partner` is given (2input_2output, :79-115). Returns
    (mel [T, 160], phonemes [T, 2], mixed_mel [T, 80] | None)."""
    rng = rng or random
    mel_a, codes_a = _load_pair_suffix(mel_path_a)
    if random_partner is not None:
        other = rng.choice(random_partner)
        mel_b, codes_b = _load_pair_suffix(other.replace(".mel.npy", "-A.mel.npy"))
        mixed = None
    else:
        # suffix surgery on the BASENAME only: a '-A' in a directory name
        # must not be rewritten (datasets.py guards the same layout)
        d, base = os.path.split(mel_path_a)
        mel_b, codes_b = _load_pair_suffix(
            os.path.join(d, base.replace("-A.mel.npy", "-B.mel.npy")))
        mixed_path = os.path.join(d, base.replace("-A.mel.npy", ".mel.npy"))
        mixed = np.load(mixed_path).T.astype(np.float32) if os.path.isfile(mixed_path) else None
    n = min(len(codes_a), len(codes_b))
    mel = np.concatenate([mel_a[:n], mel_b[:n]], axis=1)
    codes = np.stack([codes_a[:n], codes_b[:n]], axis=-1)
    if mixed is not None:
        mixed = mixed[:n]
    return mel, codes, mixed


def _load_pair_suffix(mel_path: str):
    """Like _load_pair but the codes sibling uses the '-16k.hubert_code.npy'
    suffix of the VoMix layout (util/inference.py:90-91)."""
    mel = np.load(mel_path)
    code_path = mel_path.replace(".mel.npy", "-16k.hubert_code.npy")
    if not os.path.isfile(code_path):
        code_path = mel_path.replace(".mel.npy", ".hubert_code.npy")
    from covomix_tpu.data.datasets import load_codes

    codes = load_codes(code_path)
    n = min(codes.shape[0], mel.shape[1])
    return mel[:, :n].T.astype(np.float32), codes[:n].astype(np.int32)
