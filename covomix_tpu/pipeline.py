"""End-to-end synthesis pipeline: text + prompts -> waveform.

Replaces the inference orchestration inside the reference CLIs
(monologue_generation.py / dialogue_generation.py) with a reusable,
jit-cached Synthesizer. Capability contracts preserved:

  * prompt prep (prepare_oracle_hubert, monologue_generation.py:82-90):
    `.hubert_code.npy` (string array -> int) + mel of the sibling `.wav`,
    truncated to equal length and capped at 400 frames (= 8 s at 20 ms)
  * text cleanup: remove_punctuation + lower (monologue_generation.py:108-114)
  * covosingle: prompt tokens ‖ T2S tokens, clamp <= 501, cond mel zeros past
    prompt, mask True on the generated region, flow sample at cond_scale 0.7,
    trim to mask, vocode (monologue_generation.py:146-177)
  * covosinx: stream B = silence token 157 (monologue_generation.py:221-228)
  * covomix: CoMix dual-stream decode split at half; VoMix 160-d cond
    (monologue_generation.py:248-319)
  * dialogue variants with `[spkchange]` turn splitting and `_1`/`_2` prompts
    (dialogue_generation.py:150-330)

TPU-first: sequence lengths are bucketed (multiples of `bucket`) so repeated
calls reuse compiled executables; padding uses the training-time pad values
(mel -15 / token 501), which the model saw during training (collate_fn,
data_module.py:834-951), and outputs are trimmed to the true length."""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from covomix_tpu.audio import MelConfig, load_wav, mel_spectrogram
from covomix_tpu.models import acoustic as A
from covomix_tpu.models import text2semantic as T
from covomix_tpu.models import vocoder as V
from covomix_tpu.util.misc import round_up

SILENCE_TOKEN = 157          # silence unit id convention (monologue_generation.py:222)
TOKEN_CLAMP = 501            # clamp ceiling incl. EOS (monologue_generation.py:162)
PROMPT_MAX_FRAMES = 400      # 8 s at 20 ms hop (monologue_generation.py:87)
MEL_PAD = -15.0              # collate pad value (data_module.py:846)



@dataclasses.dataclass
class Synthesizer:
    """Holds params + configs, memoizes jitted stage functions per bucket."""

    t2s_params: dict
    t2s_cfg: T.T2SConfig
    acoustic_params: dict
    acoustic_cfg: A.AcousticConfig
    vocoder_params: dict
    vocoder_cfg: V.VocoderConfig
    tokenizer: object                      # WordPieceTokenizer-compatible
    mel_cfg: MelConfig = MelConfig()
    bucket: int = 128
    t2s_max_length: int = 2048
    cond_scale: float = 0.7                # acoustic CFG (monologue_generation.py:171)
    t2s_cond_scale: float = 1.0            # CLIs default to no T2S CFG
    temperature: float = 1.0
    dtype: object = jnp.float32
    # True: vocode with the fused Pallas tail kernel (ops/vocoder_tail.py,
    # ~2.7x faster tail) — static-length, so bucket-pad frames are NOT
    # re-zeroed and the last ~16 mel frames (~0.3 s) of each wav are an
    # approximation of exact-length inference (bounded by the silence fill;
    # same trade as hifigan_inference --fuse_tail). False (default): exact —
    # `valid_len` masking matches reference-convention exact-length vocoding.
    fuse_tail: bool = False
    # True: greedy self-speculative T2S decode (generate_speculative — the
    # early-exit head drafts, the full depth verifies; output equals greedy
    # generate exactly). Requires a checkpoint trained with
    # target_early_exit_layer > 0 (two_output additionally needs the stream-2
    # draft head this framework trains alongside); the released reference
    # checkpoints have no such head, so this is opt-in.
    speculative: bool = False

    def __post_init__(self):
        if self.speculative:
            if self.t2s_cfg.target_early_exit_layer <= 0:
                raise ValueError("--speculative needs a T2S checkpoint trained "
                                 "with an early-exit head (target_early_exit_layer > 0)")
            if self.t2s_cfg.two_output and "to_logits2" not in self.t2s_params.get("early_exit", {}):
                raise ValueError("--speculative on a two-stream (CoMix) checkpoint needs "
                                 "the stream-2 draft head ('early_exit/to_logits2', trained "
                                 "by this framework); reference checkpoints carry only the "
                                 "stream-1 head")
            spec = jax.jit(functools.partial(
                T.generate_speculative, cfg=self.t2s_cfg,
                max_length=self.t2s_max_length, dtype=self.dtype))
            # greedy: the sampling key and temperature/CFG knobs don't apply
            self._gen_fn = lambda params, key, source_ids: spec(params, source_ids=source_ids)
        else:
            self._gen_fn = jax.jit(functools.partial(
                T.generate, cfg=self.t2s_cfg, max_length=self.t2s_max_length,
                temperature=self.temperature, cond_scale=self.t2s_cond_scale, dtype=self.dtype))
        self._sample_fn = jax.jit(functools.partial(
            A.sample, cfg=self.acoustic_cfg, cond_scale=self.cond_scale, dtype=self.dtype))
        # fuse_tail=None keeps the generator's auto dispatch (Pallas tail on
        # TPU for covomix-shaped configs, plain convs elsewhere); the
        # Synthesizer knob only controls whether valid_len masking (which
        # forces the unfused path) is applied — see `fuse_tail` field docs
        self._voc_fn = jax.jit(functools.partial(
            V.generator, cfg=self.vocoder_cfg, dtype=self.dtype))

    # ---- prompt preparation ------------------------------------------------

    def extract_mel(self, wav_path: str, channel: Optional[int] = None) -> np.ndarray:
        """Mel of a wav, with the reference's sibling `.mel.npy` cache
        (online_feature_extraction.py:71-87: load cache if present, else
        compute; cache files store [80, T])."""
        cache = wav_path.replace(".wav", ".mel.npy")
        if os.path.exists(cache):
            return np.load(cache).T  # [T, 80]
        wav, _ = load_wav(wav_path, sr=self.mel_cfg.sample_rate, channel=channel)
        mel = np.asarray(mel_spectrogram(wav[None], self.mel_cfg))[0]  # [80, T]
        return mel.T  # [T, 80]

    def prepare_prompt(self, hubert_code_path: str) -> Tuple[np.ndarray, np.ndarray]:
        """(semantic tokens [T], mel [T, 80]) equal-length, capped at 400 frames."""
        codes = np.load(hubert_code_path)
        codes = codes.astype(int)  # reference stores STRING arrays (SURVEY quirks)
        mel = self.extract_mel(hubert_code_path.replace(".hubert_code.npy", ".wav"))
        n = min(len(codes), len(mel), PROMPT_MAX_FRAMES)
        return codes[:n], mel[:n]

    # ---- stages ------------------------------------------------------------

    def _encode_bucketed(self, text: str) -> np.ndarray:
        """Tokenize and pad the id row to a 16-multiple (pad 0 = BERT [PAD]):
        one compiled decode executable serves every text length within a
        bucket instead of retracing the whole while_loop decode per length
        (set_eos_id writes EOS at the first pad; the source mask drops the
        rest, so padding is semantically free)."""
        ids, _ = self.tokenizer.batch_encode([text])
        s = round_up(max(ids.shape[1], 1), 16)
        return np.pad(np.asarray(ids), ((0, 0), (0, s - ids.shape[1])))

    def text_to_tokens(self, text: str, key) -> np.ndarray:
        """T2S decode; returns the non-pad token ids (wrapper.sample contract,
        text2semantic.py:1237-1251)."""
        ids = self._encode_bucketed(text)
        gen = self._gen_fn(self.t2s_params, key=key, source_ids=jnp.asarray(ids))
        toks = np.asarray(gen.tokens[0])
        return toks[toks != self.t2s_cfg.semantic_pad_id]

    def text_to_tokens_2stream(self, text: str, key) -> Tuple[np.ndarray, np.ndarray]:
        """CoMix decode. The reference flattens both streams then splits at half
        (monologue_generation.py:307-319); we return the streams directly with
        the same lengths."""
        ids = self._encode_bucketed(text)
        gen = self._gen_fn(self.t2s_params, key=key, source_ids=jnp.asarray(ids))
        pad = self.t2s_cfg.semantic_pad_id
        t1 = np.asarray(gen.tokens[0]); t1 = t1[t1 != pad]
        t2 = np.asarray(gen.tokens2[0]); t2 = t2[t2 != pad]
        n = min(len(t1), len(t2))
        return t1[:n], t2[:n]

    def flow_sample(self, phoneme_ids: np.ndarray, cond: np.ndarray, key) -> np.ndarray:
        """Bucket-padded flow-matching sample; returns [T, 80] trimmed.

        Pad frames are excluded from attention via a dynamic `valid_len`
        prefix mask so the bucketed output matches exact-length inference (the
        reference always runs exact lengths; without the mask pad frames leak
        into dense attention — quantified in tests/test_bucket_skew.py). The
        scalar mask keeps attention on the Pallas flash kernel and compiles
        ONCE per bucket shape (a traced scalar, not a python int)."""
        t = len(phoneme_ids)
        tb = max(self.bucket, round_up(t, self.bucket))
        if phoneme_ids.ndim == 1:
            ph = np.full((tb,), TOKEN_CLAMP, np.int32)
        else:
            ph = np.full((tb, phoneme_ids.shape[1]), TOKEN_CLAMP, np.int32)
        ph[:t] = phoneme_ids
        c = np.zeros((tb, cond.shape[1]), np.float32)
        c[:t] = cond
        mel = self._sample_fn(self.acoustic_params, key=key, phoneme_ids=jnp.asarray(ph[None]),
                              cond=jnp.asarray(c[None]), valid_len=jnp.int32(t))
        return np.asarray(mel[0, :t])

    def vocode(self, mel: np.ndarray) -> np.ndarray:
        """[T, 80] mel -> waveform (trimmed to T*hop).

        `valid_len` (traced scalar; one executable per bucket) re-zeroes pad
        frames after every generator conv, so the bucketed result equals
        exact-length (reference-convention) vocoding — without it the MEL_PAD
        fill inside the generator's ~16-frame receptive field perturbs the
        tail (tests/test_vocoder.py)."""
        t = len(mel)
        tb = max(self.bucket, round_up(t, self.bucket))
        m = np.full((tb, mel.shape[1]), MEL_PAD, np.float32)
        m[:t] = mel
        if self.fuse_tail:
            # fused kernel is static-length: no valid_len (tail approximation
            # documented on the config field)
            wav = np.asarray(self._voc_fn(self.vocoder_params, mel=jnp.asarray(m[None])))[0]
        else:
            wav = np.asarray(self._voc_fn(self.vocoder_params, mel=jnp.asarray(m[None]),
                                          valid_len=jnp.int32(t)))[0]
        return wav[: t * self.mel_cfg.hop_size]

    def _check_mode(self, mode: str) -> None:
        """Fail fast on a model-variant / mode mismatch instead of a shape
        error deep in the acoustic stage (covosingle needs a VoSingle
        1-stream model; covosinx/covomix need the 2-stream VoMix variants;
        covomix additionally needs a CoMix two-output T2S)."""
        streams = self.acoustic_cfg.n_phoneme_streams
        if mode == "covosingle" and streams != 1:
            raise ValueError(
                f"mode covosingle needs a VoSingle acoustic model (1 phoneme stream); "
                f"got mode={self.acoustic_cfg.mode!r} ({streams} streams)")
        if mode in ("covosinx", "covomix") and streams != 2:
            raise ValueError(
                f"mode {mode} needs a two-stream acoustic model (two_two/two_one); "
                f"got mode={self.acoustic_cfg.mode!r}")
        if mode == "covomix" and not getattr(self.t2s_cfg, "two_output", False):
            raise ValueError("mode covomix needs a CoMix T2S model (two_output=True)")
        # the synthesis paths vocode ONE mel stream: the acoustic output width
        # must match the vocoder input (a two_two 160-d output would otherwise
        # die with an opaque conv shape error inside the vocoder stage)
        if self.acoustic_cfg.mel_dim != self.vocoder_cfg.num_mels:
            raise ValueError(
                f"acoustic model outputs {self.acoustic_cfg.mel_dim}-d mel but the "
                f"vocoder expects {self.vocoder_cfg.num_mels}-d "
                f"(acoustic mode={self.acoustic_cfg.mode!r}: covosinx/covomix "
                f"synthesis needs the two_one mixed-output variant)")

    # ---- modes (monologue) -------------------------------------------------

    def synthesize_turn(self, text: str, sem_prompt: np.ndarray, mel_prompt: np.ndarray, key) -> np.ndarray:
        """covosingle one-utterance path (monologue_generation.py:146-177)."""
        k1, k2 = jax.random.split(key)
        pred = self.text_to_tokens(text, k1)
        phone_input = np.clip(np.concatenate([sem_prompt, pred]), None, TOKEN_CLAMP)
        cond = np.zeros((len(phone_input), self.acoustic_cfg.dim_in), np.float32)
        cond[: len(mel_prompt)] = mel_prompt
        mel = self.flow_sample(phone_input.astype(np.int32), cond, k2)
        mel = mel[len(mel_prompt):]  # trim to the generated (masked) region
        return self.vocode(mel)

    def synthesize_two_stream(self, sem_a, sem_b, mel_prompt_2ch: np.ndarray, prompt_len: int, key) -> np.ndarray:
        """Shared covosinx/covomix acoustic pass: 2-stream phonemes + 160-d cond
        -> mixed mel -> wav (monologue_generation.py:226-244)."""
        n = max(len(sem_a), len(sem_b))
        sem_a = np.pad(sem_a, (0, n - len(sem_a)), constant_values=SILENCE_TOKEN)
        sem_b = np.pad(sem_b, (0, n - len(sem_b)), constant_values=SILENCE_TOKEN)
        phones = np.clip(np.stack([sem_a, sem_b], axis=-1), None, TOKEN_CLAMP).astype(np.int32)
        cond = np.zeros((n, mel_prompt_2ch.shape[1]), np.float32)
        cond[:prompt_len] = mel_prompt_2ch[:prompt_len]
        mel = self.flow_sample(phones, cond, key)
        mel = mel[prompt_len:]
        return self.vocode(mel)

    def monologue(self, mode: str, text: str, prompt_path: str, key) -> np.ndarray:
        self._check_mode(mode)
        text = _clean(text)
        sem, mel = self.prepare_prompt(prompt_path)
        if mode == "covosingle":
            return self.synthesize_turn(text, sem, mel, key)
        k1, k2 = jax.random.split(key)
        prompt_len = len(mel)
        mel2 = np.concatenate([mel, mel], axis=-1)  # same prompt both streams (:202-212)
        if mode == "covosinx":
            pred = self.text_to_tokens(text, k1)
            sem_a = np.concatenate([sem, pred])
            sem_b = np.concatenate([sem, np.full(len(pred), SILENCE_TOKEN, pred.dtype)])
        elif mode == "covomix":
            p1, p2 = self.text_to_tokens_2stream(text, k1)
            sem_a = np.concatenate([sem, p1])
            sem_b = np.concatenate([sem, p2])
        else:
            raise ValueError(f"unknown mode {mode}")
        return self.synthesize_two_stream(sem_a, sem_b, mel2, prompt_len, k2)

    # ---- modes (dialogue) --------------------------------------------------

    def dialogue(self, mode: str, text: str, prompt_path_1: str, prompt_path_2: str, key) -> np.ndarray:
        self._check_mode(mode)
        sem1, mel1 = self.prepare_prompt(prompt_path_1)
        sem2, mel2 = self.prepare_prompt(prompt_path_2)
        if mode == "covosingle":
            # per-turn synthesis alternating prompts, waveform concat (:158-192)
            wavs = []
            for i, turn in enumerate(text.split("[spkchange]")):
                turn = _clean(turn)
                key, sub = jax.random.split(key)
                if i % 2 == 0:
                    wavs.append(self.synthesize_turn(turn, sem1, mel1, sub))
                else:
                    wavs.append(self.synthesize_turn(turn, sem2, mel2, sub))
            return np.concatenate(wavs) if wavs else np.zeros((0,), np.float32)

        prompt_len = min(len(mel1), len(mel2))
        mel_2ch = np.concatenate([mel1[:prompt_len], mel2[:prompt_len]], axis=-1)
        sem_a, sem_b = sem1[:prompt_len], sem2[:prompt_len]
        if mode == "covosinx":
            # per-turn T2S, tokens routed to alternating streams (:234-268)
            for i, turn in enumerate(text.split("[spkchange]")):
                turn = _clean(turn)
                key, sub = jax.random.split(key)
                pred = self.text_to_tokens(turn, sub)
                sil = np.full(len(pred), SILENCE_TOKEN, pred.dtype)
                if i % 2 == 0:
                    sem_a, sem_b = np.concatenate([sem_a, pred]), np.concatenate([sem_b, sil])
                else:
                    sem_a, sem_b = np.concatenate([sem_a, sil]), np.concatenate([sem_b, pred])
        elif mode == "covomix":
            # full script through CoMix once (:272-329)
            key, sub = jax.random.split(key)
            p1, p2 = self.text_to_tokens_2stream(_clean(text), sub)
            sem_a = np.concatenate([sem_a, p1])
            sem_b = np.concatenate([sem_b, p2])
        else:
            raise ValueError(f"unknown mode {mode}")
        key, sub = jax.random.split(key)
        return self.synthesize_two_stream(sem_a, sem_b, mel_2ch, prompt_len, sub)


def _clean(text: str) -> str:
    from covomix_tpu.data.tokenizer import remove_punctuation

    return remove_punctuation(text).lower()


# ---------------------------------------------------------------------------
# loading


def load_synthesizer(
    t2s_path: str,
    acoustic_path: str,
    vocoder_path: str,
    *,
    vocab_path: Optional[str] = None,
    **kwargs,
) -> Synthesizer:
    """Build a Synthesizer from converted-checkpoint .npz files (each with a
    .json sidecar carrying the model config; see checkpoint.io / bin/convert)."""
    from covomix_tpu.checkpoint import io as cio
    from covomix_tpu.data.tokenizer import load_covomix_tokenizer

    def _load(path, cfg_cls):
        params = cio.load_params(path)
        meta = cio.load_meta(path)
        fields = {f.name for f in dataclasses.fields(cfg_cls)}
        cfg = cfg_cls(**{k: _tupled(v) for k, v in meta.get("config", {}).items() if k in fields})
        return params, cfg

    t2s_params, t2s_cfg = _load(t2s_path, T.T2SConfig)
    ac_params, ac_cfg = _load(acoustic_path, A.AcousticConfig)
    voc_params, voc_cfg = _load(vocoder_path, V.VocoderConfig)
    tok = load_covomix_tokenizer(vocab_path)
    return Synthesizer(t2s_params, t2s_cfg, ac_params, ac_cfg, voc_params, voc_cfg, tok, **kwargs)


def _tupled(v):
    if isinstance(v, list):
        return tuple(_tupled(x) for x in v)
    return v
