"""Batched multi-dialogue serving pipeline, sharded over a device mesh.

BASELINE.md config 5: 64 concurrent dialogues through the full
T2S -> flow-matching -> vocoder cascade on a v5e-8 mesh. The reference has no
serving abstraction at all (inference is a per-file Python loop inside the
CLIs, SURVEY §1); this module is the TPU-native counterpart: one jitted
program per stage, batch axis sharded over 'dp' with NamedSharding — XLA
keeps every stage data-parallel across chips with zero hand-written
collectives (no TP needed at dim <= 1024, SURVEY §7 step 6)."""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from covomix_tpu.models import acoustic as A
from covomix_tpu.models import text2semantic as T
from covomix_tpu.models import vocoder as V


@dataclasses.dataclass
class BatchedPipeline:
    """Fixed-shape batched synthesis: [B] text id rows -> [B] waveforms.

    All shapes static: B dialogues, S text tokens, L decode steps, F mel
    frames (prompt + L). Call repeatedly with different data; compiles once."""

    t2s_params: dict
    t2s_cfg: T.T2SConfig
    acoustic_params: dict
    acoustic_cfg: A.AcousticConfig
    vocoder_params: dict
    vocoder_cfg: V.VocoderConfig
    mesh: Optional[Mesh] = None
    decode_len: int = 512
    prompt_frames: int = 400   # informational default; the actual prompt length comes from the inputs
    cond_scale: float = 0.7
    dtype: object = jnp.bfloat16

    def __post_init__(self):
        if self.mesh is not None:
            dp = NamedSharding(self.mesh, P("dp"))
            repl = NamedSharding(self.mesh, P())
            self.t2s_params = jax.device_put(self.t2s_params, repl)
            self.acoustic_params = jax.device_put(self.acoustic_params, repl)
            self.vocoder_params = jax.device_put(self.vocoder_params, repl)
            self._dp = dp
        else:
            self._dp = None
        self._gen = jax.jit(functools.partial(
            T.generate, cfg=self.t2s_cfg, max_length=self.decode_len, dtype=self.dtype))
        self._sample = jax.jit(functools.partial(
            A.sample, cfg=self.acoustic_cfg, cond_scale=self.cond_scale, dtype=self.dtype))
        self._voc = jax.jit(functools.partial(V.generator, cfg=self.vocoder_cfg, dtype=self.dtype))

    def _shard(self, x):
        if self._dp is None:
            return x
        nd = np.ndim(x)
        return jax.device_put(x, NamedSharding(self.mesh, P(*(["dp"] + [None] * (nd - 1)))))

    def __call__(self, key, text_ids: np.ndarray, prompt_tokens: np.ndarray, prompt_mels: np.ndarray):
        """text_ids [B, S]; prompt_tokens [B, P] (or [B, P, 2] two-stream);
        prompt_mels [B, P, cond_dim]. Returns (wav [B, total_frames*hop],
        token streams). Dialogue semantics follow pipeline.Synthesizer."""
        b = text_ids.shape[0]
        k1, k2 = jax.random.split(key)
        gen = self._gen(self.t2s_params, key=k1, source_ids=self._shard(jnp.asarray(text_ids)))
        pad = self.t2s_cfg.semantic_pad_id
        two = self.acoustic_cfg.n_phoneme_streams == 2
        tok1 = jnp.where(gen.tokens == pad, 157, jnp.clip(gen.tokens, 0, 501))
        if two:
            tok2 = jnp.where(gen.tokens2 == pad, 157, jnp.clip(gen.tokens2, 0, 501))
            gen_ph = jnp.stack([tok1, tok2], axis=-1)          # [B, L, 2]
        else:
            gen_ph = tok1                                       # [B, L]
        pt = jnp.asarray(prompt_tokens)
        if two and pt.ndim == 2:
            pt = jnp.stack([pt, pt], axis=-1)
        phonemes = jnp.concatenate([pt, gen_ph], axis=1).astype(jnp.int32)
        total = phonemes.shape[1]
        cond = jnp.zeros((b, total, self.acoustic_cfg.dim_in), jnp.float32)
        cond = cond.at[:, : prompt_mels.shape[1]].set(jnp.asarray(prompt_mels, jnp.float32))
        mel = self._sample(self.acoustic_params, key=k2,
                           phoneme_ids=self._shard(phonemes), cond=self._shard(cond))
        # vocode only the generated region (prompt frames are conditioning)
        gen_start = pt.shape[1]
        wav = self._voc(self.vocoder_params, mel=mel[:, gen_start:])
        return wav, gen
