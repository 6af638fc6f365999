"""wav2vec2 + CTC letter-recognition model (the secondary speech task).

Re-design of the reference `Wav2vec2FcLetterRecognizer`
(`/root/reference/src/lightning_modules/speech/wav2vec2_fc_letter.py:65-199`):
wav2vec2 backbone -> train-time embedding masking (time/channel dropout on
the speech embeddings, wav2vec2_fc_letter.py:96-117) -> dropout + Dense
lm_head to the character vocabulary (the HF Wav2Vec2ForCTC head shape,
`SpeechRecognitionHead`, 65-86). Frame lengths come from the conv stack's
exact formula rather than the reference's hard-coded floor((n-80)/320)
(wav2vec2_fc_letter.py:146).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .masking import embedding_mask
from .wav2vec2 import BASE_CONFIG, Wav2Vec2Config, Wav2Vec2Model

__all__ = ["Wav2Vec2SpeechConfig", "Wav2Vec2SpeechModel"]


@dataclass(frozen=True)
class Wav2Vec2SpeechConfig:
    w2v2: Wav2Vec2Config = BASE_CONFIG
    vocab_size: int = 32
    head_dropout: float = 0.1
    # embedding masker on speech embeddings (wav2vec2_fc_letter config)
    timestep_mask_prob: float = 0.0
    timestep_mask_width: int = 1
    channel_mask_prob: float = 0.0
    channel_mask_width: int = 1


class Wav2Vec2SpeechModel(nn.Module):
    cfg: Wav2Vec2SpeechConfig = Wav2Vec2SpeechConfig()

    @nn.compact
    def __call__(
        self,
        wav: jax.Array,  # [B, N]
        wav_mask: Optional[jax.Array] = None,
        train: bool = False,
        labels=None,  # unused; uniform model signature
    ):
        cfg = self.cfg
        features, frame_mask = Wav2Vec2Model(cfg=cfg.w2v2, name="wav2vec2")(
            wav, wav_mask, train=train
        )
        if train and (
            cfg.timestep_mask_prob > 0 or cfg.channel_mask_prob > 0
        ):
            features = embedding_mask(
                self.make_rng("masking"),
                features,
                cfg.timestep_mask_prob,
                cfg.timestep_mask_width,
                cfg.channel_mask_prob,
                cfg.channel_mask_width,
            )
        h = nn.Dropout(rate=cfg.head_dropout, deterministic=not train)(
            features
        )
        logits = nn.Dense(cfg.vocab_size, name="lm_head")(h)
        return {
            "logits": logits.astype(jnp.float32),
            "frame_mask": frame_mask,
            "embedding": features,
        }
