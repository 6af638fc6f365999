"""Joint speaker + speech recognition model on a shared wav2vec2 backbone.

The reference *declares* this family (`SpeakerAndSpeechRecognitionModule`,
`/root/reference/src/lightning_modules/multitask/mt_speech_speaker_module.py:38-282`)
— abstract `compute_speaker_embedding` / `compute_speaker_prediction` /
`compute_speech_embedding` / `compute_vocabulary_prediction` with separate
speaker/speech loss tracking — but every concrete step is `pass` and
`main.py:304-307` raises "No multi-task networks yet!". This is the working
realization of that contract, TPU-native:

- shared `Wav2Vec2Model` backbone (one forward per batch — the two heads
  read the same frame features, so the backbone cost is paid once, not
  twice as the reference's abstract per-task methods imply)
- speech head: dropout + Dense lm_head over frames -> CTC logits
  (`wav2vec2_fc_letter.py:65-86` head shape)
- speaker head: masked stat pooling -> FC stack with embedding tap ->
  CE logits, or AAM-softmax on the embedding (`wav2vec2_fc.py:363-412`)

Returns a single dict so one pjit train step drives both objectives.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import AAMSoftmaxHead, FCHead
from .pooling import get_pooling, pooled_embedding_size
from .wav2vec2 import BASE_CONFIG, Wav2Vec2Config, Wav2Vec2Model

__all__ = ["Wav2Vec2MultitaskConfig", "Wav2Vec2MultitaskModel"]


@dataclass(frozen=True)
class Wav2Vec2MultitaskConfig:
    w2v2: Wav2Vec2Config = BASE_CONFIG
    # speech head (wav2vec2_fc_letter.py:30-58)
    vocab_size: int = 32
    head_dropout: float = 0.1
    # speaker head (wav2vec2_fc.py:49-98)
    stat_pooling_type: str = "mean"
    hidden_fc_layers_out: Tuple[int, ...] = ()
    embedding_layer_idx: int = -1
    use_aam: bool = False
    aam_margin: float = 0.2
    aam_scale: float = 30.0


class Wav2Vec2MultitaskModel(nn.Module):
    cfg: Wav2Vec2MultitaskConfig = Wav2Vec2MultitaskConfig()
    num_speakers: int = 100

    def setup(self):
        cfg = self.cfg
        self.wav2vec2 = Wav2Vec2Model(cfg=cfg.w2v2)
        self.head_dropout_mod = nn.Dropout(rate=cfg.head_dropout)
        self.lm_head = nn.Dense(cfg.vocab_size)
        self.stat_pooling = get_pooling(cfg.stat_pooling_type)
        self.head = FCHead(
            hidden_sizes=cfg.hidden_fc_layers_out,
            num_out=self.num_speakers,
            embedding_layer_idx=cfg.embedding_layer_idx,
            use_aam=cfg.use_aam,
        )
        if cfg.use_aam:
            self.aam = AAMSoftmaxHead(
                num_classes=self.num_speakers,
                margin=cfg.aam_margin,
                scale=cfg.aam_scale,
            )

    def __call__(
        self,
        wav: jax.Array,  # [B, N]
        wav_mask: Optional[jax.Array] = None,
        train: bool = False,
        labels: Optional[jax.Array] = None,  # speaker labels (AAM margin)
        label_weights: Optional[jax.Array] = None,  # 0 for padding rows
    ):
        cfg = self.cfg
        features, frame_mask = self.wav2vec2(wav, wav_mask, train=train)

        # speech branch: per-frame character logits
        h = self.head_dropout_mod(features, deterministic=not train)
        ctc_logits = self.lm_head(h).astype(jnp.float32)

        # speaker branch: pooled embedding + classification
        pooled = self.stat_pooling(features, frame_mask, train=train)
        embedding, logits = self.head(pooled, train=train)

        result = {
            "ctc_logits": ctc_logits,
            "frame_mask": frame_mask,
            "embedding": embedding,
            "logits": logits,
        }
        if cfg.use_aam:
            if labels is not None:
                loss, preds = self.aam(embedding, labels, label_weights)
                result["loss"] = loss
                result["preds"] = preds
            else:
                self.aam(embedding)
        return result

    def compute_embedding(self, wav, wav_mask=None):
        """Deterministic speaker-embedding extraction."""
        features, frame_mask = self.wav2vec2(wav, wav_mask, train=False)
        pooled = self.stat_pooling(features, frame_mask, train=False)
        embedding, _ = self.head(pooled, train=False)
        return embedding
