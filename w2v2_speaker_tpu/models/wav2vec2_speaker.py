"""wav2vec2 + FC head speaker-recognition model (the flagship).

Functional re-design of the reference's `Wav2vec2FCModule`
(`/root/reference/src/lightning_modules/speaker/wav2vec2_fc.py:101-463`):

wav2vec2 backbone -> stat pooling (train/test pooling may differ,
wav2vec2_fc.py:177-182) -> final-embedding channel masking
(wav2vec2_fc.py:162-169) -> FC stack with the speaker embedding tapped at
`embedding_layer_idx` (363-412) -> CE logits, or the AAM-softmax head
replacing the final FC (212-224), or per-frame logits for the no-pool /
speaker-CTC modes. The speaker-CTC variant (the reference's separate
near-clone `Wav2vec2CtcModule`, `wav2vec2_ctc.py:98-406`) is this same model
with pooling 'none' + mode 'speaker_ctc'.

Freezing (`wav2vec_initially_frozen` / `num_frozen_steps` /
`completely_freeze_feature_extractor`) is realized with
`train.state.make_freeze_schedule_tx` masks over the 'wav2vec2' /
'wav2vec2/feature_encoder' param subtrees rather than requires_grad mutation.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import AAMSoftmaxHead, FCHead
from .masking import embedding_mask
from .pooling import get_pooling, pooled_embedding_size
from .wav2vec2 import (
    BASE_CONFIG,
    Wav2Vec2Config,
    Wav2Vec2LiteEncoder,
    Wav2Vec2Model,
)

__all__ = ["Wav2Vec2SpeakerConfig", "Wav2Vec2SpeakerModel"]


@dataclass(frozen=True)
class Wav2Vec2SpeakerConfig:
    w2v2: Wav2Vec2Config = BASE_CONFIG
    feature_encoder_only: bool = False  # Wav2vecLiteWrapperModule equivalent
    stat_pooling_type: str = "mean"
    test_stat_pooling_type: Optional[str] = None  # None = same as train
    hidden_fc_layers_out: Tuple[int, ...] = ()
    embedding_layer_idx: int = -1
    use_aam: bool = False
    aam_margin: float = 0.2
    aam_scale: float = 30.0
    # dropout on the final pooled embedding (channel mask)
    final_channel_mask_prob: float = 0.0
    final_channel_mask_width: int = 1
    # speaker-CTC head: bias blank high at init (wav2vec2_fc.py:226-233)
    ctc_blank_bias: float = 0.0
    ctc_head: bool = False  # adds +1 blank class to the output layer


class Wav2Vec2SpeakerModel(nn.Module):
    cfg: Wav2Vec2SpeakerConfig = Wav2Vec2SpeakerConfig()
    num_speakers: int = 100

    def setup(self):
        cfg = self.cfg
        if cfg.feature_encoder_only:
            self.wav2vec2 = Wav2Vec2LiteEncoder(cfg=cfg.w2v2)
            feat = cfg.w2v2.conv_dim[-1]
        else:
            self.wav2vec2 = Wav2Vec2Model(
                cfg=cfg.w2v2,
                insert_cls_token=cfg.stat_pooling_type == "first+cls",
            )
            feat = cfg.w2v2.hidden_size

        self.stat_pooling = get_pooling(cfg.stat_pooling_type)
        test_type = cfg.test_stat_pooling_type or cfg.stat_pooling_type
        if test_type == "attentive" and cfg.stat_pooling_type != "attentive":
            raise ValueError("attention can not be learned at test time")
        self.test_stat_pooling = (
            get_pooling(test_type)
            if test_type != cfg.stat_pooling_type
            else self.stat_pooling
        )
        self.pool_dim = pooled_embedding_size(cfg.stat_pooling_type, feat)

        num_out = self.num_speakers + (1 if cfg.ctc_head else 0)
        self.head = FCHead(
            hidden_sizes=cfg.hidden_fc_layers_out,
            num_out=num_out,
            embedding_layer_idx=cfg.embedding_layer_idx,
            use_aam=cfg.use_aam,
            ctc_blank_bias=cfg.ctc_blank_bias,
        )
        if cfg.use_aam:
            self.aam = AAMSoftmaxHead(
                num_classes=self.num_speakers,
                margin=cfg.aam_margin,
                scale=cfg.aam_scale,
            )

    def _pool(self, features, frame_mask, train):
        pool = self.stat_pooling if train else self.test_stat_pooling
        return pool(features, frame_mask, train=train)

    def __call__(
        self,
        wav: jax.Array,  # [B, N]
        wav_mask: Optional[jax.Array] = None,
        train: bool = False,
        labels: Optional[jax.Array] = None,
    ):
        cfg = self.cfg
        out = self.wav2vec2(wav, wav_mask, train=train)
        features, frame_mask = out[0], out[1]

        no_pool = cfg.stat_pooling_type.lower() == "none" and (
            train or (cfg.test_stat_pooling_type or "none").lower() == "none"
        )
        if no_pool:
            # frame-level path (ce_no_pool / speaker_ctc):
            # head applied per frame
            embedding, logits = self.head(features, train=train)
            return {
                "embedding": embedding,
                "logits": logits,
                "frame_mask": frame_mask,
            }

        pooled = self._pool(features, frame_mask, train)

        if train and cfg.final_channel_mask_prob > 0:
            pooled = embedding_mask(
                self.make_rng("masking"),
                pooled[:, None, :],
                timestep_mask_prob=0.0,
                timestep_mask_width=1,
                channel_mask_prob=cfg.final_channel_mask_prob,
                channel_mask_width=cfg.final_channel_mask_width,
            )[:, 0, :]

        embedding, logits = self.head(pooled, train=train)

        result = {"embedding": embedding, "logits": logits}
        if cfg.use_aam:
            # always call the head so its params exist at init; without
            # labels it returns plain scaled-cosine logits
            if labels is not None:
                loss, preds = self.aam(embedding, labels)
                result["loss"] = loss
                result["preds"] = preds
            else:
                self.aam(embedding)
        return result

    def compute_embedding(self, wav, wav_mask=None):
        """Deterministic embedding extraction (test-time pooling)."""
        out = self.wav2vec2(wav, wav_mask, train=False)
        features, frame_mask = out[0], out[1]
        pooled = self._pool(features, frame_mask, train=False)
        embedding, _ = self.head(pooled, train=False)
        return embedding

    def compute_ensemble_embeddings(
        self, wav, wav_mask=None, num_ensembles: int = 12
    ):
        """Per-transformer-layer pooled embeddings for ensemble scoring
        (wav2vec2_fc.py:440-463): the last `num_ensembles` of the 13 hidden
        states (conv-projection output + 12 layers), train pooling applied."""
        if self.cfg.feature_encoder_only:
            raise ValueError("ensembles need the transformer encoder")
        _, frame_mask, hiddens = self.wav2vec2(
            wav, wav_mask, train=False, output_hidden_states=True
        )
        start = len(hiddens) - num_ensembles
        return [
            self.stat_pooling(h, frame_mask, train=False)
            for h in hiddens[start:]
        ]
