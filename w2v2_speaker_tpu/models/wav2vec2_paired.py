"""Paired (siamese-in-one-sequence) wav2vec2 speaker-equality model.

Re-design of the reference `Wav2vec2PairedSpeakerModule`
(`/root/reference/src/lightning_modules/speaker/wav2vec2_paired_input.py:66-207`):
both waveforms pass through the shared conv feature encoder + feature
projection, then one sequence ``[CLS, f1, SEP, f2, SEP]`` (CLS=+1, SEP=-1
constants, wav2vec2_paired_input.py:40-41) runs through the shared
transformer encoder; the CLS output token feeds a Linear(hidden -> 1)
equality logit trained with BCE.

New vs the reference: per-side padding masks flow into the concatenated
sequence's attention mask so padded batches score identically to unpadded
pairs (TPU static shapes).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from .wav2vec2 import (
    BASE_CONFIG,
    ConvFeatureEncoder,
    Encoder,
    FeatureProjection,
    Wav2Vec2Config,
    feat_extract_output_lengths,
)

__all__ = ["Wav2Vec2PairedConfig", "Wav2Vec2PairedModel"]


@dataclass(frozen=True)
class Wav2Vec2PairedConfig:
    w2v2: Wav2Vec2Config = BASE_CONFIG
    cls_token_constant: float = 1.0
    sep_token_constant: float = -1.0


class Wav2Vec2PairedModel(nn.Module):
    cfg: Wav2Vec2PairedConfig = Wav2Vec2PairedConfig()

    @nn.compact
    def __call__(
        self,
        wav_a: jax.Array,  # [B, N1]
        wav_b: jax.Array,  # [B, N2]
        mask_a: Optional[jax.Array] = None,
        mask_b: Optional[jax.Array] = None,
        train: bool = False,
    ):
        cfg = self.cfg.w2v2
        b = wav_a.shape[0]
        h = cfg.hidden_size

        feature_encoder = ConvFeatureEncoder(cfg, name="feature_encoder")
        feature_projection = FeatureProjection(cfg, name="feature_projection")

        f1 = feature_projection(
            feature_encoder(wav_a, mask_a, train=train), train=train
        )
        f2 = feature_projection(
            feature_encoder(wav_b, mask_b, train=train), train=train
        )

        def frame_mask(m, t):
            if m is None:
                return jnp.ones((b, t), bool)
            lengths = feat_extract_output_lengths(m.sum(axis=-1), cfg)
            return jnp.arange(t)[None, :] < lengths[:, None]

        fm1 = frame_mask(mask_a, f1.shape[1])
        fm2 = frame_mask(mask_b, f2.shape[1])
        t1 = fm1.sum(axis=1)  # [B] valid frame counts
        t2 = fm2.sum(axis=1)

        # Pack each row compactly: [CLS, f1_valid, SEP, f2_valid, SEP, 0...].
        # Naive concatenation would leave padding *between* f1/f2 and the SEP
        # tokens, which shifts token positions under the conv positional
        # embedding; end-only padding keeps padded batches exactly equivalent
        # to unpadded pairs (zeros beyond the final SEP match conv SAME
        # padding). Built as a static-shape gather-select over output
        # positions — no dynamic shapes under jit.
        total = 3 + f1.shape[1] + f2.shape[1]
        p = jnp.arange(total)[None, :]  # [1, total]
        t1b = t1[:, None]
        t2b = t2[:, None]

        is_cls = p == 0
        is_f1 = (p >= 1) & (p < 1 + t1b)
        is_sep1 = p == 1 + t1b
        is_f2 = (p >= 2 + t1b) & (p < 2 + t1b + t2b)
        is_sep2 = p == 2 + t1b + t2b

        idx_f1 = jnp.clip(p - 1, 0, f1.shape[1] - 1)
        idx_f2 = jnp.clip(p - 2 - t1b, 0, f2.shape[1] - 1)
        g1 = jnp.take_along_axis(f1, idx_f1[:, :, None], axis=1)
        g2 = jnp.take_along_axis(f2, idx_f2[:, :, None], axis=1)

        cls_val = jnp.asarray(self.cfg.cls_token_constant, f1.dtype)
        sep_val = jnp.asarray(self.cfg.sep_token_constant, f1.dtype)
        sequence = jnp.zeros((b, total, h), f1.dtype)
        sequence = jnp.where(is_cls[:, :, None], cls_val, sequence)
        sequence = jnp.where(is_f1[:, :, None], g1, sequence)
        sequence = jnp.where(
            (is_sep1 | is_sep2)[:, :, None], sep_val, sequence
        )
        sequence = jnp.where(is_f2[:, :, None], g2, sequence)
        seq_mask = p <= 2 + t1b + t2b

        encoded = Encoder(cfg, name="encoder")(
            sequence, attention_mask=seq_mask, train=train
        )
        cls_out = encoded[:, 0, :].astype(jnp.float32)
        logit = nn.Dense(1, name="equality_head")(cls_out)
        return {"logit": logit, "cls_embedding": cls_out}

    def compute_speaker_equality(self, wav_a, wav_b, mask_a=None, mask_b=None):
        return self(wav_a, wav_b, mask_a, mask_b, train=False)["logit"]
