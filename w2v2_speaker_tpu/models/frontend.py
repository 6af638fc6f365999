"""On-device fbank frontend wrapper.

The reference computes 40/80-mel fbanks host-side in the data pipeline
(`audio_features.py:63-84`) followed by per-utterance normalization
(`input_normalisation.py:38-84`); here the transform runs inside the jitted
step (three MXU matmuls, `data/features.py`) so every model family exposes
the same waveform interface and the host pipeline stays byte-light.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.features import FbankConfig, log_mel_filterbank

__all__ = ["FbankFrontend"]


class FbankFrontend(nn.Module):
    """wav [B, N] -> log-mel [B, T, mels] (+ masked per-utterance channel
    normalization, torch std ddof=1 + eps 1e-5 parity) -> inner model."""

    inner: nn.Module
    fbank: FbankConfig = FbankConfig()
    normalize: bool = True

    def _features(self, wav, wav_mask):
        frame_mask = None
        if wav_mask is None:
            feats = log_mel_filterbank(wav, self.fbank)
        else:
            # reflect at each utterance's true end (not the zero-padded batch
            # edge) so padded-batch features bit-match the solo computation;
            # frames past num_frames(length) are garbage and masked out below
            lengths = wav_mask.sum(axis=-1)
            feats = log_mel_filterbank(wav, self.fbank, lengths=lengths)
            n_frames = lengths // self.fbank.hop_length + 1
            t = feats.shape[1]
            frame_mask = jnp.arange(t)[None, :] < n_frames[:, None]
        if self.normalize:
            if frame_mask is None:
                mean = feats.mean(axis=1, keepdims=True)
                std = feats.std(axis=1, keepdims=True, ddof=1)
            else:
                m = frame_mask.astype(feats.dtype)[:, :, None]
                n = jnp.maximum(m.sum(axis=1, keepdims=True), 2.0)
                mean = (feats * m).sum(axis=1, keepdims=True) / n
                var = ((feats - mean) ** 2 * m).sum(
                    axis=1, keepdims=True
                ) / (n - 1.0)
                std = jnp.sqrt(var)
            feats = (feats - mean) / (std + 1e-5)
            if frame_mask is not None:
                feats = feats * frame_mask.astype(feats.dtype)[:, :, None]
        return feats, frame_mask

    def __call__(self, wav, wav_mask=None, train: bool = False, labels=None):
        feats, frame_mask = self._features(wav, wav_mask)
        return self.inner(feats, frame_mask, train=train, labels=labels)

    def compute_embedding(self, wav, wav_mask=None):
        feats, frame_mask = self._features(wav, wav_mask)
        return self.inner.compute_embedding(feats, frame_mask)
