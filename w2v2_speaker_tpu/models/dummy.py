"""Dummy 2-parameter-ish model for schedule/pipeline smoke tests.

Equivalent of the reference `DummyModule`
(`/root/reference/src/lightning_modules/speaker/dummy.py:31-89`): the
"embedding" is just (mean, std) of the input waveform and the classifier is a
single Linear(2 -> num_speakers). Exists so end-to-end runs exercise data +
schedule machinery with negligible compute (SURVEY §4).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

__all__ = ["DummyModel"]


class DummyModel(nn.Module):
    num_speakers: int = 100

    @nn.compact
    def __call__(self, wav, wav_mask=None, train: bool = False, labels=None):
        if wav_mask is not None:
            m = wav_mask.astype(jnp.float32)
            n = jnp.maximum(m.sum(axis=-1), 1.0)
            mean = (wav * m).sum(axis=-1) / n
            var = ((wav - mean[:, None]) ** 2 * m).sum(axis=-1) / jnp.maximum(
                n - 1.0, 1.0
            )
            std = jnp.sqrt(var + 1e-10)
        else:
            mean = wav.mean(axis=-1)
            std = wav.std(axis=-1, ddof=1)
        embedding = jnp.stack([mean, std], axis=-1)  # [B, 2]
        logits = nn.Dense(self.num_speakers, name="classifier")(embedding)
        return {"embedding": embedding, "logits": logits}

    def compute_embedding(self, wav, wav_mask=None):
        return self(wav, wav_mask)["embedding"]
