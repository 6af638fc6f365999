"""Train-time stochastic masking (embedding masker + SpecAugment-style spans).

`embedding_mask` re-implements the reference's `EmbeddingMasker`
(`/root/reference/src/layers/embedding_masking.py:18-123`): time steps /
channels are dropped with given probabilities and the dropped positions are
widened to `width` consecutive indices; one mask is sampled per batch (shared
across batch elements), exactly like the reference's per-forward `t.rand`
draw. Note: the reference gates channel masking on `timestep_mask_prob > 0`
(a bug at embedding_masking.py:88); here channel masking is gated on its own
probability.

`sample_span_mask` is the wav2vec2/SpecAugment span sampler (HF-style
mask_prob / mask_length over time or feature axes), used by the wav2vec2
backbone on feature-projection outputs.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["embedding_mask", "expand_mask_width", "sample_span_mask"]


def expand_mask_width(dropped: jax.Array, width: int) -> jax.Array:
    """Widen each dropped (True) index to `width` consecutive indices to the
    right, matching EmbeddingMasker.expand_mask."""
    if width <= 1:
        return dropped
    out = dropped
    for k in range(1, width):
        shifted = jnp.concatenate(
            [jnp.zeros((k,), dtype=bool), dropped[: dropped.shape[0] - k]]
        )
        out = out | shifted
    return out


def embedding_mask(
    rng: jax.Array,
    x: jax.Array,  # [batch, time, channels]
    timestep_mask_prob: float,
    timestep_mask_width: int,
    channel_mask_prob: float,
    channel_mask_width: int,
) -> jax.Array:
    """Apply time/channel dropout masks (train-time only; caller gates)."""
    if x.ndim != 3:
        raise ValueError(f"expected [batch, time, channels], got {x.shape}")
    if timestep_mask_prob + channel_mask_prob == 0:
        return x
    t_rng, c_rng = jax.random.split(rng)
    b, t, c = x.shape
    keep = jnp.ones((t, c), dtype=x.dtype)
    if timestep_mask_prob > 0:
        t_dropped = jax.random.uniform(t_rng, (t,)) <= timestep_mask_prob
        t_dropped = expand_mask_width(t_dropped, timestep_mask_width)
        keep = keep * (~t_dropped).astype(x.dtype)[:, None]
    if channel_mask_prob > 0:
        c_dropped = jax.random.uniform(c_rng, (c,)) <= channel_mask_prob
        c_dropped = expand_mask_width(c_dropped, channel_mask_width)
        keep = keep * (~c_dropped).astype(x.dtype)[None, :]
    return x * keep[None, :, :]


def sample_span_mask(
    rng: jax.Array,
    batch: int,
    length: int,
    mask_prob: float,
    mask_span: int,
    valid_lengths: jax.Array | None = None,
) -> jax.Array:
    """Sample SpecAugment-style span masks: returns bool [batch, length] where
    True marks masked positions.

    Each position starts a span with probability mask_prob / mask_span, then
    spans are widened to `mask_span`; expected fraction masked ~= mask_prob
    (the HF wav2vec2 sampler has the same expectation). Span starts are
    restricted to valid (unpadded) positions.
    """
    if mask_prob <= 0:
        return jnp.zeros((batch, length), dtype=bool)
    p_start = mask_prob / mask_span
    starts = jax.random.uniform(rng, (batch, length)) < p_start
    if valid_lengths is not None:
        valid = jnp.arange(length)[None, :] < (
            valid_lengths[:, None] - mask_span + 1
        )
        starts = starts & valid
    mask = starts
    for k in range(1, mask_span):
        shifted = jnp.pad(starts[:, : length - k], ((0, 0), (k, 0)))
        mask = mask | shifted
    return mask
