"""Training objectives as pure JAX functions.

Re-implements the loss semantics of `/root/reference/src/optim/loss/`:

- `cross_entropy`            cross_entropy.py:15-33  (returns loss, softmax preds)
- `binary_cross_entropy`     binary_cross_entropy.py:16-40 (with-logits, sigmoid preds)
- `aam_margin_logits`        aam_softmax.py:50-74 (ArcFace margin; the weight
                             matrix lives in models.heads.AAMSoftmaxHead)
- `triplet_loss` + `mine_triplets`  triplet_loss.py:21-107 (in-batch uniform
                             random positive/negative mining, done on-device
                             with a Gumbel-argmax instead of python loops)
- `triplet_cross_entropy`    triplet_ce_loss.py:17-39 (weighted sum)
- `ctc_loss`                 ctc_loss.py:17-58 — the reference pins CTC to the
                             CPU; optax's CTC runs on the TPU directly.
                             torch 'mean' reduction semantics (per-sample loss
                             divided by target length, then batch mean),
                             zero_infinity=True.

All functions are jittable and f32; callers cast activations down (bf16)
outside the loss.
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import optax

__all__ = [
    "cross_entropy",
    "binary_cross_entropy",
    "aam_margin_logits",
    "mine_triplets",
    "triplet_loss",
    "triplet_cross_entropy",
    "ctc_loss",
]


def cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    weights: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Mean CE over the batch; also returns softmax predictions.

    Optional per-row ``weights`` (e.g. 0 for device-divisibility padding
    rows, 1 otherwise) turn the mean into a weighted mean — the same
    padded-row exclusion contract as ctc_loss below."""
    ce = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
    if weights is None:
        loss = ce.mean()
    else:
        w = weights.astype(ce.dtype)
        loss = (ce * w).sum() / jnp.maximum(w.sum(), 1.0)
    preds = jax.lax.stop_gradient(jax.nn.softmax(logits, axis=-1))
    return loss, preds


def binary_cross_entropy(
    logits: jax.Array, labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """BCE-with-logits on [batch] or [batch, 1] logits, 0/1 labels."""
    logits = logits.reshape(-1).astype(jnp.float32)
    labels = labels.reshape(-1).astype(jnp.float32)
    loss = optax.sigmoid_binary_cross_entropy(logits, labels).mean()
    preds = jax.lax.stop_gradient(jax.nn.sigmoid(logits))
    return loss, preds


def aam_margin_logits(
    cosine: jax.Array,
    labels: jax.Array,
    margin: float = 0.2,
    scale: float = 30.0,
    easy_margin: bool = False,
) -> jax.Array:
    """Apply the additive angular margin to target-class cosines and scale.

    cosine: [batch, classes] cos(theta) from normalized embeddings x weights.
    Matches aam_softmax.py:50-69: phi = cos(theta + m); outside the monotonic
    region fall back to cos(theta) - m*sin(pi - m) (or cos(theta) when
    easy_margin).
    """
    cos_m = math.cos(margin)
    sin_m = math.sin(margin)
    th = math.cos(math.pi - margin)
    mm = math.sin(math.pi - margin) * margin

    sine = jnp.sqrt(jnp.clip(1.0 - cosine * cosine, 0.0, 1.0))
    phi = cosine * cos_m - sine * sin_m
    if easy_margin:
        phi = jnp.where(cosine > 0, phi, cosine)
    else:
        phi = jnp.where(cosine - th > 0, phi, cosine - mm)

    one_hot = jax.nn.one_hot(labels, cosine.shape[-1], dtype=cosine.dtype)
    return (one_hot * phi + (1.0 - one_hot) * cosine) * scale


def mine_triplets(
    rng: jax.Array, labels: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Uniform random in-batch triplet mining, on-device.

    For each anchor i picks a random positive j (same label, j != i) and a
    random negative k (different label) — the Gumbel-argmax over valid
    candidates is an exact uniform choice, replacing the reference's python
    `random.choice` loops (triplet_loss.py:76-97). The runtime feeds triplet
    modes through TripletBatchProcessor (>= 2 samples per present speaker),
    but anchors without a valid positive/negative can still occur in
    hand-built batches: their argmax over an all -inf row is meaningless, so
    `triplet_loss` masks them out of the mean.
    """
    b = labels.shape[0]
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(b, dtype=bool)
    pos_valid = same & ~eye
    neg_valid = ~same

    r1, r2 = jax.random.split(rng)
    g1 = jax.random.gumbel(r1, (b, b))
    g2 = jax.random.gumbel(r2, (b, b))
    neg_inf = jnp.finfo(jnp.float32).min
    pos_idx = jnp.argmax(jnp.where(pos_valid, g1, neg_inf), axis=1)
    neg_idx = jnp.argmax(jnp.where(neg_valid, g2, neg_inf), axis=1)
    return pos_idx, neg_idx


def triplet_loss(
    embeddings: jax.Array,
    labels: jax.Array,
    rng: jax.Array,
    margin: float = 1.0,
) -> jax.Array:
    """torch.nn.functional.triplet_margin_loss semantics (p=2, eps=1e-6):
    mean(max(d(a, p) - d(a, n) + margin, 0)), averaged only over anchors
    that have both a valid positive (same label, other sample) and a valid
    negative in the batch."""
    pos_idx, neg_idx = mine_triplets(rng, labels)
    anchor = embeddings
    positive = embeddings[pos_idx]
    negative = embeddings[neg_idx]

    def dist(a, b):
        return jnp.sqrt(jnp.sum((a - b + 1e-6) ** 2, axis=-1))

    per_anchor = jnp.maximum(
        dist(anchor, positive) - dist(anchor, negative) + margin, 0.0
    )
    same = labels[:, None] == labels[None, :]
    eye = jnp.eye(labels.shape[0], dtype=bool)
    valid = ((same & ~eye).any(axis=1) & (~same).any(axis=1)).astype(
        per_anchor.dtype
    )
    return (per_anchor * valid).sum() / jnp.maximum(valid.sum(), 1.0)


def triplet_cross_entropy(
    embeddings: jax.Array,
    logits: jax.Array,
    labels: jax.Array,
    rng: jax.Array,
    c_ce: float = 1.0,
    c_triplet: float = 1.0,
    margin: float = 1.0,
) -> Tuple[jax.Array, jax.Array]:
    ce, preds = cross_entropy(logits, labels)
    tri = triplet_loss(embeddings, labels, rng, margin)
    return c_ce * ce + c_triplet * tri, preds


def ctc_loss(
    logits: jax.Array,  # [batch, frames, vocab]
    logit_lengths: jax.Array,  # [batch]
    labels: jax.Array,  # [batch, max_label_len], 0 is blank/pad
    label_lengths: jax.Array,  # [batch]
    blank_id: int = 0,
) -> jax.Array:
    """CTC with torch 'mean' reduction and zero_infinity=True semantics."""
    t_frames = logits.shape[1]
    l_frames = labels.shape[1]
    logit_pad = (
        jnp.arange(t_frames)[None, :] >= logit_lengths[:, None]
    ).astype(jnp.float32)
    label_pad = (
        jnp.arange(l_frames)[None, :] >= label_lengths[:, None]
    ).astype(jnp.float32)
    per_seq = optax.ctc_loss(
        logits.astype(jnp.float32),
        logit_pad,
        labels,
        label_pad,
        blank_id=blank_id,
    )
    per_seq = jnp.where(jnp.isfinite(per_seq), per_seq, 0.0)  # zero_infinity
    # rows with empty targets are device-divisibility padding: exclude them
    # from the mean (no-op for unpadded batches)
    valid = (label_lengths > 0).astype(jnp.float32)
    per_seq = per_seq / jnp.maximum(label_lengths, 1) * valid
    return per_seq.sum() / jnp.maximum(valid.sum(), 1.0)
