"""Speaker-recognition task: loss assembly over any (embedding, logits) model.

Functional re-design of the reference's
`SpeakerRecognitionLightningModule` training modes
(`/root/reference/src/lightning_modules/speaker/speaker_recognition_module.py:85-107`,
`_determine_training_mode`): ``ce``, ``ce_no_pool`` (frame-level CE with
repeated labels, speaker_recognition_module.py:246-267), ``aam`` (CE mode
whose head applies the angular margin), ``triplet``, ``triplet_ce`` and
``speaker_ctc`` (CTC against the single speaker label shifted +1,
speaker_recognition_module.py:222-244).

The model contract: a flax module whose ``__call__(x, mask, train, labels)``
returns a dict with keys
- ``embedding`` [B, D] (or [B, T, D] for no-pool modes)
- ``logits``    [B, C] / [B, T, C], or None under AAM
- ``loss``/``preds`` when the module owns its loss head (AAM).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..objectives import losses

__all__ = ["SpeakerTask", "TRAINING_MODES"]

TRAINING_MODES = (
    "ce",
    "ce_no_pool",
    "aam",
    "triplet",
    "triplet_ce",
    "speaker_ctc",
)


@dataclass
class SpeakerTask:
    model: nn.Module
    mode: str = "ce"
    triplet_margin: float = 1.0
    c_ce: float = 1.0
    c_triplet: float = 1.0
    rng_streams: Tuple[str, ...] = ("dropout", "pooling", "masking", "layerdrop")

    def __post_init__(self):
        if self.mode not in TRAINING_MODES:
            raise ValueError(
                f"unknown training mode {self.mode}; one of {TRAINING_MODES}"
            )

    # ------------------------------------------------------------ init

    def init(self, rng: jax.Array, example_batch: Dict[str, jax.Array]):
        """Returns (params, model_state)."""
        init_rng, *streams = jax.random.split(rng, 1 + len(self.rng_streams))
        variables = self.model.init(
            dict(zip(("params",) + self.rng_streams, [init_rng] + streams)),
            example_batch["features"],
            example_batch.get("mask"),
            train=False,
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    # ------------------------------------------------------------ loss

    def loss_fn(
        self,
        params,
        model_state,
        batch: Dict[str, jax.Array],
        rng: jax.Array,
        train: bool = True,
    ):
        """Returns (loss, aux) with aux = dict(metrics=..., model_state=...)."""
        n_streams = len(self.rng_streams)
        stream_rngs = jax.random.split(rng, n_streams + 1)
        rngs = dict(zip(self.rng_streams, stream_rngs[:n_streams]))
        loss_rng = stream_rngs[n_streams]

        variables = {"params": params, **model_state}
        labels = batch.get("labels")
        kwargs: Dict[str, Any] = dict(train=train)
        if self.mode == "aam":
            kwargs["labels"] = labels

        if train:
            out, mutated = self.model.apply(
                variables,
                batch["features"],
                batch.get("mask"),
                rngs=rngs,
                mutable=list(model_state.keys()) or ["batch_stats"],
                **kwargs,
            )
            new_model_state = dict(mutated)
        else:
            out = self.model.apply(
                variables,
                batch["features"],
                batch.get("mask"),
                rngs=rngs,
                **kwargs,
            )
            new_model_state = model_state

        loss, preds = self._compute_loss(out, batch, loss_rng)
        metrics = {"loss": loss}
        if (
            labels is not None
            and preds is not None
            and preds.ndim == 2
            and preds.shape[0] == labels.shape[0]
        ):
            metrics["accuracy"] = (
                (jnp.argmax(preds, axis=-1) == labels).astype(jnp.float32).mean()
            )
        aux = {"metrics": metrics, "model_state": new_model_state, "out": out}
        return loss, aux

    def _compute_loss(self, out, batch, rng):
        labels = batch.get("labels")
        mode = self.mode
        if mode == "aam":
            return out["loss"], out.get("preds")
        if mode == "ce":
            return losses.cross_entropy(out["logits"], labels)
        if mode == "ce_no_pool":
            logits = out["logits"]  # [B, T, C]
            b, t, c = logits.shape
            flat_logits = logits.reshape(b * t, c)
            flat_labels = jnp.repeat(labels, t)
            # models that downsample time (wav2vec2) return their own
            # frame-level mask; the batch mask is input-resolution
            mask = out.get("frame_mask", batch.get("mask"))
            if mask is None:
                return losses.cross_entropy(flat_logits, flat_labels)
            import optax

            per = optax.softmax_cross_entropy_with_integer_labels(
                flat_logits, flat_labels
            )
            m = mask.reshape(b * t).astype(jnp.float32)
            loss = (per * m).sum() / jnp.maximum(m.sum(), 1.0)
            preds = jax.lax.stop_gradient(
                jax.nn.softmax(flat_logits, axis=-1)
            )
            return loss, preds
        if mode == "triplet":
            return (
                losses.triplet_loss(
                    out["embedding"], labels, rng, self.triplet_margin
                ),
                None,
            )
        if mode == "triplet_ce":
            return losses.triplet_cross_entropy(
                out["embedding"],
                out["logits"],
                labels,
                rng,
                self.c_ce,
                self.c_triplet,
                self.triplet_margin,
            )
        if mode == "speaker_ctc":
            # CTC over per-frame speaker logits; target = single speaker
            # label shifted +1 (blank stays 0)
            logits = out["logits"]  # [B, T, C+1]
            mask = out.get("frame_mask", batch.get("mask"))
            if mask is not None:
                logit_lengths = mask.sum(axis=-1).astype(jnp.int32)
            else:
                logit_lengths = jnp.full(
                    (logits.shape[0],), logits.shape[1], dtype=jnp.int32
                )
            ctc_labels = (labels + 1)[:, None]
            label_lengths = jnp.ones_like(labels, dtype=jnp.int32)
            loss = losses.ctc_loss(
                logits, logit_lengths, ctc_labels, label_lengths
            )
            return loss, None
        raise ValueError(f"unhandled mode {mode}")

    # ------------------------------------------------------------ embed

    def embed_fn(
        self, params, model_state, features, mask=None
    ) -> jax.Array:
        """Deterministic speaker-embedding extraction (eval path)."""
        variables = {"params": params, **model_state}
        out = self.model.apply(variables, features, mask, train=False)
        return out["embedding"]
