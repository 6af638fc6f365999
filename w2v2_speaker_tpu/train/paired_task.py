"""Paired speaker-verification task (BCE on equality logits).

Functional equivalent of the reference's
`PairedSpeakerRecognitionLightningModule`
(`/root/reference/src/lightning_modules/speaker/paired_speaker_recognition_module.py:36-248`):
train/val steps apply BCE-with-logits on (primary, secondary) waveform pairs;
evaluation computes EER / minDCF directly from the sigmoid scores of a trial
list (171-248) — no embedding space, no cosine normalization.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..eval.metrics import calculate_eer, calculate_mdc
from ..objectives import losses

__all__ = ["PairedSpeakerTask", "paired_scores_to_metrics"]


@dataclass
class PairedSpeakerTask:
    model: nn.Module
    rng_streams: Tuple[str, ...] = ("dropout", "masking", "layerdrop")

    def init(self, rng: jax.Array, example_batch: Dict[str, jax.Array]):
        init_rng, *streams = jax.random.split(rng, 1 + len(self.rng_streams))
        variables = self.model.init(
            dict(zip(("params",) + self.rng_streams, [init_rng] + streams)),
            example_batch["features_a"],
            example_batch["features_b"],
            example_batch.get("mask_a"),
            example_batch.get("mask_b"),
            train=False,
        )
        params = variables["params"]
        model_state = {k: v for k, v in variables.items() if k != "params"}
        return params, model_state

    def loss_fn(self, params, model_state, batch, rng, train: bool = True):
        n = len(self.rng_streams)
        rngs = dict(zip(self.rng_streams, jax.random.split(rng, n)))
        variables = {"params": params, **model_state}
        kwargs = dict(train=train)
        if train and model_state:
            out, mutated = self.model.apply(
                variables,
                batch["features_a"],
                batch["features_b"],
                batch.get("mask_a"),
                batch.get("mask_b"),
                rngs=rngs,
                mutable=list(model_state.keys()),
                **kwargs,
            )
            new_model_state = dict(mutated)
        else:
            out = self.model.apply(
                variables,
                batch["features_a"],
                batch["features_b"],
                batch.get("mask_a"),
                batch.get("mask_b"),
                rngs=rngs,
                **kwargs,
            )
            new_model_state = model_state

        loss, preds = losses.binary_cross_entropy(
            out["logit"], batch["labels"]
        )
        metrics = {
            "loss": loss,
            "accuracy": (
                (preds > 0.5) == (batch["labels"] > 0.5)
            ).astype(jnp.float32).mean(),
        }
        return loss, {
            "metrics": metrics,
            "model_state": new_model_state,
            "out": out,
        }

    def score_fn(self, params, model_state, batch) -> jax.Array:
        """Sigmoid equality scores for a batch of trial pairs."""
        variables = {"params": params, **model_state}
        out = self.model.apply(
            variables,
            batch["features_a"],
            batch["features_b"],
            batch.get("mask_a"),
            batch.get("mask_b"),
            train=False,
        )
        return jax.nn.sigmoid(out["logit"].reshape(-1))


def paired_scores_to_metrics(
    ground_truth, scores
) -> Dict[str, float]:
    """EER / minDCF straight from sigmoid scores, with the reference's
    sentinel fallbacks (paired_speaker_recognition_module.py:171-248)."""
    gt = list(np.asarray(ground_truth).astype(int))
    sc = list(np.asarray(scores).astype(float))
    try:
        eer, eer_threshold = calculate_eer(gt, sc)
    except (ValueError, ZeroDivisionError):
        eer, eer_threshold = 1, 1337
    try:
        mdc, mdc_threshold = calculate_mdc(gt, sc)
    except (ValueError, ZeroDivisionError):
        mdc, mdc_threshold = 1, 1337
    return {
        "eer": float(eer),
        "eer_threshold": float(eer_threshold),
        "mdc": float(mdc),
        "mdc_threshold": float(mdc_threshold),
    }
