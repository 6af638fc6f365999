"""Joint speaker + speech recognition task (multitask).

The working realization of the reference's declared-but-unimplemented
`SpeakerAndSpeechRecognitionModule`
(`/root/reference/src/lightning_modules/multitask/mt_speech_speaker_module.py:38-282`
— every step is `pass`; `main.py:304-307` raises "No multi-task networks
yet!"): one shared-backbone forward per batch feeds both objectives,

    loss = speech_weight * CTC(ctc_logits, tokens)
         + speaker_weight * (CE | AAM)(speaker logits/embedding, speaker)

with per-task losses tracked separately (the reference's
metric_train_loss_speech / metric_train_loss_speaker intent,
mt_speech_speaker_module.py:60-63). The loss_fn signature matches the
other task families, so the unified pjit step builders (train/steps.py)
drive it unchanged; WER evaluation shares evaluate_wer_over_batches with
the speech task and speaker-EER evaluation shares the cosine evaluator
with the speaker task.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..data.tokenizer import CharTokenizer
from ..objectives import losses
from .speech_task import evaluate_wer_over_batches

__all__ = ["MultitaskTask"]


@dataclass
class MultitaskTask:
    model: nn.Module
    tokenizer: CharTokenizer
    mode: str = "ce"  # speaker objective: "ce" | "aam"
    speech_weight: float = 1.0
    speaker_weight: float = 1.0
    rng_streams: Tuple[str, ...] = ("dropout", "pooling", "masking", "layerdrop")

    def __post_init__(self):
        if self.mode not in ("ce", "aam"):
            raise ValueError(f"unknown speaker mode {self.mode}")

    def init(self, rng: jax.Array, example_batch: Dict):
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

    def loss_fn(self, params, model_state, batch, rng, train: bool = True):
        rngs = dict(
            zip(self.rng_streams, jax.random.split(rng, len(self.rng_streams)))
        )
        variables = {"params": params, **model_state}
        speaker_labels = batch.get("speaker_labels")
        if speaker_labels is None:
            raise ValueError(
                "multitask batches need 'speaker_labels' — set "
                "data.module.with_speaker_labels=true"
            )
        # token-budget batches are right-padded to a device-divisible row
        # count (runtime pads with empty CTC targets); those rows must not
        # enter the speaker mean either
        row_valid = (batch["label_lengths"] > 0).astype(jnp.float32)
        kwargs = dict(train=train)
        if self.mode == "aam":
            kwargs["labels"] = speaker_labels
            kwargs["label_weights"] = row_valid

        if train and model_state:
            out, mutated = self.model.apply(
                variables,
                batch["features"],
                batch.get("mask"),
                rngs=rngs,
                mutable=list(model_state.keys()),
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

        # --- speech objective (CTC over frame logits)
        ctc_logits = out["ctc_logits"]
        frame_mask = out.get("frame_mask")
        if frame_mask is not None:
            logit_lengths = frame_mask.sum(axis=-1).astype(jnp.int32)
        else:
            logit_lengths = jnp.full(
                (ctc_logits.shape[0],), ctc_logits.shape[1], jnp.int32
            )
        loss_speech = losses.ctc_loss(
            ctc_logits,
            logit_lengths,
            batch["labels"],
            batch["label_lengths"],
            blank_id=self.tokenizer.blank_id,
        )

        # --- speaker objective (CE or AAM; the AAM head owns its loss)
        if self.mode == "aam":
            loss_speaker = out["loss"]
            preds = out.get("preds")
        else:
            loss_speaker, preds = losses.cross_entropy(
                out["logits"], speaker_labels, weights=row_valid
            )

        loss = (
            self.speech_weight * loss_speech
            + self.speaker_weight * loss_speaker
        )
        metrics = {
            "loss": loss,
            "loss_speech": loss_speech,
            "loss_speaker": loss_speaker,
        }
        if preds is not None:
            correct = (
                jnp.argmax(preds, axis=-1) == speaker_labels
            ).astype(jnp.float32)
            metrics["accuracy"] = (correct * row_valid).sum() / jnp.maximum(
                row_valid.sum(), 1.0
            )
        aux = {
            "metrics": metrics,
            "model_state": new_model_state,
            "out": {
                "embedding": out["embedding"],
                "logits": ctc_logits,
                "logit_lengths": logit_lengths,
            },
        }
        return loss, aux

    # ------------------------------------------------------------ eval

    def logits_fn(self, params, model_state, features, mask):
        """(features, mask) -> (ctc logits, lengths) for jitted WER eval."""
        variables = {"params": params, **model_state}
        out = self.model.apply(variables, features, mask, train=False)
        logits = out["ctc_logits"]
        fm = out.get("frame_mask")
        if fm is not None:
            lengths = fm.sum(axis=-1).astype(jnp.int32)
        else:
            lengths = jnp.full((logits.shape[0],), logits.shape[1], jnp.int32)
        return logits, lengths

    def embed_fn(self, params, model_state, features, mask=None):
        """Deterministic speaker-embedding extraction (eval path)."""
        variables = {"params": params, **model_state}
        return self.model.apply(
            variables,
            features,
            mask,
            method=type(self.model).compute_embedding,
        )

    def evaluate_wer(
        self, params, model_state, batches, logits_fn, pad_rows_to: int = 0
    ) -> Dict[str, float]:
        return evaluate_wer_over_batches(
            self.tokenizer, batches, logits_fn, pad_rows_to
        )
