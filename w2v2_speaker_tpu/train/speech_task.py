"""Speech-recognition (CTC) task: loss, greedy decode, WER evaluation.

Functional equivalent of the reference's
`SpeechRecognitionLightningModule`
(`/root/reference/src/lightning_modules/speech/speech_recognition_module.py:37-288`):
CTC loss over frame logits (blank 0, zero_infinity, torch-mean reduction —
objectives/losses.py), greedy argmax decode (233-248) and corpus WER via
eval/metrics.calculate_wer (178-231). The CTC loss runs on the TPU (the
reference pins it to CPU, `ctc_loss.py:46-56`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..data.tokenizer import CharTokenizer
from ..eval.metrics import calculate_wer
from ..objectives import losses

__all__ = ["SpeechTask", "evaluate_wer_over_batches"]


def evaluate_wer_over_batches(
    tokenizer: CharTokenizer,
    batches,
    logits_fn,
    pad_rows_to: int = 0,
) -> Dict[str, float]:
    """Corpus WER over batches carrying 'transcriptions' via a (possibly
    jitted/sharded) (features, mask) -> (logits, lengths) closure; greedy
    argmax decode stays host-side (reference
    speech_recognition_module.py:233-248). ``pad_rows_to`` pads ragged
    trailing batches to a fixed row count so bucketed shapes stay static
    and divisible by the mesh data axis; padded rows are dropped before
    decoding. Shared by the speech and multitask evaluation paths."""
    hyps: List[str] = []
    refs: List[str] = []
    for batch in batches:
        feats = batch["features"]
        mask = batch.get("mask")
        n = feats.shape[0]
        if pad_rows_to and n < pad_rows_to:
            from ..parallel.mesh import pad_batch_rows

            db = {"features": feats}
            if mask is not None:
                db["mask"] = mask
            db = pad_batch_rows(db, pad_rows_to, mask_fill=True)
            feats, mask = db["features"], db.get("mask")
        logits, lengths = logits_fn(feats, mask)
        hyps.extend(
            tokenizer.decode_batch(
                np.asarray(logits)[:n], np.asarray(lengths)[:n]
            )
        )
        refs.extend(batch["transcriptions"])
    return {"wer": calculate_wer(hyps, refs)}


@dataclass
class SpeechTask:
    model: nn.Module
    tokenizer: CharTokenizer
    rng_streams: Tuple[str, ...] = ("dropout", "masking", "layerdrop")

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
        if train and model_state:
            out, mutated = self.model.apply(
                variables,
                batch["features"],
                batch.get("mask"),
                train=train,
                rngs=rngs,
                mutable=list(model_state.keys()),
            )
            new_model_state = dict(mutated)
        else:
            out = self.model.apply(
                variables,
                batch["features"],
                batch.get("mask"),
                train=train,
                rngs=rngs,
            )
            new_model_state = model_state

        logits = out["logits"]
        frame_mask = out.get("frame_mask")
        if frame_mask is not None:
            logit_lengths = frame_mask.sum(axis=-1).astype(jnp.int32)
        else:
            logit_lengths = jnp.full(
                (logits.shape[0],), logits.shape[1], jnp.int32
            )
        loss = losses.ctc_loss(
            logits,
            logit_lengths,
            batch["labels"],
            batch["label_lengths"],
            blank_id=self.tokenizer.blank_id,
        )
        aux = {
            "metrics": {"loss": loss},
            "model_state": new_model_state,
            "out": {"logits": logits, "logit_lengths": logit_lengths},
        }
        return loss, aux

    # ------------------------------------------------------------ decoding

    def logits_fn(self, params, model_state, features, mask):
        """Device-side eval forward -> (logits [B, T', V], lengths [B]).

        Pure function of arrays so it can be jitted + mesh-sharded once per
        bucket shape (the reference evaluates eagerly per batch,
        speech_recognition_module.py:178-231 — pathological through a
        remote-TPU transport)."""
        variables = {"params": params, **model_state}
        out = self.model.apply(variables, features, mask, train=False)
        logits = out["logits"]
        fm = out.get("frame_mask")
        if fm is not None:
            lengths = fm.sum(axis=-1).astype(jnp.int32)
        else:
            lengths = jnp.full((logits.shape[0],), logits.shape[1], jnp.int32)
        return logits, lengths

    def transcribe(
        self, params, model_state, batch
    ) -> List[str]:
        """Greedy CTC transcription of a batch (eager reference path; the
        runtime uses evaluate_wer with a jitted logits_fn instead)."""
        logits, lengths = self.logits_fn(
            params, model_state, batch["features"], batch.get("mask")
        )
        return self.tokenizer.decode_batch(
            np.asarray(logits), np.asarray(lengths)
        )

    def evaluate_wer(
        self, params, model_state, batches, logits_fn=None,
        pad_rows_to: int = 0,
    ) -> Dict[str, float]:
        """Corpus WER over an iterable of batches carrying 'transcriptions'.

        With ``logits_fn`` (a possibly jitted/sharded (features, mask) ->
        (logits, lengths) closure over the train state), the device program
        is issued once per bucket shape (evaluate_wer_over_batches); without
        one, the eager reference path transcribes per batch."""
        if logits_fn is None:
            hyps: List[str] = []
            refs: List[str] = []
            for batch in batches:
                hyps.extend(self.transcribe(params, model_state, batch))
                refs.extend(batch["transcriptions"])
            return {"wer": calculate_wer(hyps, refs)}
        return evaluate_wer_over_batches(
            self.tokenizer, batches, logits_fn, pad_rows_to
        )
