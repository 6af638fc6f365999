"""Classification / scoring heads.

- `AAMSoftmaxHead`: angular-additive-margin softmax (ArcFace) head owning its
  weight matrix, as in the reference's `AngularAdditiveMarginSoftMaxLoss`
  (`/root/reference/src/optim/loss/aam_softmax.py:22-74`; margin 0.2,
  scale 30 per `config/optim/loss/aam_softmax.yaml:3-7`). Returns
  (loss, softmax predictions).
- `FCHead`: the wav2vec2_fc prediction stack — a list of Dense layers with
  the embedding tapped at `embedding_layer_idx`
  (`/root/reference/src/lightning_modules/speaker/wav2vec2_fc.py:184-224`,
  363-412): dropout + optional activation between layers; when AAM is the
  objective the final Dense is dropped and the AAM head consumes the
  embedding directly (wav2vec2_fc.py:212-224).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..objectives.losses import aam_margin_logits, cross_entropy

__all__ = ["AAMSoftmaxHead", "FCHead"]


class AAMSoftmaxHead(nn.Module):
    num_classes: int
    margin: float = 0.2
    scale: float = 30.0
    easy_margin: bool = False

    @nn.compact
    def __call__(
        self,
        embedding: jax.Array,
        labels: Optional[jax.Array] = None,
        weights: Optional[jax.Array] = None,
    ):
        """With labels: (loss, preds). Without: plain cosine logits * scale.
        ``weights`` (optional, per-row) exclude device-divisibility padding
        rows from the loss mean (multitask token-budget batches)."""
        w = self.param(
            "weights",
            nn.initializers.xavier_normal(),
            (self.num_classes, embedding.shape[-1]),
        )
        x = embedding / jnp.maximum(
            jnp.linalg.norm(embedding, axis=-1, keepdims=True), 1e-12
        )
        wn = w / jnp.maximum(
            jnp.linalg.norm(w, axis=-1, keepdims=True), 1e-12
        )
        cosine = x @ wn.T
        if labels is None:
            return cosine * self.scale
        logits = aam_margin_logits(
            cosine, labels, self.margin, self.scale, self.easy_margin
        )
        return cross_entropy(logits, labels, weights)


class FCHead(nn.Module):
    """Dense stack producing (embedding, logits), mirroring the reference's
    fc_list semantics (`wav2vec2_fc.py:184-233`, 363-412):

    - one (Dense -> ReLU) block per entry of `hidden_sizes`, then a final
      plain Dense to `num_out` (the classifier)
    - the speaker embedding is the output of block `embedding_layer_idx`
      (-1 = the pooled input itself)
    - with `use_aam` the final Dense is omitted (the AAM head replaces it,
      wav2vec2_fc.py:212-224) and logits is None
    - with `ctc_blank_bias` the final Dense bias gets index 0 initialized to
      that value (blank prior for speaker-CTC, wav2vec2_fc.py:226-233)
    """

    hidden_sizes: Sequence[int]
    num_out: int = 0
    embedding_layer_idx: int = -1
    use_aam: bool = False
    ctc_blank_bias: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, train: bool = False
    ) -> Tuple[jax.Array, Optional[jax.Array]]:
        embedding = x
        h = x
        for i, size in enumerate(self.hidden_sizes):
            h = nn.Dense(size, name=f"fc_{i}")(h)
            h = nn.relu(h)
            if i == self.embedding_layer_idx:
                embedding = h
        if self.use_aam:
            return embedding, None

        def bias_init(key, shape, dtype=jnp.float32):
            b = jnp.zeros(shape, dtype)
            if self.ctc_blank_bias:
                b = b.at[0].set(self.ctc_blank_bias)
            return b

        logits = nn.Dense(
            self.num_out, name="fc_out", bias_init=bias_init
        )(h)
        if self.embedding_layer_idx == len(self.hidden_sizes):
            embedding = logits
        return embedding, logits
