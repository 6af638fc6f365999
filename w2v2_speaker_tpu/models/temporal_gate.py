"""Temporal gating (squeeze-excitation) layer from wav2spk.

Re-design of the reference `TemporalGate`
(`/root/reference/src/layers/temporal_gating.py:20-37`): per-frame gate
sigmoid(W x_t + b) elementwise-multiplied with x_t. The reference operates on
[batch, features, frames]; here the canonical layout is channels-last
[batch, frames, features] so the gate is a single MXU matmul.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = ["TemporalGate"]


class TemporalGate(nn.Module):
    features: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:  # [B, T, F]
        w = self.param(
            "W",
            nn.initializers.xavier_normal(),
            (self.features, self.features),
        )
        b = self.param(
            "b",
            nn.initializers.normal(
                stddev=(2.0 / (self.features + 1)) ** 0.5
            ),
            (self.features,),
        )
        gate = jax.nn.sigmoid(jnp.einsum("btf,gf->btg", x, w) + b)
        return gate * x
