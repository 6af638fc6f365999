"""Dynamic int8 matmuls for TPU inference (the MXU's 2x path).

The v5e MXU executes int8 x int8 -> int32 at ~394 TOPS — double its bf16
peak — and XLA lowers `lax.dot_general` on int8 operands with
`preferred_element_type=int32` straight onto it. This module exposes that
as `QuantDense`: a drop-in `nn.Dense` replacement with the SAME parameter
layout ('kernel' [in, out], 'bias' [out]) so checkpoints, the HF weight
converter, and the tensor-parallel sharding rules are untouched; only the
matmul arithmetic changes:

- activations: dynamic symmetric per-token (per-row) absmax int8
- weights: symmetric per-output-channel absmax int8 (quantized from the
  served kernel inside the program — one extra pass over the weights,
  ~0.25 ms for all of BASE, amortized against the ~2x matmul speedup)
- accumulation in int32, rescale in f32: out = acc * row_scale * col_scale

This is an inference-path feature (`Wav2Vec2Config.int8_matmuls`, used by
the extraction/serving entry points): no gradient support is defined, and
training recipes keep bf16. Quality is validated by the end-to-end parity
harness (tests/test_quant.py): embedding cosine vs the bf16 path and EER
agreement on a synthetic trial set.

The reference has no analogue (it serves f16/f32 through torch,
`/root/reference/src/predict.py:128-170`); this is TPU-hardware headroom
the rebuild claims on top of parity.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "int8_matmul",
    "QuantDense",
    "int8_auto_policy",
    "INT8_AUTO_MIN_SAMPLES",
]

# Measured BASE crossover for `network.int8_matmuls=auto` (PERF.md int8
# matrix, real v5e): at 3 s clips the unquantized conv encoder plus the
# dynamic-quantize passes absorb the MXU saving (−1.2…+3.7 %, inside
# noise); at 12 s the dense stack dominates and int8 wins +14 %. The
# crossover sweep (tools/bench_int8.py --sweep-seconds) puts the
# break-even in the 4–6 s band; 6 s is the conservative default.
INT8_AUTO_MIN_SAMPLES = 6 * 16000


def int8_auto_policy(
    padded_samples: int,
    hidden_size: int,
    min_samples: int = INT8_AUTO_MIN_SAMPLES,
) -> bool:
    """Per-bucket bf16-vs-int8 dispatch rule for the serving path.

    Encodes the measured int8 matrix (PERF.md round 3/4, real v5e):
    LARGE (hidden_size >= 1024) is matmul-bound at every clip length
    (+23 % at 3 s) so int8 always wins; BASE only wins once the padded
    clip is long enough that the transformer dense stack dominates the
    (unquantized) conv encoder — +14 % at 12 s, noise at 3 s.
    """
    if hidden_size >= 1024:
        return True
    return padded_samples >= min_samples


def _rowwise_quantize(x: jax.Array):
    """[..., K] f32/bf16 -> (int8 values, [...] f32 inverse scales).

    Symmetric absmax: q = round(x * 127 / absmax_row). Zero rows get scale
    1 (they quantize to exact zeros).
    """
    x32 = x.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(x32), axis=-1, keepdims=True)
    scale = jnp.where(absmax > 0, absmax / 127.0, 1.0)
    q = jnp.clip(jnp.round(x32 / scale), -127, 127).astype(jnp.int8)
    return q, scale


def int8_matmul(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x [..., K] @ kernel [K, N] via dynamic int8 with f32 rescale.

    Returns f32. Both operands are quantized here (activations per-row,
    kernel per-column); XLA maps the int8 dot onto the MXU's double-rate
    path and fuses the quantize/rescale elementwise passes around it.
    """
    xq, xs = _rowwise_quantize(x)
    # per-output-channel: absmax over the contraction (K) axis
    kq, ks = _rowwise_quantize(kernel.astype(jnp.float32).T)
    acc = jax.lax.dot_general(
        xq,
        kq.T,
        (((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * xs * ks[:, 0][None, :]


class QuantDense(nn.Module):
    """`nn.Dense` with the matmul executed as dynamic int8 on the MXU.

    Parameter names, shapes, and initializers are identical to
    `nn.Dense(features, use_bias=...)`; `dtype` sets the OUTPUT dtype
    (matching nn.Dense's compute-dtype contract closely enough for the
    surrounding bf16 graph). Inference only — no custom VJP is defined.
    """

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        out = int8_matmul(x, kernel)
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,)
            )
            out = out + bias.astype(jnp.float32)
        dtype = self.dtype or x.dtype
        return out.astype(dtype)
