"""Pooling zoo: reduce [batch, time, features] to [batch, features'].

Masked re-design of the reference pooling layers
(`/root/reference/src/layers/pooling.py:24-166`). The reference evaluates on
unpadded batch-size-1 utterances and so never needed masking; on TPU we batch
padded full utterances (static XLA shapes), so every pooling op takes a
validity mask and must be exactly invariant to padding.

Provided (names match the reference's `stat_pooling_type` config values):
- ``mean``         MeanStatPool1D
- ``mean+std``     MeanStdStatPool1D — note the reference concatenates
                   (std, mean) in that order (torch.std_mean tuple order);
                   preserved here, with ddof=1 std
- ``quantile``     QuantilePool1D — 5 quantiles (0, .25, .5, .75, 1) with
                   linear interpolation, output [batch, 5*features]
- ``max``          MaxPool1D
- ``attentive``    AttentiveStatPool1D (speechbrain-style attentive statistics
                   pooling with optional global context) — output 2*features
- ``first``, ``first+cls``, ``middle``, ``last``, ``random``  IndexPool1D.
  The reference's "middle" actually selects "last" (`pooling.py:121-122`,
  a bug flagged in SURVEY §7.4); here "middle" selects the true middle
  (of the unpadded length).
- ``none``         NoPooling (returns input unchanged)
"""

from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

__all__ = [
    "MeanPool",
    "MeanStdPool",
    "QuantilePool",
    "MaxPool",
    "AttentiveStatPool",
    "IndexPool",
    "NoPool",
    "get_pooling",
    "pooled_embedding_size",
    "masked_mean_std",
]

_EPS = 1e-12


def _full_mask(x: jax.Array, mask: Optional[jax.Array]) -> jax.Array:
    if mask is None:
        return jnp.ones(x.shape[:2], dtype=jnp.float32)
    return mask.astype(jnp.float32)


def masked_mean_std(
    x: jax.Array, mask: Optional[jax.Array], ddof: int = 1
) -> tuple[jax.Array, jax.Array]:
    """Masked mean and std over the time axis of [B, T, F].

    The eps inside the sqrt keeps the backward pass finite when a channel is
    constant over time (e.g. dead ReLU channels feeding stats pooling) —
    sqrt'(0) is infinite; speechbrain's StatisticsPooling guards the same
    case by adding gaussian noise.
    """
    m = _full_mask(x, mask)[:, :, None]
    n = jnp.maximum(m.sum(axis=1), 1.0)
    mean = (x * m).sum(axis=1) / n
    var = ((x - mean[:, None, :]) ** 2 * m).sum(axis=1) / jnp.maximum(
        n - ddof, 1.0
    )
    return mean, jnp.sqrt(jnp.maximum(var, 0.0) + 1e-10)


class MeanPool(nn.Module):
    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        m = _full_mask(x, mask)[:, :, None]
        return (x * m).sum(axis=1) / jnp.maximum(m.sum(axis=1), 1.0)


class MeanStdPool(nn.Module):
    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        mean, std = masked_mean_std(x, mask, ddof=1)
        # reference order: cat(std, mean) — torch.std_mean returns (std, mean)
        return jnp.concatenate([std, mean], axis=-1)


class MaxPool(nn.Module):
    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        m = _full_mask(x, mask)[:, :, None]
        neg = jnp.finfo(x.dtype).min
        return jnp.where(m > 0, x, neg).max(axis=1)


class QuantilePool(nn.Module):
    """Quantiles (0, .25, .5, .75, 1) over valid frames, linear interpolation.

    Matches torch.quantile semantics on the unpadded sequence: position
    q * (len - 1), linear interpolation between adjacent order statistics.
    Output layout [batch, 5 * features], quantile-major like the reference's
    flatten of [batch, 5, features].
    """

    quantiles: tuple = (0.0, 0.25, 0.5, 0.75, 1.0)

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, t, f = x.shape
        m = _full_mask(x, mask)
        lengths = m.sum(axis=1)  # [B]
        big = jnp.finfo(x.dtype).max
        x_sorted = jnp.sort(
            jnp.where(m[:, :, None] > 0, x, big), axis=1
        )  # valid entries first, ascending
        q = jnp.asarray(self.quantiles, dtype=jnp.float32)  # [Q]
        pos = q[None, :] * (lengths[:, None] - 1.0)  # [B, Q]
        lo = jnp.clip(jnp.floor(pos), 0, t - 1).astype(jnp.int32)
        hi = jnp.clip(jnp.ceil(pos), 0, t - 1).astype(jnp.int32)
        w = (pos - lo.astype(jnp.float32))[:, :, None]  # [B, Q, 1]
        gather = jax.vmap(lambda xs, idx: xs[idx], in_axes=(0, 0))
        v_lo = gather(x_sorted, lo)  # [B, Q, F]
        v_hi = gather(x_sorted, hi)
        out = v_lo * (1.0 - w) + v_hi * w
        return out.reshape(b, len(self.quantiles) * f)


class AttentiveStatPool(nn.Module):
    """Attentive statistics pooling (Okabe et al. 2018 / ECAPA-TDNN §3.2).

    Speechbrain-equivalent structure
    (used by the reference via `AttentiveStatisticsPooling`,
    `pooling.py:87-106` and inside ECAPA): optional global context
    (concat of x, masked mean, masked std per time step), a 1x1 TDNN block
    (dense + relu + batchnorm) to `attention_channels`, tanh, a 1x1 conv back
    to `features`, masked softmax over time, then attention-weighted mean and
    std concatenated -> [batch, 2 * features].
    """

    attention_channels: int = 128
    global_context: bool = True

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        m = _full_mask(x, mask)  # [B, T]
        m3 = m[:, :, None]
        n = jnp.maximum(m3.sum(axis=1, keepdims=True), 1.0)  # [B, 1, 1]

        if self.global_context:
            mean = (x * m3).sum(axis=1, keepdims=True) / n
            var = ((x - mean) ** 2 * m3).sum(axis=1, keepdims=True) / n
            std = jnp.sqrt(jnp.maximum(var, _EPS))
            t_ = x.shape[1]
            attn_in = jnp.concatenate(
                [
                    x,
                    jnp.broadcast_to(mean, x.shape),
                    jnp.broadcast_to(std, x.shape),
                ],
                axis=-1,
            )
        else:
            attn_in = x

        h = nn.Dense(self.attention_channels, name="attn_tdnn")(attn_in)
        h = nn.relu(h)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, name="attn_bn"
        )(h)
        h = jnp.tanh(h)
        e = nn.Dense(x.shape[-1], name="attn_proj")(h)  # [B, T, F]

        e = jnp.where(m3 > 0, e, jnp.finfo(e.dtype).min)
        w = jax.nn.softmax(e, axis=1)  # [B, T, F]
        w = w * m3  # kill padding numerically

        mean = (w * x).sum(axis=1)
        var = (w * (x - mean[:, None, :]) ** 2).sum(axis=1)
        std = jnp.sqrt(jnp.maximum(var, _EPS))
        return jnp.concatenate([mean, std], axis=-1)


class IndexPool(nn.Module):
    """Select one frame: first / first+cls / middle / last / random."""

    method: str = "first"

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        b, t, f = x.shape
        if self.method in ("first", "first+cls"):
            return x[:, 0, :]
        lengths = _full_mask(x, mask).sum(axis=1).astype(jnp.int32)
        if self.method == "middle":
            idx = lengths // 2
        elif self.method == "last":
            idx = lengths - 1
        elif self.method == "random":
            if train:
                rng = self.make_rng("pooling")
                u = jax.random.uniform(rng, (b,))
                idx = jnp.floor(u * lengths.astype(jnp.float32)).astype(
                    jnp.int32
                )
                idx = jnp.clip(idx, 0, lengths - 1)
            else:
                idx = lengths // 2
        else:
            raise ValueError(f"unknown index pooling method {self.method}")
        return jax.vmap(lambda xs, i: xs[i], in_axes=(0, 0))(x, idx)


class NoPool(nn.Module):
    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        return x


_POOL_FACTORY: dict[str, Callable[..., nn.Module]] = {
    "mean": MeanPool,
    "mean+std": MeanStdPool,
    "quantile": QuantilePool,
    "max": MaxPool,
    "attentive": AttentiveStatPool,
    "first": lambda **kw: IndexPool(method="first"),
    "first+cls": lambda **kw: IndexPool(method="first+cls"),
    "middle": lambda **kw: IndexPool(method="middle"),
    "last": lambda **kw: IndexPool(method="last"),
    "random": lambda **kw: IndexPool(method="random"),
    "none": NoPool,
}


def get_pooling(name: str, **kwargs) -> nn.Module:
    if name not in _POOL_FACTORY:
        raise ValueError(
            f"unknown pooling '{name}', available: {sorted(_POOL_FACTORY)}"
        )
    return _POOL_FACTORY[name](**kwargs)


def pooled_embedding_size(name: str, feature_size: int) -> int:
    """Output feature count of a pooling op given its input feature count."""
    if name in ("mean", "max", "first", "first+cls", "middle", "last",
                "random", "none"):
        return feature_size
    if name in ("mean+std", "attentive"):
        return 2 * feature_size
    if name == "quantile":
        return 5 * feature_size
    raise ValueError(f"unknown pooling '{name}'")
