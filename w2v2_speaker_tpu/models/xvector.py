"""X-vector speaker embedding network (Snyder et al. 2018).

JAX/flax re-design of the reference's speechbrain-backed `XVectorModule`
(`/root/reference/src/lightning_modules/speaker/xvector.py:47-122`, config
`config/network/xvector.yaml`): five dilated TDNN blocks
(channels 512,512,512,512,1500; kernels 5,3,3,1,1; dilations 1,2,3,1,1) over
40-mel fbank frames, masked statistics pooling (mean+std -> 3000), a linear
layer to the 512-d embedding, and a classifier head
(leaky-relu + batchnorm + linear block, then the output linear), following
speechbrain's `Xvector`/`Classifier` composition.

TDNN layers are 1-D dilated convolutions — XLA lowers these onto the MXU as
batched matmuls; with SAME padding all shapes stay static. BatchNorm keeps
running statistics in the flax `batch_stats` collection.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .pooling import MeanStdPool

__all__ = ["XVectorConfig", "XVector", "XVectorClassifier", "XVectorModel"]


@dataclass(frozen=True)
class XVectorConfig:
    in_channels: int = 40
    tdnn_channels: Tuple[int, ...] = (512, 512, 512, 512, 1500)
    tdnn_kernel_sizes: Tuple[int, ...] = (5, 3, 3, 1, 1)
    tdnn_dilations: Tuple[int, ...] = (1, 2, 3, 1, 1)
    lin_neurons: int = 512  # embedding size
    lin_blocks: int = 1  # hidden blocks in the classifier
    dtype: str = "float32"


class TDNNBlock(nn.Module):
    """Dilated 1-D conv + relu + batchnorm (channels-last)."""

    channels: int
    kernel_size: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(
            features=self.channels,
            kernel_size=(self.kernel_size,),
            kernel_dilation=(self.dilation,),
            padding="SAME",
            dtype=self.dtype,
            name="conv",
        )(x)
        x = nn.relu(x)
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            dtype=self.dtype,
            name="bn",
        )(x)
        return x


class XVector(nn.Module):
    """TDNN stack + masked stats pooling + embedding projection."""

    cfg: XVectorConfig = XVectorConfig()

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # [B, T, in_channels] fbank features
        mask: Optional[jax.Array] = None,  # [B, T] validity
        train: bool = False,
    ) -> jax.Array:  # [B, lin_neurons]
        dtype = jnp.dtype(self.cfg.dtype)
        x = x.astype(dtype)
        m = None if mask is None else mask.astype(dtype)[:, :, None]
        for i, (c, k, d) in enumerate(
            zip(
                self.cfg.tdnn_channels,
                self.cfg.tdnn_kernel_sizes,
                self.cfg.tdnn_dilations,
            )
        ):
            if m is not None:
                # zero padding frames so SAME-padded convs don't leak them
                x = x * m
            x = TDNNBlock(c, k, d, dtype=dtype, name=f"tdnn_{i}")(
                x, train=train
            )
        pooled = MeanStdPool(name="stats_pool")(x, mask)
        emb = nn.Dense(self.cfg.lin_neurons, dtype=dtype, name="embedding")(
            pooled
        )
        return emb.astype(jnp.float32)


class XVectorClassifier(nn.Module):
    """Speechbrain-style classifier head: per block leaky-relu + batchnorm +
    linear, then the output projection. Returns logits."""

    num_speakers: int
    lin_neurons: int = 512
    lin_blocks: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, emb: jax.Array, train: bool = False) -> jax.Array:
        x = emb.astype(self.dtype)
        for i in range(self.lin_blocks):
            x = nn.leaky_relu(x, negative_slope=0.01)
            x = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                dtype=self.dtype,
                name=f"bn_{i}",
            )(x)
            x = nn.Dense(self.lin_neurons, dtype=self.dtype, name=f"lin_{i}")(x)
        logits = nn.Dense(self.num_speakers, dtype=self.dtype, name="out")(x)
        return logits.astype(jnp.float32)


class XVectorModel(nn.Module):
    """Full classification model: embedding + classifier.

    `compute_embedding` / full call mirror the reference's
    `compute_speaker_embedding` / `compute_speaker_prediction` split
    (`xvector.py:101-122`).
    """

    cfg: XVectorConfig = XVectorConfig()
    num_speakers: int = 100

    def setup(self):
        self.backbone = XVector(self.cfg)
        self.classifier = XVectorClassifier(
            num_speakers=self.num_speakers,
            lin_neurons=self.cfg.lin_neurons,
            lin_blocks=self.cfg.lin_blocks,
            dtype=jnp.dtype(self.cfg.dtype),
        )

    def __call__(self, x, mask=None, train: bool = False, labels=None):
        emb = self.backbone(x, mask, train=train)
        logits = self.classifier(emb, train=train)
        return {"embedding": emb, "logits": logits}

    def compute_embedding(self, x, mask=None):
        return self.backbone(x, mask, train=False)
