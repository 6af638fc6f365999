"""ECAPA-TDNN speaker embedding network (Desplanques et al. 2020).

JAX/flax re-design of the reference's speechbrain-backed `EcapaTdnnModule`
(`/root/reference/src/lightning_modules/speaker/ecapa_tdnn.py:51-137`, config
`config/network/ecapa_tdnn.yaml`: channels 1024x4 + 3072, kernels 5/3/3/3/1,
dilations 1/2/3/4/1, attention 128, res2net scale 8, SE 128, global context,
192-d embedding):

input TDNN block -> 3 SE-Res2Net blocks (1x1 TDNN -> hierarchical Res2Net
dilated convs -> 1x1 TDNN -> squeeze-excitation, residual add) ->
multi-layer feature aggregation (concat of the 3 block outputs, 1x1 TDNN to
3072) -> attentive statistics pooling (masked) -> batchnorm -> linear to the
192-d embedding. Under AAM the classifier is skipped and the AAM head
consumes the embedding directly (ecapa_tdnn.py:98-100, 129-137).

Everything is channels-last; dilated 1-D convs lower to MXU matmuls with
static shapes. Masking follows the framework-wide contract (padding-invariant
outputs; new vs the reference which evaluated unpadded at batch 1).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import AAMSoftmaxHead
from .pooling import AttentiveStatPool

__all__ = ["EcapaConfig", "EcapaTdnn", "EcapaModel"]


@dataclass(frozen=True)
class EcapaConfig:
    in_channels: int = 80
    channels: Tuple[int, ...] = (1024, 1024, 1024, 1024, 3072)
    kernel_sizes: Tuple[int, ...] = (5, 3, 3, 3, 1)
    dilations: Tuple[int, ...] = (1, 2, 3, 4, 1)
    attention_channels: int = 128
    res2net_scale: int = 8
    se_channels: int = 128
    global_context: bool = True
    lin_neurons: int = 192  # embedding size
    dtype: str = "float32"


class _TDNNBlock(nn.Module):
    channels: int
    kernel_size: int
    dilation: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        if mask is not None and self.kernel_size > 1:
            # zero padding frames so SAME-padded convs read zeros beyond the
            # valid length in batched exactly like in unpadded inputs
            x = x * mask.astype(x.dtype)[:, :, None]
        x = nn.Conv(
            self.channels,
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


class _Res2NetBlock(nn.Module):
    """Hierarchical multi-scale convs: split channels into `scale` groups;
    group 0 passes through, group i is conv(x_i + y_{i-1})."""

    channels: int
    scale: int
    kernel_size: int
    dilation: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        width = self.channels // self.scale
        xs = jnp.split(x, self.scale, axis=-1)
        ys = [xs[0]]
        prev = None
        for i in range(1, self.scale):
            inp = xs[i] if prev is None else xs[i] + prev
            prev = _TDNNBlock(
                width,
                self.kernel_size,
                self.dilation,
                dtype=self.dtype,
                name=f"block_{i - 1}",
            )(inp, mask, train=train)
            ys.append(prev)
        return jnp.concatenate(ys, axis=-1)


class _SEBlock(nn.Module):
    """Squeeze-excitation over the (masked) time mean."""

    se_channels: int
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        if mask is not None:
            m = mask.astype(x.dtype)[:, :, None]
            s = (x * m).sum(axis=1, keepdims=True) / jnp.maximum(
                m.sum(axis=1, keepdims=True), 1.0
            )
        else:
            s = x.mean(axis=1, keepdims=True)
        s = nn.relu(nn.Dense(self.se_channels, dtype=self.dtype, name="fc1")(s))
        s = jax.nn.sigmoid(
            nn.Dense(self.out_channels, dtype=self.dtype, name="fc2")(s)
        )
        return x * s


class _SERes2NetBlock(nn.Module):
    channels: int
    kernel_size: int
    dilation: int
    scale: int
    se_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        residual = x
        y = _TDNNBlock(self.channels, 1, 1, dtype=self.dtype, name="tdnn_in")(
            x, mask, train=train
        )
        y = _Res2NetBlock(
            self.channels,
            self.scale,
            self.kernel_size,
            self.dilation,
            dtype=self.dtype,
            name="res2net",
        )(y, mask, train=train)
        y = _TDNNBlock(self.channels, 1, 1, dtype=self.dtype, name="tdnn_out")(
            y, mask, train=train
        )
        y = _SEBlock(
            self.se_channels, self.channels, dtype=self.dtype, name="se"
        )(y, mask)
        return y + residual


class EcapaTdnn(nn.Module):
    """Fbank features [B, T, mels] -> embedding [B, lin_neurons]."""

    cfg: EcapaConfig = EcapaConfig()

    @nn.compact
    def __call__(self, x, mask=None, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = x.astype(dtype)
        x = _TDNNBlock(
            cfg.channels[0],
            cfg.kernel_sizes[0],
            cfg.dilations[0],
            dtype=dtype,
            name="tdnn_0",
        )(x, mask, train=train)

        block_outputs = []
        for i in range(1, len(cfg.channels) - 1):
            x = _SERes2NetBlock(
                cfg.channels[i],
                cfg.kernel_sizes[i],
                cfg.dilations[i],
                cfg.res2net_scale,
                cfg.se_channels,
                dtype=dtype,
                name=f"se_res2net_{i - 1}",
            )(x, mask, train=train)
            block_outputs.append(x)

        # multi-layer feature aggregation
        x = jnp.concatenate(block_outputs, axis=-1)
        x = _TDNNBlock(
            cfg.channels[-1],
            cfg.kernel_sizes[-1],
            cfg.dilations[-1],
            dtype=dtype,
            name="mfa",
        )(x, mask, train=train)

        pooled = AttentiveStatPool(
            attention_channels=cfg.attention_channels,
            global_context=cfg.global_context,
            name="asp",
        )(x, mask, train=train)  # [B, 2 * channels[-1]]
        pooled = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            dtype=dtype,
            name="asp_bn",
        )(pooled)
        emb = nn.Dense(cfg.lin_neurons, dtype=dtype, name="fc")(pooled)
        return emb.astype(jnp.float32)


class EcapaModel(nn.Module):
    """Classification wrapper with AAM (the recipe default) or plain CE.

    With `use_aam` the classifier layer is skipped entirely, like the
    reference (ecapa_tdnn.py:98-100).
    """

    cfg: EcapaConfig = EcapaConfig()
    num_speakers: int = 100
    use_aam: bool = True
    aam_margin: float = 0.2
    aam_scale: float = 30.0

    def setup(self):
        self.backbone = EcapaTdnn(self.cfg)
        if self.use_aam:
            self.aam = AAMSoftmaxHead(
                num_classes=self.num_speakers,
                margin=self.aam_margin,
                scale=self.aam_scale,
            )
        else:
            self.classifier = nn.Dense(self.num_speakers, name="classifier")

    def __call__(self, x, mask=None, train: bool = False, labels=None):
        emb = self.backbone(x, mask, train=train)
        result = {"embedding": emb, "logits": None}
        if self.use_aam:
            if labels is not None:
                loss, preds = self.aam(emb, labels)
                result["loss"] = loss
                result["preds"] = preds
            else:
                self.aam(emb)
        else:
            result["logits"] = self.classifier(emb)
        return result

    def compute_embedding(self, x, mask=None):
        return self.backbone(x, mask, train=False)
