"""wav2vec v1 (Schneider et al. 2019) native implementation + speaker heads.

The reference loads fairseq checkpoints and uses only the feature extractor
(+ optional aggregator) as a 512-d frame embedder
(`/root/reference/src/models/wav2vec.py:24-95`). Fairseq isn't a dependency
here; the architecture is implemented natively:

- feature encoder: strided 1-D convs [(512,10,5),(512,8,4),(512,4,2),
  (512,4,2),(512,4,2)], each conv -> dropout -> per-layer group norm
  (single-group == layer norm over (C, T) per sample) -> ReLU, followed by
  wav2vec's log compression log(1 + |x|)
- aggregator: k=3 stride-1 convs (9 layers for the base model) with
  residual connections and same normalization, 512 channels

Speaker heads mirror the reference modules:
- `Wav2Vec1FCModel`  (`wav2vec_fc.py:53-241`): features -> mean / mean+std
  pooling -> Dense+ReLU stack -> classifier logits
- `Wav2Vec1XVectorModel` (`wav2vec_xvector.py:53-170`): features -> x-vector
  TDNN head

`fairseq_state_dict_to_flax` ports torch checkpoints of this architecture
(keys `feature_extractor.conv_layers.{i}.0.*`, `feature_aggregator.*`).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Mapping, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .heads import FCHead
from .pooling import MeanPool, MeanStdPool
from .xvector import XVectorConfig, XVectorModel

__all__ = [
    "Wav2Vec1Config",
    "Wav2Vec1Encoder",
    "Wav2Vec1FCModel",
    "Wav2Vec1XVectorModel",
    "fairseq_state_dict_to_flax",
]


@dataclass(frozen=True)
class Wav2Vec1Config:
    conv_layers: Tuple[Tuple[int, int, int], ...] = (
        (512, 10, 5),
        (512, 8, 4),
        (512, 4, 2),
        (512, 4, 2),
        (512, 4, 2),
    )
    agg_layers: int = 9
    agg_kernel: int = 3
    agg_dim: int = 512
    dropout: float = 0.0
    log_compression: bool = True
    skip_connections_agg: bool = True
    use_aggregator: bool = False
    dtype: str = "float32"


class _SampleNorm(nn.Module):
    """fairseq Fp32GroupNorm(1, C): normalize over (T, C) per sample."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        x32 = x.astype(jnp.float32)
        if mask is None:
            mean = x32.mean(axis=(1, 2), keepdims=True)
            var = x32.var(axis=(1, 2), keepdims=True)
        else:
            m = mask.astype(jnp.float32)[:, :, None]
            n = jnp.maximum(m.sum(axis=(1, 2), keepdims=True) * c, 1.0)
            mean = (x32 * m).sum(axis=(1, 2), keepdims=True) / n
            var = ((x32 - mean) ** 2 * m).sum(
                axis=(1, 2), keepdims=True
            ) / n
        y = (x32 - mean) * jax.lax.rsqrt(var + 1e-5)
        return (y * scale + bias).astype(self.dtype)


class Wav2Vec1Encoder(nn.Module):
    """Raw waveform [B, N] -> features [B, T, 512] (+ frame mask)."""

    cfg: Wav2Vec1Config = Wav2Vec1Config()

    @property
    def num_features(self) -> int:
        return (
            self.cfg.agg_dim
            if self.cfg.use_aggregator
            else self.cfg.conv_layers[-1][0]
        )

    def frame_lengths(self, lengths):
        for _, k, s in self.cfg.conv_layers:
            lengths = (lengths - k) // s + 1
        return lengths

    @nn.compact
    def __call__(self, wav, wav_mask=None, train: bool = False):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = wav[:, :, None].astype(dtype)
        lengths = None if wav_mask is None else wav_mask.sum(axis=-1)

        def mask_for(t):
            if lengths is None:
                return None
            return jnp.arange(t)[None, :] < cur_len[:, None]

        cur_len = lengths
        for i, (c, k, s) in enumerate(cfg.conv_layers):
            x = nn.Conv(
                c, (k,), strides=(s,), padding="VALID", dtype=dtype,
                name=f"fe_conv_{i}",
            )(x)
            if cur_len is not None:
                cur_len = (cur_len - k) // s + 1
            fm = mask_for(x.shape[1])
            x = nn.Dropout(rate=cfg.dropout, deterministic=not train)(x)
            x = _SampleNorm(dtype=dtype, name=f"fe_norm_{i}")(x, fm)
            x = nn.relu(x)
            if fm is not None:
                x = x * fm.astype(x.dtype)[:, :, None]

        if cfg.log_compression:
            x = jnp.log(1.0 + jnp.abs(x))

        frame_mask = mask_for(x.shape[1])

        if cfg.use_aggregator:
            pad = cfg.agg_kernel // 2
            for i in range(cfg.agg_layers):
                residual = x
                y = nn.Conv(
                    cfg.agg_dim,
                    (cfg.agg_kernel,),
                    padding=[(pad, pad)],
                    dtype=dtype,
                    name=f"agg_conv_{i}",
                )(x if frame_mask is None else x * frame_mask.astype(x.dtype)[:, :, None])
                y = nn.Dropout(rate=cfg.dropout, deterministic=not train)(y)
                y = _SampleNorm(dtype=dtype, name=f"agg_norm_{i}")(
                    y, frame_mask
                )
                y = nn.relu(y)
                if cfg.skip_connections_agg and residual.shape == y.shape:
                    y = y + residual
                x = y
            if frame_mask is not None:
                x = x * frame_mask.astype(x.dtype)[:, :, None]

        return x.astype(jnp.float32), frame_mask


class Wav2Vec1FCModel(nn.Module):
    """wav2vec v1 features -> mean/mean+std pooling -> FC classifier
    (`wav2vec_fc.py:53-241`; the reference appends log-softmax which CE
    re-normalizes — plain logits here)."""

    cfg: Wav2Vec1Config = Wav2Vec1Config()
    stat_pooling_type: str = "mean"
    hidden_fc_layers_out: Tuple[int, ...] = ()
    embedding_layer_idx: int = -1
    num_speakers: int = 100

    def setup(self):
        if self.stat_pooling_type == "mean":
            self.stat_pooling = MeanPool()
        elif self.stat_pooling_type == "mean+std":
            self.stat_pooling = MeanStdPool()
        else:
            raise ValueError(
                "wav2vec v1 FC supports 'mean' and 'mean+std' pooling"
            )
        self.encoder = Wav2Vec1Encoder(self.cfg)
        self.head = FCHead(
            hidden_sizes=self.hidden_fc_layers_out,
            num_out=self.num_speakers,
            embedding_layer_idx=self.embedding_layer_idx,
        )

    def __call__(self, wav, wav_mask=None, train: bool = False, labels=None):
        features, frame_mask = self.encoder(wav, wav_mask, train=train)
        pooled = self.stat_pooling(features, frame_mask)
        embedding, logits = self.head(pooled, train=train)
        return {"embedding": embedding, "logits": logits}

    def compute_embedding(self, wav, wav_mask=None):
        return self(wav, wav_mask)["embedding"]


class Wav2Vec1XVectorModel(nn.Module):
    """wav2vec v1 features (512) -> x-vector TDNN head
    (`wav2vec_xvector.py:53-170`)."""

    cfg: Wav2Vec1Config = Wav2Vec1Config()
    xvector: XVectorConfig = XVectorConfig(in_channels=512)
    num_speakers: int = 100

    def setup(self):
        self.encoder = Wav2Vec1Encoder(self.cfg)
        self.head = XVectorModel(
            cfg=self.xvector, num_speakers=self.num_speakers
        )

    def __call__(self, wav, wav_mask=None, train: bool = False, labels=None):
        features, frame_mask = self.encoder(wav, wav_mask, train=train)
        return self.head(features, frame_mask, train=train, labels=labels)

    def compute_embedding(self, wav, wav_mask=None):
        features, frame_mask = self.encoder(wav, wav_mask, train=False)
        return self.head.compute_embedding(features, frame_mask)


def fairseq_state_dict_to_flax(
    state_dict: Mapping[str, "object"], cfg: Wav2Vec1Config = Wav2Vec1Config()
) -> Dict:
    """Port a fairseq Wav2VecModel torch state dict (encoder + aggregator
    weights only) into the `Wav2Vec1Encoder` param tree."""

    def _t(x):
        if hasattr(x, "detach"):
            x = x.detach().cpu().numpy()
        return np.asarray(x, dtype=np.float32)

    params: Dict = {}
    for i in range(len(cfg.conv_layers)):
        w = _t(state_dict[f"feature_extractor.conv_layers.{i}.0.weight"])
        params[f"fe_conv_{i}"] = {
            "kernel": np.transpose(w, (2, 1, 0)),
            "bias": _t(
                state_dict.get(
                    f"feature_extractor.conv_layers.{i}.0.bias",
                    np.zeros(w.shape[0]),
                )
            ),
        }
        params[f"fe_norm_{i}"] = {
            "scale": _t(
                state_dict[f"feature_extractor.conv_layers.{i}.2.weight"]
            ).reshape(-1),
            "bias": _t(
                state_dict[f"feature_extractor.conv_layers.{i}.2.bias"]
            ).reshape(-1),
        }
    if cfg.use_aggregator:
        for i in range(cfg.agg_layers):
            key = f"feature_aggregator.conv_layers.{i}"
            w = _t(state_dict[f"{key}.0.weight"])
            params[f"agg_conv_{i}"] = {
                "kernel": np.transpose(w, (2, 1, 0)),
                "bias": _t(
                    state_dict.get(f"{key}.0.bias", np.zeros(w.shape[0]))
                ),
            }
            params[f"agg_norm_{i}"] = {
                "scale": _t(state_dict[f"{key}.2.weight"]).reshape(-1),
                "bias": _t(state_dict[f"{key}.2.bias"]).reshape(-1),
            }
    return params
