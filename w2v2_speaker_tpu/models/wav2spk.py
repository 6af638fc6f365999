"""wav2spk: raw-waveform CNN speaker embedder (Lin & Mak, Interspeech 2020).

JAX/flax re-design of the reference `Wav2SpkModule`
(`/root/reference/src/lightning_modules/speaker/wav2spk.py:48-299`):

- feature encoder: 5 strided conv layers (k/s 10/5, 5/4, 5/2, 3/2, 3/2;
  channels 40, 200, 300, 512, 512; torch-style explicit padding 4/2/2/1/1),
  instance norm + ReLU after each
- temporal gating (learned VAD, `layers/temporal_gating.py:20-37`) — optional
- feature aggregator: 4 conv layers (k3 s1 p1, 512 ch, ReLU)
- mean or mean+std pooling -> FC head (hidden Dense+ReLU blocks, final
  classifier; the reference appends log-softmax which CE re-normalizes —
  we emit plain logits). AAM is rejected like the reference (wav2spk.py:96).

Channels-last throughout; instance norm = per-sample per-channel norm over
time, masked for padded batches.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from .heads import FCHead
from .pooling import MeanPool, MeanStdPool
from .temporal_gate import TemporalGate

__all__ = ["Wav2SpkConfig", "Wav2SpkModel"]

_ENCODER = (  # (channels, kernel, stride, padding)
    (40, 10, 5, 4),
    (200, 5, 4, 2),
    (300, 5, 2, 2),
    (512, 3, 2, 1),
    (512, 3, 2, 1),
)
_AGGREGATOR = ((512, 3, 1, 1),) * 4


@dataclass(frozen=True)
class Wav2SpkConfig:
    apply_temporal_gating: bool = True
    hidden_fc_layers_out: Tuple[int, ...] = ()
    embedding_layer_idx: int = -1
    stat_pooling_type: str = "mean"  # 'mean' | 'mean+std'
    dtype: str = "float32"


def _masked_instance_norm(x, mask, eps=1e-5):
    """InstanceNorm1d semantics: per sample, per channel, over time."""
    if mask is None:
        mean = x.mean(axis=1, keepdims=True)
        var = x.var(axis=1, keepdims=True)
    else:
        m = mask.astype(x.dtype)[:, :, None]
        n = jnp.maximum(m.sum(axis=1, keepdims=True), 1.0)
        mean = (x * m).sum(axis=1, keepdims=True) / n
        var = ((x - mean) ** 2 * m).sum(axis=1, keepdims=True) / n
    return (x - mean) * jax.lax.rsqrt(var + eps)


def _conv_out_length(n, kernel, stride, padding):
    return (n + 2 * padding - kernel) // stride + 1


class Wav2SpkModel(nn.Module):
    cfg: Wav2SpkConfig = Wav2SpkConfig()
    num_speakers: int = 100

    def setup(self):
        cfg = self.cfg
        if cfg.stat_pooling_type == "mean":
            self.stat_pooling = MeanPool()
            pool_dim = 512
        elif cfg.stat_pooling_type == "mean+std":
            self.stat_pooling = MeanStdPool()
            pool_dim = 1024
        else:
            raise ValueError(
                f"unknown pooling {cfg.stat_pooling_type}; "
                "wav2spk supports 'mean' and 'mean+std'"
            )
        self.pool_dim = pool_dim
        self.gate = TemporalGate(512)
        self.head = FCHead(
            hidden_sizes=cfg.hidden_fc_layers_out,
            num_out=self.num_speakers,
            embedding_layer_idx=cfg.embedding_layer_idx,
        )

    @nn.compact
    def _trunk(self, wav, wav_mask, train):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        x = wav[:, :, None].astype(dtype)
        lengths = (
            None if wav_mask is None else wav_mask.sum(axis=-1)
        )

        def frame_mask(n_frames):
            if lengths is None:
                return None
            return jnp.arange(n_frames)[None, :] < cur_len[:, None]

        cur_len = lengths
        for i, (c, k, s, p) in enumerate(_ENCODER):
            x = nn.Conv(
                c,
                kernel_size=(k,),
                strides=(s,),
                padding=[(p, p)],
                dtype=dtype,
                name=f"enc_{i}",
            )(x)
            if cur_len is not None:
                cur_len = _conv_out_length(cur_len, k, s, p)
            fm = frame_mask(x.shape[1])
            x = _masked_instance_norm(x, fm)
            x = nn.relu(x)
            if fm is not None:
                x = x * fm.astype(x.dtype)[:, :, None]

        if cfg.apply_temporal_gating:
            x = self.gate(x)

        for i, (c, k, s, p) in enumerate(_AGGREGATOR):
            x = nn.Conv(
                c,
                kernel_size=(k,),
                strides=(s,),
                padding=[(p, p)],
                dtype=dtype,
                name=f"agg_{i}",
            )(x)
            x = nn.relu(x)
            fm = frame_mask(x.shape[1])
            if fm is not None:
                x = x * fm.astype(x.dtype)[:, :, None]

        return x.astype(jnp.float32), frame_mask(x.shape[1])

    def __call__(self, wav, wav_mask=None, train: bool = False, labels=None):
        features, fmask = self._trunk(wav, wav_mask, train)
        pooled = self.stat_pooling(features, fmask)
        embedding, logits = self.head(pooled, train=train)
        return {"embedding": embedding, "logits": logits}

    def compute_embedding(self, wav, wav_mask=None):
        out = self(wav, wav_mask, train=False)
        return out["embedding"]
