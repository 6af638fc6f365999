"""Log-mel filterbank features, computed on-device as MXU matmuls.

The reference extracts 40-mel fbanks host-side via speechbrain's Fbank
(`/root/reference/src/data/preprocess/audio_features.py:63-84`: STFT with
25 ms hamming windows, 10 ms hop, n_fft=400, triangular mel filters, log).
Here the whole transform is a jittable JAX function so it fuses into the
training step: framing via `conv_general_dilated_patches`, the DFT as two
real matmuls (cos/sin projection — small fixed 400x201 matrices are faster
and more robust on the MXU than a generic FFT at this size), mel projection
as a third matmul, then log.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["FbankConfig", "log_mel_filterbank", "mel_filterbank_matrix", "num_frames"]


@dataclass(frozen=True)
class FbankConfig:
    sample_rate: int = 16000
    n_fft: int = 400
    win_length: int = 400  # 25 ms
    hop_length: int = 160  # 10 ms
    n_mels: int = 40
    f_min: float = 0.0
    f_max: Optional[float] = None  # defaults to sample_rate / 2
    log_eps: float = 1e-10
    center: bool = True  # torch.stft-style reflect padding


def _hz_to_mel(hz: np.ndarray) -> np.ndarray:
    return 2595.0 * np.log10(1.0 + hz / 700.0)


def _mel_to_hz(mel: np.ndarray) -> np.ndarray:
    return 700.0 * (10.0 ** (mel / 2595.0) - 1.0)


def mel_filterbank_matrix(cfg: FbankConfig) -> np.ndarray:
    """Triangular mel filterbank, shape [n_fft // 2 + 1, n_mels]."""
    f_max = cfg.f_max if cfg.f_max is not None else cfg.sample_rate / 2.0
    n_bins = cfg.n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, cfg.sample_rate / 2.0, n_bins)

    mel_pts = np.linspace(
        _hz_to_mel(np.array(cfg.f_min)),
        _hz_to_mel(np.array(f_max)),
        cfg.n_mels + 2,
    )
    hz_pts = _mel_to_hz(mel_pts)

    lower = hz_pts[:-2][None, :]  # [1, n_mels]
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = fft_freqs[:, None]  # [n_bins, 1]

    up_slope = (f - lower) / np.maximum(center - lower, 1e-10)
    down_slope = (upper - f) / np.maximum(upper - center, 1e-10)
    fb = np.maximum(0.0, np.minimum(up_slope, down_slope))
    return fb.astype(np.float32)


@functools.lru_cache(maxsize=8)
def _dft_and_mel(cfg: FbankConfig) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Precompute (cos, sin, mel) projection matrices and the window."""
    n = cfg.n_fft
    n_bins = n // 2 + 1
    k = np.arange(n)[:, None]  # time index
    f = np.arange(n_bins)[None, :]  # frequency index
    angle = -2.0 * np.pi * k * f / n
    window = np.hamming(cfg.win_length).astype(np.float32)
    if cfg.win_length < n:
        pad = (n - cfg.win_length) // 2
        window = np.pad(window, (pad, n - cfg.win_length - pad))
    cos_m = (np.cos(angle) * window[:, None]).astype(np.float32)
    sin_m = (np.sin(angle) * window[:, None]).astype(np.float32)
    mel = mel_filterbank_matrix(cfg)
    return cos_m, sin_m, mel


def num_frames(num_samples: int, cfg: FbankConfig = FbankConfig()) -> int:
    """Frame count for a waveform of `num_samples` samples."""
    if cfg.center:
        return num_samples // cfg.hop_length + 1
    return 1 + (num_samples - cfg.n_fft) // cfg.hop_length


def log_mel_filterbank(
    wav: jax.Array,
    cfg: FbankConfig = FbankConfig(),
    lengths: Optional[jax.Array] = None,
) -> jax.Array:
    """[batch, samples] waveform -> [batch, frames, n_mels] log-mel features.

    Jittable; all heavy lifting is three matmuls on the MXU.

    `lengths` [batch] gives the true (pre-padding) sample count per row. With
    center=True the reflection then happens at each utterance's TRUE end (a
    per-row gather), not at the zero-padded batch edge — so the first
    `num_frames(length)` frames of a padded row are bit-identical to the
    unpadded computation (padding invariance; frames beyond that are garbage
    and must be masked by the caller).
    """
    if wav.ndim != 2:
        raise ValueError(f"expected [batch, samples], got {wav.shape}")
    cos_m, sin_m, mel = _dft_and_mel(cfg)

    x = wav.astype(jnp.float32)
    if cfg.center:
        p = cfg.n_fft // 2
        if lengths is None:
            x = jnp.pad(x, ((0, 0), (p, p)), mode="reflect")
        else:
            n = x.shape[1]
            last = jnp.maximum(lengths.astype(jnp.int32) - 1, 0)[:, None]
            j = jnp.arange(-p, n + p, dtype=jnp.int32)[None, :]
            i = jnp.abs(j)  # left-edge reflect (excl. edge, as jnp.pad)
            i = jnp.where(i > last, 2 * last - i, i)  # right at true end
            i = jnp.clip(i, 0, n - 1)  # all-padding rows degrade gracefully
            x = jnp.take_along_axis(x, jnp.broadcast_to(i, (x.shape[0], i.shape[1])), axis=1)

    # frames: [batch, num_frames, n_fft]
    frames = jax.lax.conv_general_dilated_patches(
        x[:, :, None],
        filter_shape=(cfg.n_fft,),
        window_strides=(cfg.hop_length,),
        padding="VALID",
        dimension_numbers=("NWC", "WIO", "NWC"),
    )

    # full f32 MXU precision: log-compression amplifies small-bin error
    hi = jax.lax.Precision.HIGHEST
    real = jnp.einsum("btn,nf->btf", frames, jnp.asarray(cos_m), precision=hi)
    imag = jnp.einsum("btn,nf->btf", frames, jnp.asarray(sin_m), precision=hi)
    power = real * real + imag * imag
    mels = jnp.einsum("btf,fm->btm", power, jnp.asarray(mel), precision=hi)
    return jnp.log(mels + cfg.log_eps)
