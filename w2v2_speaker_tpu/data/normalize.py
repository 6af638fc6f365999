"""Per-utterance input normalization.

Equivalent of the reference's `InputNormalizer2D`
(`/root/reference/src/data/preprocess/input_normalisation.py:38-84`):
mean/variance-normalize a 2-D [frames, features] array either per feature
channel (statistics over frames) or globally, with eps=1e-5 added to the std.
The std uses ddof=1 (torch.std_mean default: unbiased). A 1-D waveform helper
is provided for raw-wave pipelines (treated as a single channel).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

__all__ = ["normalize_2d", "normalize_waveform"]

_EPS = 1e-5


def normalize_2d(
    spectrogram: np.ndarray, channel_wise: bool = True
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Normalize [frames, features]; returns (normalized, mean, std)."""
    if spectrogram.ndim != 2:
        raise ValueError(
            f"expected 2-D [frames, features] input, got {spectrogram.shape}"
        )
    if channel_wise:
        mean = spectrogram.mean(axis=0)
        std = spectrogram.std(axis=0, ddof=1)
    else:
        mean = spectrogram.mean()
        std = spectrogram.std(ddof=1)
    normalized = (spectrogram - mean) / (std + _EPS)
    return normalized, mean, std


def normalize_waveform(wav: np.ndarray) -> np.ndarray:
    """Mean/variance-normalize a 1-D waveform (global statistics)."""
    if wav.ndim != 1:
        raise ValueError(f"expected 1-D waveform, got {wav.shape}")
    mean = wav.mean()
    std = wav.std(ddof=1)
    return (wav - mean) / (std + _EPS)
