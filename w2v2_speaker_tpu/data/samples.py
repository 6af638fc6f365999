"""Sample and batch containers for the host data pipeline.

Numpy re-design of the reference's batch dataclasses
(`/root/reference/src/data/modules/speaker/training_batch_speaker.py:27-248`,
`speech/training_batch_speech.py:24-135`): samples carry a key, waveform (or
features) and ground truth; collate functions right-pad to (optionally
bucketed) static shapes and emit the dict batches the jitted train steps
consume ('features'/'mask'/'labels' [+ 'keys' host-side]). There is no
`.to(device)` — batches cross to the device via `parallel.mesh.shard_batch`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

from .collate import collate_pad_right

__all__ = [
    "SpeakerSample",
    "PairedSample",
    "SpeechSample",
    "collate_speaker_batch",
    "collate_paired_batch",
    "collate_speech_batch",
]


@dataclass
class SpeakerSample:
    key: str  # 'spk/yt/utt' id
    wav: np.ndarray  # [samples] float32 (or [frames, feats] features)
    ground_truth: int  # speaker index
    meta: Dict[str, Any] = field(default_factory=dict)


@dataclass
class PairedSample:
    primary_key: str
    primary_wav: np.ndarray
    secondary_key: str
    secondary_wav: np.ndarray
    ground_truth: int  # 1 same speaker, 0 different


@dataclass
class SpeechSample:
    key: str
    wav: np.ndarray
    transcription: str
    tokens: Optional[np.ndarray] = None  # int labels (CTC targets)
    # speaker index for joint speaker+speech training (the reference's
    # multitask module contract, mt_speech_speaker_module.py:83-96; its
    # data side was never built — LibriSpeech keys `<spk>-<chapter>-<utt>`
    # carry the speaker for free)
    speaker_idx: Optional[int] = None


def collate_speaker_batch(
    samples: Sequence[SpeakerSample],
    pad_to_multiple: Optional[int] = None,
    bucket_boundaries: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    batch = collate_pad_right(
        [s.wav for s in samples],
        pad_to_multiple=pad_to_multiple,
        bucket_boundaries=bucket_boundaries,
        dtype=np.float32,
    )
    out = {
        "features": batch.values,
        "labels": np.asarray([s.ground_truth for s in samples], np.int32),
        "keys": [s.key for s in samples],
    }
    # Fixed-crop batches (the speaker training path) have no padding; omit
    # the all-valid mask so the models skip every masked-statistics /
    # attention-bias path (mask=None means all frames valid — identical
    # output, slightly less work per step). Variable-length batches keep
    # the mask, preserving the padded==unpadded invariance contract.
    if not batch.mask.all():
        out["mask"] = batch.mask
    return out


def collate_paired_batch(
    samples: Sequence[PairedSample],
    pad_to_multiple: Optional[int] = None,
    bucket_boundaries: Optional[Sequence[int]] = None,
) -> Dict[str, Any]:
    a = collate_pad_right(
        [s.primary_wav for s in samples],
        pad_to_multiple=pad_to_multiple,
        bucket_boundaries=bucket_boundaries,
        dtype=np.float32,
    )
    b = collate_pad_right(
        [s.secondary_wav for s in samples],
        pad_to_multiple=pad_to_multiple,
        bucket_boundaries=bucket_boundaries,
        dtype=np.float32,
    )
    out = {
        "features_a": a.values,
        "features_b": b.values,
        "labels": np.asarray([s.ground_truth for s in samples], np.int32),
        "keys": [
            (s.primary_key, s.secondary_key) for s in samples
        ],
    }
    # see collate_speaker_batch: all-valid masks are omitted (fixed crops)
    if not a.mask.all():
        out["mask_a"] = a.mask
    if not b.mask.all():
        out["mask_b"] = b.mask
    return out


def collate_speech_batch(
    samples: Sequence[SpeechSample],
    pad_to_multiple: Optional[int] = None,
    bucket_boundaries: Optional[Sequence[int]] = None,
    label_pad_to_multiple: int = 8,
) -> Dict[str, Any]:
    batch = collate_pad_right(
        [s.wav for s in samples],
        pad_to_multiple=pad_to_multiple,
        bucket_boundaries=bucket_boundaries,
        dtype=np.float32,
    )
    tokens = [np.asarray(s.tokens, np.int32) for s in samples]
    labels = collate_pad_right(
        tokens, value=0, pad_to_multiple=label_pad_to_multiple, dtype=np.int32
    )
    out = {
        "features": batch.values,
        "mask": batch.mask,
        "labels": labels.values,
        "label_lengths": labels.lengths,
        "transcriptions": [s.transcription for s in samples],
        "keys": [s.key for s in samples],
    }
    if all(s.speaker_idx is not None for s in samples):
        out["speaker_labels"] = np.asarray(
            [s.speaker_idx for s in samples], np.int32
        )
    return out
