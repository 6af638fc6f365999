"""Batch collation with static-shape padding (TPU/XLA friendly).

The reference pads each batch to its own max length
(`/root/reference/src/data/collating.py:102-121`), which produces a different
shape per batch — fine for eager CUDA, but each distinct shape would trigger an
XLA recompile. Here every collate can additionally round the padded length up
to a bucket boundary (`pad_to_multiple` / explicit `bucket_boundaries`) so the
number of distinct compiled shapes stays small, and we always return a length
vector so models can mask the padding.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import numpy as np

__all__ = ["PaddedBatch", "collate_pad_right", "bucket_length"]


@dataclass
class PaddedBatch:
    """Fixed-shape padded batch.

    values: [batch, max_len] or [batch, max_len, features]
    lengths: [batch] true (unpadded) frame counts
    """

    values: np.ndarray
    lengths: np.ndarray

    @property
    def mask(self) -> np.ndarray:
        """Boolean validity mask of shape [batch, max_len]."""
        max_len = self.values.shape[1]
        return np.arange(max_len)[None, :] < self.lengths[:, None]


def bucket_length(
    n: int,
    pad_to_multiple: Optional[int] = None,
    bucket_boundaries: Optional[Sequence[int]] = None,
) -> int:
    """Round a length up to the compile-shape bucket it falls in."""
    out = n
    if pad_to_multiple is not None and pad_to_multiple > 1:
        out = ((out + pad_to_multiple - 1) // pad_to_multiple) * pad_to_multiple
    if bucket_boundaries:
        for b in sorted(bucket_boundaries):
            if out <= b:
                return b
        raise ValueError(
            f"length {out} exceeds largest bucket {max(bucket_boundaries)}"
        )
    return out


def collate_pad_right(
    samples: Sequence[np.ndarray],
    value: float = 0.0,
    pad_to_multiple: Optional[int] = None,
    bucket_boundaries: Optional[Sequence[int]] = None,
    dtype=None,
) -> PaddedBatch:
    """Right-pad 1-D [frames] or 2-D [frames, features] samples and stack.

    Matches the semantics of the reference's `collate_append_constant`
    (`collating.py:102-121`) with frames as the leading axis, plus optional
    bucketing of the padded length for static XLA shapes.
    """
    if len(samples) == 0:
        raise ValueError("expected non-empty list of samples")

    ndim = samples[0].ndim
    if ndim not in (1, 2):
        raise ValueError(f"only 1-D or 2-D samples supported, got {ndim}-D")

    num_features = samples[0].shape[1] if ndim == 2 else None
    lengths = np.empty(len(samples), dtype=np.int32)
    for i, s in enumerate(samples):
        if s.ndim != ndim:
            raise ValueError("inconsistent sample dimensionality")
        if ndim == 2 and s.shape[1] != num_features:
            raise ValueError(
                f"inconsistent feature count: {s.shape[1]} vs {num_features}"
            )
        lengths[i] = s.shape[0]

    max_len = bucket_length(
        int(lengths.max()), pad_to_multiple, bucket_boundaries
    )

    out_dtype = dtype or samples[0].dtype
    shape = (len(samples), max_len) + ((num_features,) if ndim == 2 else ())
    out = np.full(shape, value, dtype=out_dtype)
    for i, s in enumerate(samples):
        out[i, : s.shape[0]] = s
    return PaddedBatch(values=out, lengths=lengths)
