"""Audio chunk selection strategies.

Host-side numpy re-implementation of the reference's `AudioChunkSelector`
(`/root/reference/src/data/preprocess/random_chunks.py:46-172`): strategies
start / end / random / random_contiguous / contiguous over the leading (time)
axis of a 1-D waveform. Randomness comes from an explicit
`numpy.random.Generator` so pipelines are reproducible per worker.
"""

from __future__ import annotations

import enum
from typing import List, Optional

import numpy as np

__all__ = ["SelectionStrategy", "ChunkSelector"]


class SelectionStrategy(str, enum.Enum):
    start = "start"
    end = "end"
    random = "random"
    random_contiguous = "random_contiguous"
    contiguous = "contiguous"
    # pass the full utterance through unchanged (the reference's full-seq
    # pipelines simply omit the selector, wav2vec_full_seq_pipeline.yaml)
    none = "none"


class ChunkSelector:
    def __init__(
        self,
        strategy: SelectionStrategy | str,
        chunk_length_sec: Optional[float],
        sample_rate: int = 16000,
    ):
        self.strategy = (
            SelectionStrategy.none
            if chunk_length_sec is None
            else SelectionStrategy(strategy)
        )
        self.chunk_size = (
            0 if chunk_length_sec is None
            else round(sample_rate * chunk_length_sec)
        )
        self.sample_rate = sample_rate

    def __call__(
        self, wav: np.ndarray, rng: Optional[np.random.Generator] = None
    ) -> List[np.ndarray]:
        """Select chunk(s) along the last axis. Returns a list of arrays
        (singleton for all strategies except `contiguous`)."""
        n = wav.shape[-1]
        c = self.chunk_size
        s = self.strategy

        if s == SelectionStrategy.none:
            return [wav]
        if s == SelectionStrategy.start:
            return [wav[..., :c]]
        if s == SelectionStrategy.end:
            return [wav[..., -c:]]
        if s == SelectionStrategy.random:
            if c >= n:
                return [wav]
            if rng is None:
                raise ValueError("random strategy requires an rng")
            # reference uses randint(0, n - c - 1) inclusive
            start = int(rng.integers(0, n - c))
            return [wav[..., start : start + c]]
        if s == SelectionStrategy.random_contiguous:
            num_chunks = n // c
            if num_chunks <= 0:
                raise ValueError(
                    f"waveform of {n} samples shorter than chunk {c}"
                )
            if rng is None:
                raise ValueError("random_contiguous strategy requires an rng")
            k = int(rng.integers(0, num_chunks))
            return [wav[..., k * c : (k + 1) * c]]
        if s == SelectionStrategy.contiguous:
            num_chunks = n // c
            if num_chunks <= 0:
                raise ValueError(
                    f"waveform of {n} samples shorter than chunk {c}"
                )
            return [wav[..., k * c : (k + 1) * c] for k in range(num_chunks)]
        raise ValueError(f"unknown strategy {s}")
