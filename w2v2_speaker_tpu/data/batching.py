"""Streaming batch builders (the reference's "batch processors").

Numpy/generator re-implementations of
`/root/reference/src/data/modules/speaker/voxceleb.py:829-1400` and
`speech/librispeech.py:526-658`, with explicit `numpy.random.Generator`
state instead of the global `random` module:

- `RandomBatchProcessor`: shuffle queue of `max_queue_size`, draw fixed-size
  batches at random (voxceleb.py:829-885)
- `TripletBatchProcessor`: even batches of (anchor, positive) same-speaker
  couples, >= 2 samples per chosen speaker (voxceleb.py:888-1062); optional
  `ensure_all_samples_seen` drains leftovers for validation
- `PairedBatchProcessor`: 'generate' mode builds pos/neg pairs on the fly at
  `pos_neg_training_batch_ratio` from `sequential_same_speaker_samples` runs
  with 2^n speaker weighting; 'reproduce' mode materializes the exact trial
  list (voxceleb.py:1065-1400); `yield_limit` equalizes per-host batch
  counts (the DDP accommodation at voxceleb.py:1079)
- `DynamicTokenBudgetBatcher`: token-budget batching for speech — sorts the
  queue by length and grows a batch around a random seed sample while
  batch_size * max_len <= max_samples_in_batch (librispeech.py:526-658).
  For the TPU the padded length is additionally bucketed so the number of
  compiled shapes stays bounded.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Callable, Dict, Iterable, Iterator, List, Optional

import numpy as np

from .samples import PairedSample, SpeakerSample, SpeechSample
from .trials import EvaluationPair

__all__ = [
    "RandomBatchProcessor",
    "TripletBatchProcessor",
    "PairedBatchProcessor",
    "DynamicTokenBudgetBatcher",
]


class RandomBatchProcessor:
    def __init__(
        self,
        max_batch_size: int,
        max_queue_size: int,
        collate_fn: Callable[[List[SpeakerSample]], Dict],
        seed: int = 0,
    ):
        if max_batch_size <= 0:
            raise ValueError("max_batch_size needs to be a positive integer")
        if max_queue_size <= 0 or max_queue_size < max_batch_size:
            raise ValueError(
                f"queue size must be >= max_batch_size={max_batch_size}"
            )
        self.max_batch_size = max_batch_size
        self.max_queue_size = max_queue_size
        self.collate_fn = collate_fn
        self.rng = np.random.default_rng(seed)

    def __call__(self, samples: Iterable[SpeakerSample]) -> Iterator[Dict]:
        queue: List[SpeakerSample] = []
        for s in samples:
            queue.append(s)
            if len(queue) >= self.max_queue_size:
                yield self._draw(queue)
        while queue:
            yield self._draw(queue)

    def _draw(self, queue: List[SpeakerSample]) -> Dict:
        batch = []
        while len(batch) < self.max_batch_size and queue:
            batch.append(queue.pop(int(self.rng.integers(len(queue)))))
        return self.collate_fn(batch)


class TripletBatchProcessor:
    def __init__(
        self,
        max_batch_size: int,
        max_queue_size: int,
        collate_fn: Callable[[List[SpeakerSample]], Dict],
        ensure_all_samples_seen: bool = False,
        seed: int = 0,
    ):
        if max_batch_size % 2 == 1:
            raise ValueError("batch size needs to be even to allow triplets")
        self.max_batch_size = max_batch_size
        self.max_queue_size = max_queue_size
        self.collate_fn = collate_fn
        self.ensure_all_samples_seen = ensure_all_samples_seen
        self.rng = np.random.default_rng(seed)

    def __call__(self, samples: Iterable[SpeakerSample]) -> Iterator[Dict]:
        by_speaker: Dict[int, List[SpeakerSample]] = defaultdict(list)
        size = 0
        seen_keys = set()

        def can_fill():
            """A FULL fixed-size batch of (anchor, positive) pairs spanning
            >= 2 distinct speakers — unlike the reference (which yields
            ragged batches the moment 2 speakers are valid,
            voxceleb.py:930-931), XLA wants static shapes, so we queue until
            max_batch_size is actually drawable."""
            valid = [k for k, v in by_speaker.items() if len(v) >= 2]
            pairs = sum(len(v) // 2 for v in by_speaker.values())
            return len(valid) >= 2 and pairs >= self.max_batch_size // 2

        for s in samples:
            if s.key in seen_keys:
                raise ValueError(f"duplicate sample {s.key}")
            seen_keys.add(s.key)
            by_speaker[s.ground_truth].append(s)
            size += 1
            if size >= self.max_queue_size and can_fill():
                yield self._draw(by_speaker)
                size = sum(len(v) for v in by_speaker.values())
            if size >= self.max_queue_size * 2:
                raise ValueError(
                    "queue exceeded limit while unable to ensure triplets"
                )
        while can_fill():
            yield self._draw(by_speaker)
            size = sum(len(v) for v in by_speaker.values())
        leftovers = [s for v in by_speaker.values() for s in v]
        if self.ensure_all_samples_seen:
            for i in range(0, len(leftovers), self.max_batch_size):
                yield self.collate_fn(leftovers[i : i + self.max_batch_size])
        elif leftovers:
            print(f"discarding {len(leftovers)} samples due to no triplet")

    def _draw(self, by_speaker) -> Dict:
        """Pop max_batch_size samples as same-speaker (anchor, positive)
        pairs; a speaker may contribute several pairs when fewer than
        max_batch_size/2 speakers are valid (small corpora), keeping the
        batch shape static."""
        batch = []
        while len(batch) < self.max_batch_size:
            valid = [k for k, v in by_speaker.items() if len(v) >= 2]
            take = min(len(valid), (self.max_batch_size - len(batch)) // 2)
            chosen = self.rng.choice(
                np.asarray(valid), size=take, replace=False
            )
            for k in chosen.tolist():
                lst = by_speaker[k]
                for _ in range(2):
                    batch.append(lst.pop(int(self.rng.integers(len(lst)))))
                if not lst:
                    del by_speaker[k]
        return self.collate_fn(batch)


class PairedBatchProcessor:
    def __init__(
        self,
        batch_size: int,
        max_queue_size: int,
        mode: str,  # 'generate' | 'reproduce'
        sequential_same_speaker_samples: int,
        collate_fn: Callable[[List[PairedSample]], Dict],
        pos_neg_training_batch_ratio: Optional[float] = None,
        pairs: Optional[List[EvaluationPair]] = None,
        yield_limit: Optional[int] = None,
        seed: int = 0,
    ):
        if mode not in ("generate", "reproduce"):
            raise ValueError(f"mode={mode} should be 'generate'|'reproduce'")
        if batch_size > max_queue_size:
            raise ValueError("batch_size must be <= max_queue_size")
        if mode == "generate":
            if pos_neg_training_batch_ratio is None:
                raise ValueError(
                    "generate mode requires pos_neg_training_batch_ratio"
                )
            if batch_size % sequential_same_speaker_samples != 0:
                raise ValueError(
                    "batch_size must be divisible by "
                    "sequential_same_speaker_samples"
                )
        if mode == "reproduce" and pairs is None:
            raise ValueError("reproduce mode requires pairs")
        self.batch_size = batch_size
        self.max_queue_size = max_queue_size
        self.mode = mode
        self.k = sequential_same_speaker_samples
        self.collate_fn = collate_fn
        self.ratio = pos_neg_training_batch_ratio
        self.pairs = pairs
        self.yield_limit = yield_limit
        self.rng = np.random.default_rng(seed)

    def __call__(self, samples: Iterable[SpeakerSample]) -> Iterator[Dict]:
        if self.mode == "generate":
            yield from self._generate(samples)
        else:
            yield from self._reproduce(samples)

    # -- generate -----------------------------------------------------------

    def _generate(self, samples) -> Iterator[Dict]:
        num_pos = round(self.ratio * self.batch_size)
        num_neg = self.batch_size - num_pos
        queue: List[SpeakerSample] = []
        max_queue = max(
            self.batch_size,
            (self.max_queue_size // self.batch_size) * self.batch_size,
        )
        yielded = 0
        run_left = self.k
        for s in samples:
            queue.append(s)
            run_left -= 1
            if run_left > 0:
                continue
            run_left = self.k
            if len(queue) >= max_queue:
                batch = self._paired_batch(queue, num_pos, num_neg)
                if batch is not None:
                    yield self.collate_fn(batch)
                    yielded += self.batch_size
                if self.yield_limit and yielded >= self.yield_limit:
                    return
        while queue:
            batch = self._paired_batch(queue, num_pos, num_neg)
            if batch is None:
                return
            yield self.collate_fn(batch)
            yielded += self.batch_size
            if self.yield_limit and yielded >= self.yield_limit:
                return

    def _paired_batch(self, queue, num_pos, num_neg):
        if len(queue) < self.batch_size:
            queue.clear()
            return None
        speaker_map: Dict[int, List[SpeakerSample]] = defaultdict(list)
        for s in queue:
            speaker_map[s.ground_truth].append(s)

        # pick speakers weighted 2^count, k samples each
        n_speakers = self.batch_size // self.k
        ids = list(speaker_map)
        weights = np.asarray(
            [2.0 ** len(speaker_map[i]) for i in ids], dtype=np.float64
        )
        chosen = []
        while len(chosen) < n_speakers and ids:
            p = weights / weights.sum()
            j = int(self.rng.choice(len(ids), p=p))
            chosen.append(ids.pop(j))
            weights = np.delete(weights, j)

        batch_map: Dict[int, List[SpeakerSample]] = defaultdict(list)
        for spk in chosen:
            lst = speaker_map[spk]
            for _ in range(min(self.k, len(lst))):
                batch_map[spk].append(
                    lst.pop(int(self.rng.integers(len(lst))))
                )

        def rand_choice(lst):
            return lst[int(self.rng.integers(len(lst)))]

        pos, fails = [], 0
        seen = set()
        while len(pos) < num_pos:
            if fails >= 100:
                raise ValueError("too many fails generating positive pairs")
            spk = rand_choice(chosen)
            lst = batch_map[spk]
            if len(lst) < 2:
                fails += 1
                continue
            i, j = self.rng.choice(len(lst), size=2, replace=False)
            s1, s2 = lst[int(i)], lst[int(j)]
            if (s1.key, s2.key) in seen:
                fails += 1
                continue
            seen.add((s1.key, s2.key))
            pos.append(
                PairedSample(s1.key, s1.wav, s2.key, s2.wav, ground_truth=1)
            )
        neg, fails = [], 0
        while len(neg) < num_neg:
            if fails >= 100:
                raise ValueError("too many fails generating negative pairs")
            if len(chosen) < 2:
                raise ValueError("need >= 2 speakers for negative pairs")
            a, b = self.rng.choice(len(chosen), size=2, replace=False)
            l1, l2 = batch_map[chosen[int(a)]], batch_map[chosen[int(b)]]
            if not l1 or not l2:
                fails += 1
                continue
            s1, s2 = rand_choice(l1), rand_choice(l2)
            if (s1.key, s2.key) in seen:
                fails += 1
                continue
            seen.add((s1.key, s2.key))
            neg.append(
                PairedSample(s1.key, s1.wav, s2.key, s2.wav, ground_truth=0)
            )

        for lst in batch_map.values():
            for s in lst:
                queue.remove(s)

        out = pos + neg
        self.rng.shuffle(out)
        return out

    # -- reproduce ----------------------------------------------------------

    def _reproduce(self, samples) -> Iterator[Dict]:
        sample_dict = {s.key: s for s in samples}
        if not sample_dict:
            return
        batch: List[PairedSample] = []
        for p in self.pairs:
            s1 = sample_dict[p.sample1_id]
            s2 = sample_dict[p.sample2_id]
            batch.append(
                PairedSample(
                    s1.key,
                    s1.wav,
                    s2.key,
                    s2.wav,
                    ground_truth=1 if p.same_speaker else 0,
                )
            )
            if len(batch) == self.batch_size:
                yield self.collate_fn(batch)
                batch = []
        if batch:
            yield self.collate_fn(batch)


class DynamicTokenBudgetBatcher:
    def __init__(
        self,
        max_samples_in_batch: int,  # token budget: batch * padded_len
        max_queue_size: int,
        collate_fn: Callable[[List[SpeechSample]], Dict],
        max_batch_size: Optional[int] = None,
        seed: int = 0,
    ):
        self.budget = max_samples_in_batch
        self.max_queue_size = max_queue_size
        self.collate_fn = collate_fn
        self.max_batch_size = max_batch_size
        self.rng = np.random.default_rng(seed)

    def __call__(self, samples: Iterable[SpeechSample]) -> Iterator[Dict]:
        queue: List[SpeechSample] = []
        for s in samples:
            if s.wav.shape[-1] > self.budget:
                print(f"skipping over-budget sample {s.key}")
                continue
            queue.append(s)
            if len(queue) >= self.max_queue_size:
                yield self._draw(queue)
        while queue:
            yield self._draw(queue)

    def _draw(self, queue: List[SpeechSample]) -> Dict:
        queue.sort(key=lambda s: s.wav.shape[-1])
        seed_idx = int(self.rng.integers(len(queue)))
        lo = hi = seed_idx

        def cost(l, h):
            width = queue[h].wav.shape[-1]  # sorted: h has the max length
            return (h - l + 1) * width

        while True:
            grew = False
            if self.max_batch_size and hi - lo + 1 >= self.max_batch_size:
                break
            if hi + 1 < len(queue) and cost(lo, hi + 1) <= self.budget:
                hi += 1
                grew = True
            elif lo > 0 and cost(lo - 1, hi) <= self.budget:
                lo -= 1
                grew = True
            if not grew:
                break
        batch = [queue.pop(i) for i in range(hi, lo - 1, -1)][::-1]
        return self.collate_fn(batch)
