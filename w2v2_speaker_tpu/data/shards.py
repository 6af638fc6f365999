"""Tar-shard dataset storage (webdataset-compatible layout, no webdataset).

Re-implements the reference's shard contract
(`/root/reference/src/data/modules/speaker/voxceleb.py:1690-1965`):

- each shard is a tar (optionally gzip) holding `<key>.npy` float32 waveform
  + `<key>.json` metadata per sample, keys `spk/yt/utt`
- shard assembly honors `samples_per_shard`,
  `sequential_same_speaker_samples` (runs of k same-speaker samples so the
  paired batcher can form positives), `min_unique_speakers_per_shard`, and
  discards the trailing partial shard (voxceleb.py:1772-1908)
- a sidecar `meta.json` records sample/speaker counts and the global
  `speaker_id_to_idx` map (voxceleb.py:1772-1784)

Reading: `ShardReader` streams samples from a shard list with deterministic
per-epoch shard shuffling and host/worker splitting (the pjit-era version of
webdataset's nodesplitter — each host reads a disjoint shard subset).
"""

from __future__ import annotations

import gzip
import io
import json
import pathlib
import tarfile
from dataclasses import dataclass
from typing import Dict, Iterable, Iterator, List, Optional, Sequence

import numpy as np

from .samples import SpeakerSample

__all__ = ["ShardWriter", "ShardReader", "write_speaker_shards", "read_meta"]


class ShardWriter:
    """Write one tar(.gz) shard of (key, wav, meta) samples."""

    def __init__(self, path: pathlib.Path | str, use_gzip: bool = False):
        self.path = pathlib.Path(path)
        self.use_gzip = use_gzip
        mode = "w:gz" if use_gzip else "w"
        self._tar = tarfile.open(self.path, mode)
        self.count = 0

    def write(self, key: str, wav: np.ndarray, meta: Dict) -> None:
        safe = key.replace("/", "__")
        wav_bytes = io.BytesIO()
        np.save(wav_bytes, np.asarray(wav, np.float32))
        self._add(f"{safe}.npy", wav_bytes.getvalue())
        self._add(
            f"{safe}.json", json.dumps({"key": key, **meta}).encode("utf-8")
        )
        self.count += 1

    def _add(self, name: str, payload: bytes) -> None:
        info = tarfile.TarInfo(name=name)
        info.size = len(payload)
        self._tar.addfile(info, io.BytesIO(payload))

    def close(self) -> None:
        self._tar.close()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


def write_speaker_shards(
    samples: Iterable[SpeakerSample],
    out_dir: pathlib.Path | str,
    samples_per_shard: int = 100,
    sequential_same_speaker_samples: int = 1,
    min_unique_speakers_per_shard: int = 1,
    use_gzip: bool = False,
    discard_partial_shards: bool = True,
    name: str = "shard",
    seed: int = 0,
    sample_rate: int = 16000,
) -> Dict:
    """Assemble shards from samples; returns the dataset meta dict.

    Assembly mirrors voxceleb.py:1690-1908: samples are grouped per speaker,
    emitted in runs of `sequential_same_speaker_samples`, shards must contain
    at least `min_unique_speakers_per_shard` distinct speakers, and a
    trailing partial shard is dropped when requested.
    """
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(seed)
    k = sequential_same_speaker_samples

    per_speaker: Dict[str, List[SpeakerSample]] = {}
    for s in samples:
        spk = s.key.split("/")[0]
        per_speaker.setdefault(spk, []).append(s)

    speaker_ids = sorted(per_speaker)
    speaker_id_to_idx = {spk: i for i, spk in enumerate(speaker_ids)}

    # build runs of k same-speaker samples
    runs: List[List[SpeakerSample]] = []
    for spk in speaker_ids:
        lst = list(per_speaker[spk])
        rng.shuffle(lst)
        usable = (len(lst) // k) * k
        for i in range(0, usable, k):
            runs.append(lst[i : i + k])
    order = rng.permutation(len(runs))
    runs = [runs[i] for i in order]

    if samples_per_shard % k != 0:
        raise ValueError(
            f"samples_per_shard={samples_per_shard} must be divisible by "
            f"sequential_same_speaker_samples={k}"
        )
    runs_per_shard = samples_per_shard // k

    shards_written = 0
    samples_written = 0
    i = 0
    while i + runs_per_shard <= len(runs):
        shard_runs = runs[i : i + runs_per_shard]
        i += runs_per_shard
        uniq = {r[0].key.split("/")[0] for r in shard_runs}
        if len(uniq) < min_unique_speakers_per_shard:
            continue  # skip degenerate shard
        suffix = ".tar.gz" if use_gzip else ".tar"
        path = out_dir / f"{name}-{shards_written:06d}{suffix}"
        with ShardWriter(path, use_gzip=use_gzip) as w:
            for run in shard_runs:
                for s in run:
                    spk, yt, utt = (s.key.split("/") + ["", ""])[:3]
                    w.write(
                        s.key,
                        s.wav,
                        {
                            "speaker_id": spk,
                            "youtube_id": yt,
                            "utterance_id": utt,
                            "speaker_id_idx": speaker_id_to_idx[spk],
                            "num_frames": int(np.asarray(s.wav).shape[-1]),
                            "sampling_rate": sample_rate,
                        },
                    )
                    samples_written += 1
        shards_written += 1

    leftover = len(runs) - i
    if leftover and not discard_partial_shards:
        suffix = ".tar.gz" if use_gzip else ".tar"
        path = out_dir / f"{name}-{shards_written:06d}{suffix}"
        with ShardWriter(path, use_gzip=use_gzip) as w:
            for run in runs[i:]:
                for s in run:
                    spk = s.key.split("/")[0]
                    parts = (s.key.split("/") + ["", ""])[:3]
                    w.write(
                        s.key,
                        s.wav,
                        {
                            "speaker_id": parts[0],
                            "youtube_id": parts[1],
                            "utterance_id": parts[2],
                            "speaker_id_idx": speaker_id_to_idx[spk],
                            "num_frames": int(np.asarray(s.wav).shape[-1]),
                            "sampling_rate": sample_rate,
                        },
                    )
                    samples_written += 1
        shards_written += 1

    meta = {
        "num_shards": shards_written,
        "num_samples": samples_written,
        "num_speakers": len(speaker_ids),
        "speaker_id_to_idx": speaker_id_to_idx,
        "samples_per_shard": samples_per_shard,
        "sequential_same_speaker_samples": k,
    }
    with open(out_dir / "meta.json", "w") as f:
        json.dump(meta, f, indent=2)
    return meta


def read_meta(shard_dir: pathlib.Path | str) -> Dict:
    with open(pathlib.Path(shard_dir) / "meta.json") as f:
        return json.load(f)


class ShardReader:
    """Stream SpeakerSamples from tar shards.

    `host_id`/`num_hosts` select a disjoint shard subset per host (data
    parallel input); `shuffle_shards` reshuffles shard order per epoch with
    a deterministic seed.
    """

    def __init__(
        self,
        shard_paths: Sequence[pathlib.Path | str],
        shuffle_shards: bool = False,
        seed: int = 0,
        host_id: int = 0,
        num_hosts: int = 1,
    ):
        paths = sorted(str(p) for p in shard_paths)
        if not paths:
            raise ValueError("no shard paths given")
        self.all_paths = paths
        self.paths = paths[host_id::num_hosts]
        self.shuffle_shards = shuffle_shards
        self.seed = seed
        self.epoch = 0

    @staticmethod
    def discover(shard_dir: pathlib.Path | str, pattern: str = "*.tar*"):
        d = pathlib.Path(shard_dir)
        return sorted(
            p for p in d.glob(pattern) if not p.name.endswith(".json")
        )

    def __iter__(self) -> Iterator[SpeakerSample]:
        paths = list(self.paths)
        if self.shuffle_shards:
            rng = np.random.default_rng(self.seed + self.epoch)
            rng.shuffle(paths)
        self.epoch += 1
        for path in paths:
            yield from self._read_shard(path)

    @staticmethod
    def _read_shard(path: str) -> Iterator[SpeakerSample]:
        mode = "r:gz" if path.endswith(".gz") else "r"
        with tarfile.open(path, mode) as tar:
            pending_wav: Dict[str, np.ndarray] = {}
            pending_meta: Dict[str, Dict] = {}
            for member in tar:
                if not member.isfile():
                    continue
                stem, ext = member.name.rsplit(".", 1)
                payload = tar.extractfile(member).read()
                if ext == "npy":
                    pending_wav[stem] = np.load(io.BytesIO(payload))
                elif ext == "json":
                    pending_meta[stem] = json.loads(payload)
                if stem in pending_wav and stem in pending_meta:
                    meta = pending_meta.pop(stem)
                    wav = pending_wav.pop(stem)
                    yield SpeakerSample(
                        key=meta["key"],
                        wav=wav,
                        ground_truth=meta.get("speaker_id_idx", -1),
                        meta=meta,
                    )

    def iter_keys(self) -> Iterator[str]:
        """Stream sample keys only: reads the small `.json` members and
        never materializes waveform payloads — key/speaker inventories
        (trial-pair generation, speaker maps) must not decode a whole
        split's audio."""
        for path in self.paths:
            mode = "r:gz" if path.endswith(".gz") else "r"
            with tarfile.open(path, mode) as tar:
                for member in tar:
                    if member.isfile() and member.name.endswith(".json"):
                        meta = json.loads(tar.extractfile(member).read())
                        yield meta["key"]
