"""LibriSpeech data module: shard writing + token-budget loaders for CTC.

Re-implements the reference's LibriSpeech pipeline
(`/root/reference/src/data/modules/speech/librispeech.py:77-804`):

- shard writer: discover `<spk>/<chapter>/<spk>-<chapter>-<utt>.wav` files,
  look up transcripts in the sibling `<spk>-<chapter>.trans.txt`
  (librispeech.py:662-750), derive the character vocabulary
  (librispeech.py:238-260) and sort by length before sharding so shards are
  length-homogeneous (librispeech.py:752-755)
- data module: separate clean/other validation and test loaders
  (librispeech.py:379-512), tokenizer/vocab consistency check
  (librispeech.py:225-236), token-budget dynamic batching for training
  (`DynamicTokenBudgetBatcher`).

Audio may be 16 kHz WAV or raw LibriSpeech FLAC: .flac decodes through the
native decoder (native/flac.cpp via utils/flac.py), replacing the
reference's torchaudio/sox read path — prepare_data now runs directly on
the extracted corpus, no offline conversion step needed.
"""

from __future__ import annotations

import io
import json
import pathlib
import tarfile
from dataclasses import dataclass, field
from typing import Any, Dict, Iterable, Iterator, List, Optional

import numpy as np

from .batching import DynamicTokenBudgetBatcher
from .datamodule import Prefetcher
from .io import load_raw_audio
from .samples import SpeechSample, collate_speech_batch
from .shards import ShardReader, ShardWriter
from .tokenizer import CharTokenizer

__all__ = [
    "write_librispeech_shards",
    "LibriSpeechConfig",
    "LibriSpeechDataModule",
]


def _discover_transcribed_wavs(root: pathlib.Path) -> List[Dict]:
    entries = []
    for trans in sorted(root.rglob("*.trans.txt")):
        lookup: Dict[str, str] = {}
        for line in trans.read_text().splitlines():
            if not line.strip():
                continue
            utt_id, text = line.split(" ", 1)
            lookup[utt_id] = text.strip()
        audio = sorted(trans.parent.glob("*.wav")) + sorted(
            trans.parent.glob("*.flac")
        )
        for wav in audio:
            utt_id = wav.stem
            if utt_id in lookup:
                entries.append(
                    {
                        "path": wav,
                        "key": utt_id,
                        "transcription": lookup[utt_id],
                    }
                )
    return entries


def write_librispeech_shards(
    root: pathlib.Path | str,
    out_dir: pathlib.Path | str,
    samples_per_shard: int = 64,
    use_gzip: bool = False,
) -> Dict:
    """Write speech shards sorted by audio length; returns meta with the
    derived character set."""
    root = pathlib.Path(root)
    out_dir = pathlib.Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)

    entries = _discover_transcribed_wavs(root)
    if not entries:
        raise ValueError(f"no transcribed wavs under {root}")

    loaded = []
    charset = set()
    for e in entries:
        wav = load_raw_audio(e["path"])
        charset.update(e["transcription"].upper().replace(" ", "|"))
        loaded.append((e["key"], wav, e["transcription"]))
    loaded.sort(key=lambda x: x[1].shape[-1])  # length-sorted sharding

    shards = 0
    for i in range(0, len(loaded), samples_per_shard):
        chunk = loaded[i : i + samples_per_shard]
        suffix = ".tar.gz" if use_gzip else ".tar"
        with ShardWriter(
            out_dir / f"speech-{shards:06d}{suffix}", use_gzip=use_gzip
        ) as w:
            for key, wav, text in chunk:
                w.write(
                    key,
                    wav,
                    {
                        "transcription": text,
                        "num_frames": int(wav.shape[-1]),
                        "sampling_rate": 16000,
                    },
                )
        shards += 1

    meta = {
        "num_shards": shards,
        "num_samples": len(loaded),
        "characters": sorted(charset - {"|"}),
        # `<spk>-<chapter>-<utt>` keys carry the speaker; recorded so the
        # multitask recipe gets its speaker-classification label space
        # without re-reading shards
        "speakers": sorted({k.split("-")[0] for k, _, _ in loaded}),
    }
    (out_dir / "meta.json").write_text(json.dumps(meta, indent=2))
    return meta


@dataclass
class LibriSpeechConfig:
    # split name -> directory of raw (wav + trans.txt) data
    split_dirs: Dict[str, pathlib.Path] = field(default_factory=dict)
    shards_dir: pathlib.Path = pathlib.Path("shards")
    samples_per_shard: int = 64
    use_gzip_compression: bool = False
    train_max_num_samples: int = 3_200_000  # token budget (samples x batch)
    max_queue_size: int = 128
    max_batch_size: Optional[int] = None
    normalize_input: bool = False
    pad_to_multiple: int = 1600  # 0.1 s buckets for static shapes
    # 'corpus_char' derives the vocab from the training transcripts
    # (reference librispeech.py:238-260); 'wav2vec2_base_960h' uses the
    # fixed HF letter vocab in checkpoint order (reference tokenizer group)
    tokenizer_name: str = "corpus_char"
    # attach per-utterance speaker indices (derived from the LibriSpeech
    # key `<spk>-<chapter>-<utt>`) to every batch — the joint
    # speaker+speech multitask recipe (reference declares the module but
    # never built its data side, mt_speech_speaker_module.py / main.py:
    # 304-307)
    with_speaker_labels: bool = False
    seed: int = 0
    host_id: int = 0
    num_hosts: int = 1
    # runtime.debug.PipelineDebugCapture (or None): per-preprocessor debug
    # artifacts for the first few pipeline samples — decoded waveform,
    # transcription, token ids. Same hook the VoxCeleb pipeline exposes
    # (datamodule.py process_one); the reference's input monitor is
    # module-agnostic (input_monitor_callback.py:36-156).
    debug_capture: Optional[Any] = None


class LibriSpeechDataModule:
    TRAIN = "train"

    def __init__(self, cfg: LibriSpeechConfig):
        self.cfg = cfg
        self.cfg.shards_dir = pathlib.Path(cfg.shards_dir)
        self._tokenizer: Optional[CharTokenizer] = None

    # ------------------------------------------------------------ prepare

    def prepare_data(self) -> None:
        cfg = self.cfg
        marker = cfg.shards_dir / "prepared.json"
        if marker.exists():
            return
        cfg.shards_dir.mkdir(parents=True, exist_ok=True)
        all_chars: set = set()
        info = {}
        for split, raw_dir in cfg.split_dirs.items():
            meta = write_librispeech_shards(
                raw_dir,
                cfg.shards_dir / split,
                samples_per_shard=cfg.samples_per_shard,
                use_gzip=cfg.use_gzip_compression,
            )
            info[split] = meta["num_samples"]
            all_chars.update(meta["characters"])
        # derive + persist the vocabulary from ALL splits (the reference
        # cross-checks tokenizer vs data vocab, librispeech.py:225-236)
        tok = CharTokenizer.build(["".join(sorted(all_chars)) + " "])
        tok.save(cfg.shards_dir / "vocab.json")
        marker.write_text(json.dumps(info, indent=2))

    @property
    def tokenizer(self) -> CharTokenizer:
        if self._tokenizer is None:
            if self.cfg.tokenizer_name == "wav2vec2_base_960h":
                # fixed HF letter vocabulary in checkpoint order (reference
                # config/tokenizer/default.yaml downloads exactly this);
                # corpus-vocab consistency is still checked on demand
                self._tokenizer = CharTokenizer.wav2vec2_base_960h()
            else:
                self._tokenizer = CharTokenizer.load(
                    self.cfg.shards_dir / "vocab.json"
                )
        return self._tokenizer

    # ------------------------------------------------------------ speakers

    @property
    def speaker_id_to_idx(self) -> Dict[str, int]:
        """Train-split speaker -> class index (sorted, deterministic).

        Read from the split's meta.json when present; older shard dirs
        (written before the field existed) fall back to a one-time scan of
        the shard keys, persisted back as speakers.json."""
        if getattr(self, "_speaker_map", None) is not None:
            return self._speaker_map
        d = self.cfg.shards_dir / self.TRAIN
        meta_file = d / "meta.json"
        speakers = None
        if meta_file.exists():
            speakers = json.loads(meta_file.read_text()).get("speakers")
        if speakers is None:
            cache = d / "speakers.json"
            if cache.exists():
                speakers = json.loads(cache.read_text())
            else:
                speakers = sorted(
                    {
                        key.split("-")[0]
                        for key in ShardReader(
                            ShardReader.discover(d)
                        ).iter_keys()
                    }
                )
                cache.write_text(json.dumps(speakers))
        self._speaker_map = {s: i for i, s in enumerate(speakers)}
        return self._speaker_map

    @property
    def num_speakers(self) -> int:
        return len(self.speaker_id_to_idx)

    def val_evaluation_pairs(
        self, split: str = "val_clean", num_pairs: int = 200
    ):
        """Balanced same/different-speaker trial pairs over an eval split —
        the speaker-verification half of the multitask recipe (the
        reference's multitask module takes validation_pairs but its data
        side was never built, mt_speech_speaker_module.py:45-56)."""
        from .trials import generate_validation_pairs

        per_speaker: Dict[str, List[str]] = {}
        reader = ShardReader(
            ShardReader.discover(self.cfg.shards_dir / split)
        )
        # keys only — never decode the split's audio to build pair lists
        for key in reader.iter_keys():
            per_speaker.setdefault(key.split("-")[0], []).append(key)
        return generate_validation_pairs(
            per_speaker, num_pairs, seed=self.cfg.seed
        )

    def vocabulary_consistency_check(self) -> None:
        """Every transcript character must be encodable without <unk>."""
        tok = self.tokenizer
        for split in self.cfg.split_dirs:
            for s in self._samples(split, capture=False):
                ids = tok.encode(s.transcription)
                if (ids == tok.vocab["<unk>"]).any():
                    raise ValueError(
                        f"transcript of {s.key} contains characters outside "
                        f"the tokenizer vocabulary"
                    )

    # ------------------------------------------------------------ loaders

    def _samples(
        self, split: str, epoch: int = 0, capture: bool = True
    ) -> Iterator[SpeechSample]:
        cfg = self.cfg
        d = cfg.shards_dir / split
        reader = ShardReader(
            ShardReader.discover(d),
            shuffle_shards=split == self.TRAIN,
            seed=cfg.seed + epoch * 9973,
            host_id=cfg.host_id if split == self.TRAIN else 0,
            num_hosts=cfg.num_hosts if split == self.TRAIN else 1,
        )
        tok = self.tokenizer
        spk_map = (
            self.speaker_id_to_idx if cfg.with_speaker_labels else None
        )
        # capture first-epoch train-pipeline stages only (the reference
        # monitor dumps the first *training* batch; eval re-reads or later
        # epochs would append duplicate stage artifacts for the same keys)
        cap = (
            cfg.debug_capture
            if capture and split == self.TRAIN and epoch == 0
            else None
        )
        for s in reader:
            text = s.meta["transcription"]
            tokens = tok.encode(text)
            if cap is not None and cap.wants(s.key):
                # per-preprocessor artifacts (reference input monitor's
                # side_info chain, input_monitor_callback.py:93-156):
                # decoded audio, transcript, token ids
                cap.record(s.key, "original", s.wav)
                cap.record_text(s.key, "transcription", text)
                cap.record(s.key, "tokens", tokens, render_wav=False)
            yield SpeechSample(
                key=s.key,
                wav=s.wav.astype(np.float32),
                transcription=text,
                tokens=tokens,
                speaker_idx=(
                    spk_map.get(s.key.split("-")[0], -1)
                    if spk_map is not None
                    else None
                ),
            )

    def train_batches(
        self, prefetch_depth: int = 4, epoch: int = 0
    ) -> Iterable[Dict]:
        cfg = self.cfg

        def collate(samples):
            return collate_speech_batch(
                samples, pad_to_multiple=cfg.pad_to_multiple
            )

        proc = DynamicTokenBudgetBatcher(
            max_samples_in_batch=cfg.train_max_num_samples,
            max_queue_size=cfg.max_queue_size,
            collate_fn=collate,
            max_batch_size=cfg.max_batch_size,
            seed=cfg.seed + epoch * 9973,
        )
        return Prefetcher(
            lambda: proc(self._samples(self.TRAIN, epoch=epoch)),
            depth=prefetch_depth,
        )

    def eval_batches(self, split: str, batch_size: int = 8) -> Iterable[Dict]:
        """Sequential fixed-count batches for clean/other val and test
        splits (length-sorted shards keep padding small)."""
        cfg = self.cfg

        def gen():
            batch: List[SpeechSample] = []
            for s in self._samples(split):
                batch.append(s)
                if len(batch) == batch_size:
                    yield collate_speech_batch(
                        batch, pad_to_multiple=cfg.pad_to_multiple
                    )
                    batch = []
            if batch:
                yield collate_speech_batch(
                    batch, pad_to_multiple=cfg.pad_to_multiple
                )

        return Prefetcher(gen)
