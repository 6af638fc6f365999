"""Archive extraction head of prepare_data (data/extract.py).

Reference behavior: prepare_data runs extract -> split -> shard from the
raw distribution archives (src/data/modules/speaker/voxceleb.py:184-311);
multi-part downloads are concatenated first
(preparation_scripts/download_voxceleb1.sh).
"""

import tarfile
import zipfile

import numpy as np
import pytest

from w2v2_speaker_tpu.data.extract import (
    concatenate_parts,
    effective_audio_root,
    extract_archives,
)
from w2v2_speaker_tpu.data.io import write_wav


def _make_wav_tree(root, speakers=2, utts=2):
    rng = np.random.default_rng(0)
    paths = []
    for s in range(speakers):
        for u in range(utts):
            p = root / f"id{s:05d}" / "ytid" / f"{u:05d}.wav"
            p.parent.mkdir(parents=True, exist_ok=True)
            write_wav(p, rng.normal(0, 0.1, 1600).astype(np.float32))
            paths.append(p)
    return paths


def test_zip_extraction_with_nested_wav_root(tmp_path):
    src = tmp_path / "src" / "wav"
    _make_wav_tree(src)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    arc = corpus / "vox1_dev_wav.zip"
    with zipfile.ZipFile(arc, "w") as z:
        for p in sorted(src.rglob("*.wav")):
            z.write(p, f"wav/{p.relative_to(src)}")

    done = extract_archives(corpus)
    assert [a.name for a in done] == ["vox1_dev_wav.zip"]
    root = effective_audio_root(corpus)
    assert root == corpus / "wav"
    assert len(list(root.rglob("*.wav"))) == 4
    # second call is a no-op (marker file)
    assert extract_archives(corpus) == []


def test_multipart_concatenation(tmp_path):
    src = tmp_path / "src"
    _make_wav_tree(src)
    whole = tmp_path / "whole.zip"
    with zipfile.ZipFile(whole, "w") as z:
        for p in sorted(src.rglob("*.wav")):
            z.write(p, str(p.relative_to(src)))
    data = whole.read_bytes()
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    half = len(data) // 2
    (corpus / "vox1_dev_wav_partaa").write_bytes(data[:half])
    (corpus / "vox1_dev_wav_partab").write_bytes(data[half:])

    made = concatenate_parts(corpus)
    assert [m.name for m in made] == ["vox1_dev_wav.zip"]
    assert (corpus / "vox1_dev_wav.zip").read_bytes() == data
    extract_archives(corpus)
    assert len(list(effective_audio_root(corpus).rglob("*.wav"))) == 4


def test_tar_extraction(tmp_path):
    src = tmp_path / "src"
    _make_wav_tree(src, speakers=1)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    with tarfile.open(corpus / "data.tar.gz", "w:gz") as t:
        for p in sorted(src.rglob("*.wav")):
            t.add(p, str(p.relative_to(src)))
    extract_archives(corpus)
    assert len(list(corpus.rglob("id*/**/*.wav"))) == 2
    assert effective_audio_root(corpus) == corpus


def test_prepare_data_from_archives(tmp_path):
    """End to end: VoxCelebDataModule.prepare_data on a directory holding
    only the distribution zip."""
    from w2v2_speaker_tpu.data.datamodule import (
        VoxCelebConfig,
        VoxCelebDataModule,
    )

    src = tmp_path / "src"
    _make_wav_tree(src, speakers=4, utts=3)
    corpus = tmp_path / "corpus"
    corpus.mkdir()
    with zipfile.ZipFile(corpus / "vox.zip", "w") as z:
        for p in sorted(src.rglob("*.wav")):
            z.write(p, f"wav/{p.relative_to(src)}")

    dm = VoxCelebDataModule(
        VoxCelebConfig(
            data_dir=corpus,
            shards_dir=tmp_path / "shards",
            test_trial_path=None,
            train_val_split_mode="different",
            train_val_ratio=0.75,
            eer_validation_pairs=2,
            samples_per_shard=4,
            sequential_same_speaker_samples=1,
            min_unique_speakers_per_shard=1,
            use_gzip_compression=False,
            shuffle_shards=False,
            queue_size=8,
            batch_size=2,
            chunk_length_sec=0.05,
            chunk_strategy="start",
            normalize_input=False,
            augmenter=None,
            seed=0,
        )
    )
    dm.prepare_data()
    assert (tmp_path / "shards" / "prepared.json").exists()
    assert dm.num_speakers == 3
