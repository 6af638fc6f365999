"""VoxCeleb data module end-to-end on a synthetic on-disk dataset."""

import pathlib

import numpy as np
import pytest

from w2v2_speaker_tpu.data.augment import Augmenter, TimeDropoutAugment
from w2v2_speaker_tpu.data.datamodule import (
    Prefetcher,
    VoxCelebConfig,
    VoxCelebDataModule,
)
from w2v2_speaker_tpu.data.io import write_wav

SR = 16000


def _build_dataset(root: pathlib.Path, n_spk=6, n_yt=3, n_utt=3, test_spk=2):
    """spk/yt/utt.wav tree + trial file over the last `test_spk` speakers."""
    rng = np.random.default_rng(0)
    root.mkdir(parents=True, exist_ok=True)
    keys = []
    for s in range(n_spk):
        for y in range(n_yt):
            for u in range(n_utt):
                k = f"id{s:05d}/yt{y}/{u:05d}"
                p = root / f"{k}.wav"
                p.parent.mkdir(parents=True, exist_ok=True)
                dur = int(SR * rng.uniform(1.2, 2.0))
                write_wav(p, rng.normal(0, 0.1, size=dur).astype(np.float32), SR)
                keys.append(k)
    # trial file over test speakers
    test_ids = [f"id{s:05d}" for s in range(n_spk - test_spk, n_spk)]
    lines = []
    for i, spk in enumerate(test_ids):
        lines.append(f"1 {spk}/yt0/00000.wav {spk}/yt1/00001.wav")
        other = test_ids[(i + 1) % len(test_ids)]
        lines.append(f"0 {spk}/yt0/00000.wav {other}/yt2/00002.wav")
    trial = root.parent / "trials.txt"
    trial.write_text("\n".join(lines) + "\n")
    return keys, trial


@pytest.fixture(scope="module")
def prepared(tmp_path_factory):
    root = tmp_path_factory.mktemp("voxceleb")
    data_dir = root / "wav"
    keys, trial = _build_dataset(data_dir)
    cfg = VoxCelebConfig(
        data_dir=data_dir,
        shards_dir=root / "shards",
        test_trial_path=trial,
        train_val_split_mode="equal",
        train_val_ratio=0.7,
        samples_per_shard=8,
        batch_size=4,
        chunk_length_sec=1.0,
        eer_validation_pairs=20,
        seed=7,
    )
    dm = VoxCelebDataModule(cfg)
    dm.prepare_data()
    return dm, keys


def test_prepare_writes_all_splits(prepared):
    dm, keys = prepared
    out = dm.cfg.shards_dir
    assert (out / "train" / "meta.json").exists()
    assert (out / "val" / "meta.json").exists()
    assert (out / "test" / "meta.json").exists()
    assert (out / "val_pairs.txt").exists()
    print(dm.summary())
    # test speakers (id00004, id00005) never in train
    from w2v2_speaker_tpu.data.shards import ShardReader

    train_spk = {
        s.key.split("/")[0]
        for s in ShardReader(ShardReader.discover(out / "train"))
    }
    assert "id00004" not in train_spk and "id00005" not in train_spk


def test_prepare_is_idempotent(prepared):
    dm, _ = prepared
    dm.prepare_data()  # second call must be a no-op
    assert dm.num_speakers == 4


def test_equal_split_separates_sessions(prepared):
    """'equal' split: train and val never share a (speaker, youtube) pair."""
    from w2v2_speaker_tpu.data.shards import ShardReader

    dm, _ = prepared
    out = dm.cfg.shards_dir
    train_sessions = {
        tuple(s.key.split("/")[:2])
        for s in ShardReader(ShardReader.discover(out / "train"))
    }
    val_sessions = {
        tuple(s.key.split("/")[:2])
        for s in ShardReader(ShardReader.discover(out / "val"))
    }
    assert not (train_sessions & val_sessions)
    # and val speakers are train speakers (same-speaker protocol)
    assert {s for s, _ in val_sessions} <= {s for s, _ in train_sessions}


def test_train_batches_fixed_shape(prepared):
    dm, _ = prepared
    n = 0
    for batch in dm.train_batches():
        assert batch["features"].shape[1] == SR  # 1 s chunks
        assert batch["features"].dtype == np.float32
        assert (batch["labels"] >= 0).all()
        # crops are exactly chunk-sized -> the all-valid mask is omitted
        # entirely (collate_speaker_batch strips it)
        assert "mask" not in batch
        n += batch["features"].shape[0]
        if n > 20:
            break
    assert n > 20


def test_val_pairs_reference_existing_samples(prepared):
    dm, _ = prepared
    pairs = dm.val_evaluation_pairs()
    assert pairs
    from w2v2_speaker_tpu.data.shards import ShardReader

    val_keys = {
        s.key
        for s in ShardReader(
            ShardReader.discover(dm.cfg.shards_dir / "val")
        )
    }
    for p in pairs:
        assert p.sample1_id in val_keys and p.sample2_id in val_keys


def test_test_samples_full_length(prepared):
    dm, _ = prepared
    samples = list(dm.test_samples())
    assert samples
    lengths = {s.wav.shape[0] for s in samples}
    assert len(lengths) > 1  # full utterances, variable length
    trial_pairs = dm.test_evaluation_pairs()
    keys = {s.key for s in samples}
    for p in trial_pairs:
        assert p.sample1_id in keys and p.sample2_id in keys


def test_augmented_training_pipeline(tmp_path):
    data_dir = tmp_path / "wav"
    _build_dataset(data_dir, n_spk=3, test_spk=0)
    cfg = VoxCelebConfig(
        data_dir=data_dir,
        shards_dir=tmp_path / "shards",
        test_trial_path=None,
        samples_per_shard=6,
        batch_size=4,
        chunk_length_sec=1.0,
        augmenter=Augmenter(
            [TimeDropoutAugment(min_drop_count=1, max_drop_count=1, seed=1)],
            stack_augmentations=True,
            yield_intermediate_augmentations=False,
        ),
        seed=3,
    )
    dm = VoxCelebDataModule(cfg)
    dm.prepare_data()
    batch = next(iter(dm.train_batches()))
    assert batch["features"].shape == (4, SR)


def test_prefetcher_propagates_errors():
    def bad_gen():
        yield 1
        raise RuntimeError("boom")

    p = Prefetcher(lambda: bad_gen())
    it = iter(p)
    assert next(it) == 1
    with pytest.raises(RuntimeError):
        list(it)
