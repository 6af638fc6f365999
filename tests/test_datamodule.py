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


def test_split_consistency_is_keys_only(prepared, monkeypatch):
    """_assert_split_consistency streams keys via iter_keys and must never
    touch the wav decode path (VERDICT r3 #7: metadata-only, like the
    reference's shard-meta check voxceleb.py:313-341)."""
    from w2v2_speaker_tpu.data.shards import ShardReader

    dm, _ = prepared

    def boom(path):
        raise AssertionError(f"split check decoded audio from {path}")

    monkeypatch.setattr(ShardReader, "_read_shard", staticmethod(boom))
    # passes on the prepared (consistent) splits without any sample decode
    VoxCelebDataModule._assert_split_consistency(dm.cfg.shards_dir)


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


def test_prefetcher_abandonment_stops_worker_and_closes_source():
    """Breaking out of a Prefetcher (validation loops with limit_val,
    `next(iter(train_batches()))`) must not leak a blocked worker thread or
    keep the source generator's shard readers open."""
    import threading
    import time as _time

    closed = threading.Event()

    def endless():
        try:
            i = 0
            while True:
                yield i
                i += 1
        finally:
            closed.set()

    before = threading.active_count()
    it = iter(Prefetcher(lambda: endless(), depth=2))
    assert next(it) == 0
    it.close()  # what an abandoned `for ... break` triggers via GC

    deadline = _time.time() + 5.0
    while threading.active_count() > before and _time.time() < deadline:
        _time.sleep(0.02)
    assert threading.active_count() <= before, "worker thread leaked"
    assert closed.is_set(), "source generator was not closed"


def test_prefetcher_full_queue_completion_not_stuck():
    """Sentinel must still arrive when the producer finishes while the
    queue is full and the consumer drains slowly."""
    p = Prefetcher(lambda: iter(range(10)), depth=1)
    assert list(p) == list(range(10))


# ---------------------------------------------------------------------------
# Multi-corpus composition (train vox2-dev / test all-vox1 — the reference's
# headline protocol, voxceleb.py:1442-1520 + voxceleb2_test_hard.yaml:7-24)
# ---------------------------------------------------------------------------


def _build_corpus_tree(root, spk_ids, n_yt=2, n_utt=2, seed=0):
    rng = np.random.default_rng(seed)
    keys = []
    for spk in spk_ids:
        for y in range(n_yt):
            for u in range(n_utt):
                k = f"{spk}/yt{y}/{u:05d}"
                p = root / f"{k}.wav"
                p.parent.mkdir(parents=True, exist_ok=True)
                dur = int(SR * rng.uniform(1.0, 1.4))
                write_wav(
                    p, rng.normal(0, 0.1, size=dur).astype(np.float32), SR
                )
                keys.append(k)
    return keys


def test_multi_corpus_train_vox2_test_all_vox1(tmp_path):
    """Compose two synthetic corpora: vox1-dev + vox1-test (all test via
    all_voxceleb1_is_test_set) and vox2-dev (train). The trial file covers
    most-but-not-all vox1 speakers: those absent from it must be dropped
    entirely (reference voxceleb.py:1513-1517), vox2 speakers must form the
    train/val splits, and the shard-meta disjointness asserts must pass."""
    from w2v2_speaker_tpu.data.shards import ShardReader

    vox1_dev = tmp_path / "vox1/wav"
    vox1_test = tmp_path / "vox1_test/wav"
    vox2_dev = tmp_path / "vox2/wav"
    v1_dev_ids = [f"id1{s:04d}" for s in range(3)]
    v1_test_ids = [f"id1{s:04d}" for s in range(3, 5)]
    v2_ids = [f"id0{s:04d}" for s in range(4)]
    _build_corpus_tree(vox1_dev, v1_dev_ids, seed=1)
    _build_corpus_tree(vox1_test, v1_test_ids, seed=2)
    _build_corpus_tree(vox2_dev, v2_ids, n_yt=3, n_utt=3, seed=3)

    # hard-style trial list over all vox1 speakers EXCEPT id10002
    trial_ids = [i for i in v1_dev_ids + v1_test_ids if i != "id10002"]
    lines = []
    for i, spk in enumerate(trial_ids):
        lines.append(f"1 {spk}/yt0/00000.wav {spk}/yt1/00001.wav")
        other = trial_ids[(i + 1) % len(trial_ids)]
        lines.append(f"0 {spk}/yt0/00000.wav {other}/yt1/00000.wav")
    trial = tmp_path / "list_test_hard2.txt"
    trial.write_text("\n".join(lines) + "\n")

    dm = VoxCelebDataModule(
        VoxCelebConfig(
            data_dir=None,
            shards_dir=tmp_path / "shards",
            test_trial_path=trial,
            voxceleb1_dev_dir=vox1_dev,
            voxceleb1_test_dir=vox1_test,
            voxceleb2_dev_dir=vox2_dev,
            use_voxceleb1_dev=True,
            use_voxceleb1_test=True,
            use_voxceleb2_dev=True,
            all_voxceleb1_is_test_set=True,
            train_val_split_mode="equal",
            train_val_ratio=0.7,
            samples_per_shard=4,
            batch_size=4,
            chunk_length_sec=1.0,
            eer_validation_pairs=8,
            seed=7,
        )
    )
    dm.prepare_data()  # includes _assert_split_consistency
    out = dm.cfg.shards_dir

    def split_speakers(split):
        return {
            s.key.split("/")[0]
            for s in ShardReader(ShardReader.discover(out / split))
        }

    train_spk = split_speakers("train")
    val_spk = split_speakers("val")
    test_spk = split_speakers("test")
    # train/val: only vox2 speakers
    assert train_spk <= set(v2_ids) and val_spk <= set(v2_ids)
    assert dm.num_speakers == len(v2_ids)
    # test: exactly the trial-file vox1 speakers, from BOTH vox1 corpora
    assert test_spk == set(trial_ids)
    # the vox1-dev speaker absent from the trial file is dropped entirely
    assert "id10002" not in train_spk | val_spk | test_spk
    # every trial pair is scorable against the test shards
    test_keys = {
        s.key for s in ShardReader(ShardReader.discover(out / "test"))
    }
    for p in dm.test_evaluation_pairs():
        assert p.sample1_id in test_keys and p.sample2_id in test_keys


def test_multi_corpus_duplicate_key_rejected(tmp_path):
    a, b = tmp_path / "a/wav", tmp_path / "b/wav"
    _build_corpus_tree(a, ["id00001"])
    _build_corpus_tree(b, ["id00001"])
    dm = VoxCelebDataModule(
        VoxCelebConfig(
            data_dir=None,
            shards_dir=tmp_path / "shards",
            voxceleb1_dev_dir=a,
            voxceleb2_dev_dir=b,
        )
    )
    with pytest.raises(ValueError, match="multiple corpora"):
        dm.prepare_data()


def test_vox1_dev_trains_when_not_all_test(tmp_path):
    """Without all_voxceleb1_is_test_set, vox1-dev non-trial speakers are
    training data (use_voxceleb1_dev composition, voxceleb.py:1495)."""
    from w2v2_speaker_tpu.data.shards import ShardReader

    vox1_dev = tmp_path / "vox1/wav"
    vox2_dev = tmp_path / "vox2/wav"
    _build_corpus_tree(vox1_dev, ["id10000", "id10001"], n_yt=3, seed=1)
    _build_corpus_tree(vox2_dev, ["id00000", "id00001"], n_yt=3, seed=2)
    dm = VoxCelebDataModule(
        VoxCelebConfig(
            data_dir=None,
            shards_dir=tmp_path / "shards",
            voxceleb1_dev_dir=vox1_dev,
            voxceleb2_dev_dir=vox2_dev,
            all_voxceleb1_is_test_set=False,
            train_val_ratio=0.7,
            samples_per_shard=4,
            eer_validation_pairs=4,
        )
    )
    dm.prepare_data()
    train_spk = {
        s.key.split("/")[0]
        for s in ShardReader(
            ShardReader.discover(dm.cfg.shards_dir / "train")
        )
    }
    assert train_spk == {"id10000", "id10001", "id00000", "id00001"}


def test_has_split_flags_gate_shard_writing(tmp_path):
    """has_train/has_val/has_test (reference voxceleb2_test_hard.yaml:13-16)
    gate which splits are written; disabled splits leave no shard dir."""
    data_dir = tmp_path / "wav"
    _build_dataset(data_dir, n_spk=4, test_spk=2)
    dm = VoxCelebDataModule(
        VoxCelebConfig(
            data_dir=data_dir,
            shards_dir=tmp_path / "shards",
            test_trial_path=tmp_path / "trials.txt",
            train_val_ratio=0.7,
            samples_per_shard=4,
            eer_validation_pairs=4,
            has_val=False,
            has_test=False,
        )
    )
    dm.prepare_data()
    out = dm.cfg.shards_dir
    assert (out / "train").exists()
    assert not (out / "val").exists()
    assert not (out / "test").exists()
    assert not (out / "val_pairs.txt").exists()
