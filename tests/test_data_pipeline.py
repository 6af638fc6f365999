"""Data pipeline: wav IO, tar shards, batch processors, augmentations."""

import numpy as np
import pytest

from w2v2_speaker_tpu.data import augment
from w2v2_speaker_tpu.data.batching import (
    DynamicTokenBudgetBatcher,
    PairedBatchProcessor,
    RandomBatchProcessor,
    TripletBatchProcessor,
)
from w2v2_speaker_tpu.data.io import load_raw_audio, read_wav, write_wav
from w2v2_speaker_tpu.data.samples import (
    SpeakerSample,
    SpeechSample,
    collate_paired_batch,
    collate_speaker_batch,
    collate_speech_batch,
)
from w2v2_speaker_tpu.data.shards import (
    ShardReader,
    write_speaker_shards,
    read_meta,
)
from w2v2_speaker_tpu.data.trials import EvaluationPair

RNG = np.random.default_rng(0)


def _samples(n_spk=6, per_spk=10, length=800):
    out = []
    for s in range(n_spk):
        for j in range(per_spk):
            out.append(
                SpeakerSample(
                    key=f"id{s:03d}/yt{j % 3}/{j:05d}",
                    wav=RNG.normal(size=length).astype(np.float32),
                    ground_truth=s,
                )
            )
    return out


# ------------------------------------------------------------------ wav io

def test_wav_roundtrip(tmp_path):
    wav = (0.5 * np.sin(np.linspace(0, 100, 16000))).astype(np.float32)
    f = tmp_path / "x.wav"
    write_wav(f, wav, 16000)
    back, sr = read_wav(f)
    assert sr == 16000
    np.testing.assert_allclose(back, wav, atol=1.0 / 16000)


def test_load_raw_audio_guards(tmp_path):
    wav = np.zeros(8000, np.float32)
    f = tmp_path / "x.wav"
    write_wav(f, wav, 8000)
    with pytest.raises(ValueError):
        load_raw_audio(f, expected_sample_rate=16000)


# ------------------------------------------------------------------ shards

def test_shard_write_read_roundtrip(tmp_path):
    samples = _samples()
    meta = write_speaker_shards(
        samples,
        tmp_path,
        samples_per_shard=20,
        sequential_same_speaker_samples=2,
        seed=1,
    )
    assert meta["num_shards"] == 3  # 60 samples / 20, exact
    assert meta["num_samples"] == 60
    assert meta["num_speakers"] == 6
    assert read_meta(tmp_path)["speaker_id_to_idx"]["id000"] == 0

    reader = ShardReader(ShardReader.discover(tmp_path))
    got = list(reader)
    assert len(got) == 60
    by_key = {s.key: s for s in got}
    orig = {s.key: s for s in samples}
    assert set(by_key) == set(orig)
    some = samples[7]
    np.testing.assert_array_equal(by_key[some.key].wav, some.wav)
    assert by_key[some.key].ground_truth == meta["speaker_id_to_idx"]["id000"]

    # keys-only scan (no waveform decode) sees the same keys in the same
    # order as the full read
    keys_only = list(ShardReader(ShardReader.discover(tmp_path)).iter_keys())
    assert keys_only == [s.key for s in got]


def test_shard_sequential_runs(tmp_path):
    write_speaker_shards(
        _samples(),
        tmp_path,
        samples_per_shard=12,
        sequential_same_speaker_samples=3,
        seed=2,
    )
    reader = ShardReader(ShardReader.discover(tmp_path))
    keys = [s.key.split("/")[0] for s in reader]
    # every aligned run of 3 is one speaker
    for i in range(0, len(keys), 3):
        assert len(set(keys[i : i + 3])) == 1


def test_shard_gzip_and_partial_discard(tmp_path):
    samples = _samples(n_spk=2, per_spk=7)  # 14 samples
    meta = write_speaker_shards(
        samples, tmp_path, samples_per_shard=4, use_gzip=True
    )
    assert meta["num_shards"] == 3  # 14 // 4 = 3 full shards, partial dropped
    assert meta["num_samples"] == 12
    got = list(ShardReader(ShardReader.discover(tmp_path)))
    assert len(got) == 12


def test_shard_host_splitting(tmp_path):
    write_speaker_shards(_samples(), tmp_path, samples_per_shard=10, seed=3)
    paths = ShardReader.discover(tmp_path)
    all_keys = set()
    for host in range(3):
        r = ShardReader(paths, host_id=host, num_hosts=3)
        keys = {s.key for s in r}
        assert not (keys & all_keys), "hosts must read disjoint shards"
        all_keys |= keys


# --------------------------------------------------------------- batching

def test_random_batch_processor():
    proc = RandomBatchProcessor(
        max_batch_size=8, max_queue_size=16, collate_fn=collate_speaker_batch
    )
    batches = list(proc(iter(_samples())))
    total = sum(b["features"].shape[0] for b in batches)
    assert total == 60
    assert batches[0]["features"].shape == (8, 800)
    assert batches[0]["labels"].shape == (8,)


def test_triplet_batch_processor_guarantees_pairs():
    proc = TripletBatchProcessor(
        max_batch_size=8, max_queue_size=64, collate_fn=collate_speaker_batch
    )
    for batch in proc(iter(_samples())):
        labels = batch["labels"]
        if batch["features"].shape[0] % 2 == 0:
            # every anchor (even index) is followed by its positive
            for i in range(0, len(labels) - 1, 2):
                assert labels[i] == labels[i + 1]


def test_triplet_rejects_odd_batch():
    with pytest.raises(ValueError):
        TripletBatchProcessor(7, 64, collate_speaker_batch)


def test_paired_generate_mode():
    proc = PairedBatchProcessor(
        batch_size=8,
        max_queue_size=32,
        mode="generate",
        sequential_same_speaker_samples=2,
        collate_fn=collate_paired_batch,
        pos_neg_training_batch_ratio=0.5,
        seed=0,
    )
    batches = list(proc(iter(_samples())))
    assert batches, "no batches produced"
    for b in batches:
        labels = b["labels"]
        assert labels.sum() == 4  # half positive
        assert b["features_a"].shape == b["features_b"].shape
        # positives really are same-speaker, negatives are not
        for (k1, k2), gt in zip(b["keys"], labels):
            same = k1.split("/")[0] == k2.split("/")[0]
            assert same == bool(gt)


def test_paired_reproduce_mode_exact_order():
    samples = _samples()
    pairs = [
        EvaluationPair(True, samples[0].key, samples[1].key),
        EvaluationPair(False, samples[0].key, samples[12].key),
        EvaluationPair(False, samples[3].key, samples[25].key),
    ]
    proc = PairedBatchProcessor(
        batch_size=2,
        max_queue_size=4,
        mode="reproduce",
        sequential_same_speaker_samples=1,
        collate_fn=collate_paired_batch,
        pairs=pairs,
    )
    batches = list(proc(iter(samples)))
    flat_keys = [k for b in batches for k in b["keys"]]
    assert flat_keys == [
        (p.sample1_id, p.sample2_id) for p in pairs
    ]
    flat_labels = [l for b in batches for l in b["labels"]]
    assert flat_labels == [1, 0, 0]


def test_paired_yield_limit():
    proc = PairedBatchProcessor(
        batch_size=8,
        max_queue_size=16,
        mode="generate",
        sequential_same_speaker_samples=2,
        collate_fn=collate_paired_batch,
        pos_neg_training_batch_ratio=0.5,
        yield_limit=16,
    )
    batches = list(proc(iter(_samples())))
    assert sum(b["features_a"].shape[0] for b in batches) == 16


def test_dynamic_token_budget_batcher():
    rng = np.random.default_rng(1)
    samples = [
        SpeechSample(
            key=f"u{i}",
            wav=rng.normal(size=int(rng.integers(400, 4000))).astype(
                np.float32
            ),
            transcription="hello world",
            tokens=np.array([5, 3, 9]),
        )
        for i in range(50)
    ]
    proc = DynamicTokenBudgetBatcher(
        max_samples_in_batch=16000,
        max_queue_size=25,
        collate_fn=collate_speech_batch,
    )
    batches = list(proc(iter(samples)))
    assert sum(b["features"].shape[0] for b in batches) == 50
    for b in batches:
        bs, padded = b["features"].shape
        assert bs * padded <= 16000 * 1.01 + padded  # budget respected
        assert b["labels"].shape[0] == bs
        assert b["label_lengths"].tolist() == [3] * bs


# ------------------------------------------------------------ augmentations

def test_speed_perturb_changes_length():
    wav = RNG.normal(size=16000).astype(np.float32)
    fast = augment.speed_perturb(wav, 1.1)
    slow = augment.speed_perturb(wav, 0.9)
    assert fast.shape[-1] < 16000 < slow.shape[-1]
    assert abs(fast.shape[-1] - 16000 / 1.1) < 200
    same = augment.speed_perturb(wav, 1.0)
    np.testing.assert_array_equal(same, wav)


def test_add_noise_snr_ratio():
    wav = RNG.normal(size=16000).astype(np.float32)
    noise = RNG.normal(size=16000).astype(np.float32)
    noisy = augment.add_noise_snr(wav, noise, snr_db=10.0)
    added = noisy - wav
    snr = 10 * np.log10(np.mean(wav**2) / np.mean(added**2))
    assert snr == pytest.approx(10.0, abs=0.1)


def test_time_dropout_zeroes_segments():
    aug = augment.TimeDropoutAugment(
        max_dropout_length_seconds=0.05, min_drop_count=2, max_drop_count=2,
        seed=1,
    )
    wav = np.ones(16000, np.float32)
    out = aug.process(wav)
    assert (out == 0).sum() > 0
    assert out.shape == wav.shape


def test_frequency_dropout_removes_energy_in_band():
    sr = 16000
    t = np.arange(sr) / sr
    tone = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    out = augment.band_reject(tone, 800, 1200, sr)
    assert np.mean(out**2) < 0.05 * np.mean(tone**2)
    tone2 = np.sin(2 * np.pi * 3000 * t).astype(np.float32)
    out2 = augment.band_reject(tone2, 800, 1200, sr)
    assert np.mean(out2**2) > 0.8 * np.mean(tone2**2)


def test_reverb_augment_smears_energy():
    aug = augment.ReverbAugment(room_scale_min=80, room_scale_max=100, seed=0)
    impulse = np.zeros(8000, np.float32)
    impulse[100] = 1.0
    out = aug.process(impulse)
    assert out.shape == impulse.shape
    assert np.abs(out[200:]).sum() > 0.01  # tail exists


def test_rirs_noise_augment_from_shards(tmp_path):
    # build a pointsource_noises shard set
    from w2v2_speaker_tpu.data.shards import ShardWriter

    with ShardWriter(tmp_path / "pointsource_noises.tar") as w:
        for i in range(3):
            w.write(
                f"noise/{i}",
                RNG.normal(size=500).astype(np.float32),
                {"speaker_id_idx": -1},
            )
    aug = augment.ChoiceRirsNoiseAugment(
        tmp_path, snr_choices=[10], seed=0
    )
    wav = RNG.normal(size=2000).astype(np.float32)
    out = aug.process(wav)  # noise shorter than wav -> tiled
    assert out.shape == wav.shape
    assert not np.allclose(out, wav)


def test_augmenter_composition_semantics():
    class AddOne(augment._WavAugment):
        name = "add1"

        def process(self, wav):
            return wav + 1

    sample = SpeakerSample("a/b/c", np.zeros(4, np.float32), 0)
    # stacked: two aug -> +2
    stacked = augment.Augmenter([AddOne(), AddOne()], True, False, False)
    (out,) = stacked(sample)
    assert out.wav[0] == 2 and out.key.endswith("/add1/add1")
    # yield intermediate + unaugmented: 3 outputs (0, +1, +2)
    yielding = augment.Augmenter([AddOne(), AddOne()], True, True, True)
    outs = yielding(sample)
    assert [o.wav[0] for o in outs] == [0, 1, 2]
    # invalid config
    with pytest.raises(ValueError):
        augment.Augmenter([AddOne()], False, False, False)


def test_collate_speaker_batch_strips_all_valid_mask():
    # fixed-crop batches (no padding) omit the mask entirely so the jitted
    # step skips every masked-statistics path; mask=None == all-valid
    from w2v2_speaker_tpu.data.samples import SpeakerSample

    same = [
        SpeakerSample(key=f"s/{i}", wav=np.ones(800, np.float32),
                      ground_truth=i % 3)
        for i in range(4)
    ]
    b = collate_speaker_batch(same)
    assert "mask" not in b

    ragged = same[:3] + [
        SpeakerSample(key="s/x", wav=np.ones(700, np.float32),
                      ground_truth=0)
    ]
    b = collate_speaker_batch(ragged)
    assert b["mask"].shape == (4, 800)
    assert not b["mask"].all()
    assert b["mask"][:3].all() and b["mask"][3, :700].all()
    assert not b["mask"][3, 700:].any()


def test_collate_paired_batch_strips_all_valid_masks():
    from w2v2_speaker_tpu.data.samples import PairedSample

    pairs = [
        PairedSample(
            primary_key="a", primary_wav=np.ones(800, np.float32),
            secondary_key="b", secondary_wav=np.ones(600, np.float32),
            ground_truth=1,
        ),
        PairedSample(
            primary_key="c", primary_wav=np.ones(800, np.float32),
            secondary_key="d", secondary_wav=np.ones(500, np.float32),
            ground_truth=0,
        ),
    ]
    b = collate_paired_batch(pairs)
    assert "mask_a" not in b  # both primaries full length
    assert b["mask_b"].shape == (2, 600)
    assert not b["mask_b"][1, 500:].any()
