"""Unit tests: collate/pad, chunk selection, normalization, trial files."""

import numpy as np
import pytest

from w2v2_speaker_tpu.data.chunks import ChunkSelector, SelectionStrategy
from w2v2_speaker_tpu.data.collate import (
    PaddedBatch,
    bucket_length,
    collate_pad_right,
)
from w2v2_speaker_tpu.data.normalize import normalize_2d, normalize_waveform
from w2v2_speaker_tpu.data.trials import (
    EvaluationPair,
    generate_validation_pairs,
    load_evaluation_pairs,
    save_evaluation_pairs,
)


# ---------------------------------------------------------------- collate

def test_collate_1d_pads_right():
    samples = [np.ones(3), np.ones(5), np.ones(2)]
    batch = collate_pad_right(samples)
    assert batch.values.shape == (3, 5)
    np.testing.assert_array_equal(batch.lengths, [3, 5, 2])
    assert batch.values[0, 3] == 0 and batch.values[2, 4] == 0
    np.testing.assert_array_equal(
        batch.mask, np.array([[1, 1, 1, 0, 0], [1] * 5, [1, 1, 0, 0, 0]], bool)
    )


def test_collate_2d_and_value():
    samples = [np.ones((3, 4)), np.ones((6, 4))]
    batch = collate_pad_right(samples, value=-1.0)
    assert batch.values.shape == (2, 6, 4)
    assert batch.values[0, 5, 0] == -1.0


def test_collate_bucketing_static_shape():
    samples = [np.ones(130), np.ones(97)]
    batch = collate_pad_right(samples, pad_to_multiple=128)
    assert batch.values.shape == (2, 256)
    b2 = collate_pad_right([np.ones(10)], bucket_boundaries=[64, 256])
    assert b2.values.shape == (1, 64)


def test_collate_inconsistent_features_raises():
    with pytest.raises(ValueError):
        collate_pad_right([np.ones((3, 4)), np.ones((3, 5))])


def test_bucket_length():
    assert bucket_length(100, pad_to_multiple=64) == 128
    assert bucket_length(100, bucket_boundaries=[50, 150, 300]) == 150
    with pytest.raises(ValueError):
        bucket_length(1000, bucket_boundaries=[50])


# ---------------------------------------------------------------- chunks

def test_chunk_start_end():
    wav = np.arange(100.0)
    sel = ChunkSelector("start", chunk_length_sec=1.0, sample_rate=10)
    assert list(sel(wav)[0]) == list(np.arange(10.0))
    sel = ChunkSelector("end", 1.0, 10)
    assert list(sel(wav)[0]) == list(np.arange(90.0, 100.0))


def test_chunk_random_within_bounds():
    wav = np.arange(100.0)
    sel = ChunkSelector(SelectionStrategy.random, 2.0, 10)
    rng = np.random.default_rng(0)
    for _ in range(20):
        (c,) = sel(wav, rng)
        assert c.shape == (20,)
        assert c[0] >= 0 and c[-1] <= 99


def test_chunk_random_shorter_than_chunk_returns_all():
    wav = np.arange(5.0)
    sel = ChunkSelector("random", 1.0, 10)
    (c,) = sel(wav, np.random.default_rng(0))
    assert c.shape == (5,)


def test_chunk_contiguous_fan_out():
    wav = np.arange(35.0)
    sel = ChunkSelector("contiguous", 1.0, 10)
    chunks = sel(wav)
    assert len(chunks) == 3
    assert all(c.shape == (10,) for c in chunks)
    np.testing.assert_array_equal(chunks[1], np.arange(10.0, 20.0))


def test_chunk_random_contiguous_aligned():
    wav = np.arange(100.0)
    sel = ChunkSelector("random_contiguous", 3.0, 10)
    rng = np.random.default_rng(1)
    for _ in range(10):
        (c,) = sel(wav, rng)
        assert c[0] % 30 == 0


# ---------------------------------------------------------------- normalize

def test_normalize_2d_channelwise_matches_torch_semantics():
    rng = np.random.default_rng(0)
    x = rng.normal(3.0, 2.0, size=(50, 8))
    normed, mean, std = normalize_2d(x, channel_wise=True)
    # torch.std_mean uses ddof=1
    np.testing.assert_allclose(std, x.std(axis=0, ddof=1))
    np.testing.assert_allclose(
        normed, (x - x.mean(0)) / (x.std(0, ddof=1) + 1e-5)
    )


def test_normalize_2d_global():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(30, 4))
    normed, mean, std = normalize_2d(x, channel_wise=False)
    assert np.isscalar(mean) or mean.ndim == 0
    assert abs(normed.mean()) < 1e-10


def test_normalize_waveform():
    rng = np.random.default_rng(2)
    w = rng.normal(5.0, 3.0, size=1000)
    n = normalize_waveform(w)
    assert abs(n.mean()) < 1e-10
    assert n.std(ddof=1) == pytest.approx(1.0, rel=1e-4)


# ---------------------------------------------------------------- trials

def test_trial_roundtrip(tmp_path):
    pairs = [
        EvaluationPair(True, "id1/yt1/001", "id1/yt2/002"),
        EvaluationPair(False, "id1/yt1/001", "id2/yt3/001"),
    ]
    f = tmp_path / "trials.txt"
    save_evaluation_pairs(pairs, f)
    loaded = load_evaluation_pairs(f)
    assert loaded == pairs


def test_trial_gt_consistency_check(tmp_path):
    f = tmp_path / "bad.txt"
    f.write_text("1 id1/a/1.wav id2/b/2.wav\n")
    with pytest.raises(ValueError):
        load_evaluation_pairs(f)


def test_generate_validation_pairs_balanced_and_deterministic():
    sample_map = {
        f"spk{i}": [f"spk{i}/yt/{j:03d}" for j in range(6)] for i in range(8)
    }
    pairs = generate_validation_pairs(sample_map, num_pairs=40, seed=123)
    assert len(pairs) == 40
    n_pos = sum(p.same_speaker for p in pairs)
    assert n_pos == 20
    for p in pairs:
        spk1 = p.sample1_id.split("/")[0]
        spk2 = p.sample2_id.split("/")[0]
        assert (spk1 == spk2) == p.same_speaker
    # no duplicates in either orientation
    seen = set()
    for p in pairs:
        key = frozenset((p.sample1_id, p.sample2_id))
        assert key not in seen
        seen.add(key)
    again = generate_validation_pairs(sample_map, num_pairs=40, seed=123)
    assert again == pairs
