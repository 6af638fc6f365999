"""Tracked-sample embedding progress (runtime/progress.py — working
re-design of the reference's dead-code progress_tracker_callback.py)."""

import numpy as np
import pytest

from w2v2_speaker_tpu.runtime.progress import ProgressTracker

SR = 16000


def _batches(n_batches=3, bs=6, n_spk=8, t=SR):
    rng = np.random.default_rng(0)
    for i in range(n_batches):
        labels = rng.integers(0, n_spk, size=bs)
        yield {
            "features": rng.normal(size=(bs, t)).astype(np.float32),
            "labels": labels,
            "keys": [f"k{i}_{j}" for j in range(bs)],
        }


def test_select_samples_balanced_over_first_speakers(tmp_path):
    tr = ProgressTracker(tmp_path, num_speakers=3, per_speaker=2)
    assert tr.select_samples(_batches(n_batches=10))
    assert len(tr.labels) <= 6
    assert set(tr.labels.tolist()) <= {0, 1, 2}
    counts = np.bincount(tr.labels, minlength=3)
    assert counts.max() <= 2
    # labels sorted by speaker, mask defaulted to all-valid
    assert (np.sort(tr.labels) == tr.labels).all()
    assert tr.mask.all()


def test_select_samples_empty_when_no_tracked_speaker(tmp_path):
    tr = ProgressTracker(tmp_path, num_speakers=2)

    def high_label_batches():
        yield {
            "features": np.zeros((4, SR), np.float32),
            "labels": np.array([7, 8, 9, 7]),
        }

    assert not tr.select_samples(high_label_batches())


def test_snapshot_writes_artifacts_and_separation(tmp_path):
    tr = ProgressTracker(tmp_path / "progress", num_speakers=3, per_speaker=2)
    assert tr.select_samples(_batches(n_batches=10))

    rng = np.random.default_rng(1)
    templates = rng.normal(size=(3, 32))

    def embed(features, mask):
        # well-separated synthetic clusters keyed by the tracked labels
        return np.stack(
            [templates[l] + 0.05 * rng.normal(size=32) for l in tr.labels]
        )

    metrics = tr.snapshot(1200, embed)
    d = tmp_path / "progress" / "step_00001200"
    assert (d / "embeddings.npy").exists()
    assert (d / "stats.txt").exists()
    assert (d / "embeddings.png").exists()
    loaded = np.load(d / "embeddings.npy")
    assert loaded.shape == (len(tr.labels), 32)
    assert metrics["track_separation"] > 0.5  # clusters clearly separated
    assert metrics["track_intra_cos"] > metrics["track_inter_cos"]


def test_snapshot_without_heatmap(tmp_path):
    tr = ProgressTracker(tmp_path, num_speakers=2, heatmap=False)
    assert tr.select_samples(_batches(n_batches=10))
    m = tr.snapshot(5, lambda f, mask: np.eye(len(tr.labels), 8))
    assert not list(tmp_path.glob("**/*.png"))
    assert "track_inter_cos" in m
