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


def test_select_samples_pads_varying_time_lengths(tmp_path):
    """Probe rows picked from batches with different T (chunk strategy
    'none', or batches padded only to their own max) must stack — padded
    to a common T with mask False on the pad."""
    tr = ProgressTracker(tmp_path, num_speakers=2, per_speaker=1)

    def ragged_batches():
        yield {
            "features": np.ones((2, 100), np.float32),
            "labels": np.array([0, 5]),
            "mask": np.ones((2, 100), bool),
        }
        yield {
            "features": np.ones((2, 160), np.float32),
            "labels": np.array([1, 6]),
            "mask": np.ones((2, 160), bool),
        }

    assert tr.select_samples(ragged_batches())
    assert tr.features.shape == (2, 160)
    assert tr.mask.shape == (2, 160)
    assert tr.mask[0, :100].all() and not tr.mask[0, 100:].any()
    assert (tr.features[0, 100:] == 0).all()
    assert tr.mask[1].all()


def test_select_samples_bounded_by_max_scan_batches(tmp_path):
    """A tracked speaker with too few utterances must not force a
    full-stream decode: the scan stops at max_scan_batches and uses what
    it collected."""
    tr = ProgressTracker(
        tmp_path, num_speakers=2, per_speaker=2, max_scan_batches=3
    )
    scanned = []

    def endless():
        i = 0
        while True:
            scanned.append(i)
            # speaker 1 never appears: without the cap this loops forever
            yield {
                "features": np.ones((1, 50), np.float32),
                "labels": np.array([0]),
            }
            i += 1

    assert tr.select_samples(endless())
    assert len(scanned) <= 4
    assert set(tr.labels.tolist()) == {0}


def test_snapshot_without_heatmap(tmp_path):
    tr = ProgressTracker(tmp_path, num_speakers=2, heatmap=False)
    assert tr.select_samples(_batches(n_batches=10))
    m = tr.snapshot(5, lambda f, mask: np.eye(len(tr.labels), 8))
    assert not list(tmp_path.glob("**/*.png"))
    assert "track_inter_cos" in m
