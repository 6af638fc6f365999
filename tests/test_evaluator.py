"""Evaluator orchestration: scoring paths, sentinels, centering/length-norm."""

import numpy as np
import pytest

from w2v2_speaker_tpu.data.trials import EvaluationPair
from w2v2_speaker_tpu.eval.evaluator import (
    CosineDistanceEvaluator,
    EmbeddingSample,
    center,
    compute_mean_std,
    length_norm,
)

RNG = np.random.default_rng(0)


def _samples_and_pairs(n_spk=6, per_spk=3, d=16, noise=0.3):
    templates = RNG.normal(size=(n_spk, d))
    samples, pairs = [], []
    for s in range(n_spk):
        for j in range(per_spk):
            samples.append(
                EmbeddingSample(
                    f"s{s}/y/{j}", templates[s] + RNG.normal(scale=noise, size=d)
                )
            )
    for s in range(n_spk):
        pairs.append(EvaluationPair(True, f"s{s}/y/0", f"s{s}/y/1"))
        pairs.append(
            EvaluationPair(False, f"s{s}/y/0", f"s{(s+1)%n_spk}/y/2")
        )
    return samples, pairs


def test_cosine_evaluate_end_to_end():
    samples, pairs = _samples_and_pairs()
    ev = CosineDistanceEvaluator()
    result = ev.evaluate(pairs, samples)
    assert set(result) == {"eer", "eer_threshold", "mdc", "mdc_threshold"}
    assert result["eer"] < 0.2


def test_missing_sample_returns_sentinel():
    samples, pairs = _samples_and_pairs()
    pairs.append(EvaluationPair(True, "nope/y/0", "s0/y/0"))
    ev = CosineDistanceEvaluator()
    with pytest.warns(UserWarning):
        result = ev.evaluate(pairs, samples)
    assert result == {
        "eer": -1,
        "eer_threshold": -1,
        "mdc": -1,
        "mdc_threshold": -1,
    }


def test_duplicate_sample_id_raises():
    samples, pairs = _samples_and_pairs()
    samples.append(samples[0])
    with pytest.raises(ValueError):
        CosineDistanceEvaluator().evaluate(pairs, samples)


def test_degenerate_scores_give_sentinel_eer():
    """All-same-speaker trial list -> ROC undefined -> eer=1/1337 sentinel
    (speaker_recognition_evaluator.py:91-109)."""
    samples, _ = _samples_and_pairs()
    pairs = [EvaluationPair(True, "s0/y/0", "s0/y/1")]
    result = CosineDistanceEvaluator().evaluate(pairs, samples)
    assert result["eer"] == 1 and result["eer_threshold"] == 1337


def test_centering_changes_scores_and_requires_fit():
    samples, pairs = _samples_and_pairs()
    ev = CosineDistanceEvaluator(center_before_scoring=True)
    with pytest.raises(ValueError):
        ev.fit_parameters([samples[0].embedding, samples[1].embedding])
    ev.fit_parameters([s.embedding for s in samples])
    assert ev.mean is not None and ev.std is not None
    r1 = ev.evaluate(pairs, samples)
    ev.reset_parameters()
    assert ev.mean is None


def test_length_norm_path():
    samples, pairs = _samples_and_pairs()
    ev = CosineDistanceEvaluator(length_norm_before_scoring=True)
    r = ev.evaluate(pairs, samples)
    # length norm doesn't change cosine scores (they're scale-invariant)
    r2 = CosineDistanceEvaluator().evaluate(pairs, samples)
    assert r["eer"] == pytest.approx(r2["eer"], abs=1e-12)


def test_ensemble_scores_average():
    samples, pairs = _samples_and_pairs()
    ens = [
        EmbeddingSample(s.sample_id, [s.embedding, s.embedding])
        for s in samples
    ]
    r_ens = CosineDistanceEvaluator().evaluate(pairs, ens)
    r_single = CosineDistanceEvaluator().evaluate(pairs, samples)
    assert r_ens["eer"] == pytest.approx(r_single["eer"], abs=1e-9)


def test_ensemble_mixed_sizes_raise():
    samples, pairs = _samples_and_pairs()
    ens = [
        EmbeddingSample(s.sample_id, [s.embedding, s.embedding])
        for s in samples
    ]
    ens[0] = EmbeddingSample(ens[0].sample_id, [ens[0].embedding[0]])
    with pytest.raises(ValueError):
        CosineDistanceEvaluator().evaluate(pairs, ens)


def test_non_pooled_scoring():
    """[frames, D] embeddings use the mean-pairwise-cosine path."""
    n_spk, d = 4, 8
    templates = RNG.normal(size=(n_spk, d))
    samples, pairs = [], []
    for s in range(n_spk):
        for j in range(2):
            frames = templates[s] + RNG.normal(scale=0.2, size=(60, d))
            samples.append(EmbeddingSample(f"s{s}/y/{j}", frames))
    for s in range(n_spk):
        pairs.append(EvaluationPair(True, f"s{s}/y/0", f"s{s}/y/1"))
        pairs.append(
            EvaluationPair(False, f"s{s}/y/0", f"s{(s+1)%n_spk}/y/1")
        )
    r = CosineDistanceEvaluator().evaluate(pairs, samples)
    assert r["eer"] < 0.3


def test_mean_std_helpers():
    x = RNG.normal(size=(50, 8))
    mean, std = compute_mean_std(x)
    np.testing.assert_allclose(std, x.std(axis=0, ddof=1))
    c = center(x, mean, std)
    assert abs(c.mean()) < 1e-10
    ln = length_norm(x)
    np.testing.assert_allclose(np.linalg.norm(ln, axis=1), 1.0, rtol=1e-10)
