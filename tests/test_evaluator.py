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


# ---------------------------------------------------------------------------
# AS-Norm (adaptive symmetric score normalization) — beyond-reference
# ---------------------------------------------------------------------------


def _asnorm_setup(n_spk=8, per_spk=4, d=24, noise=0.35, shift=0.0, seed=7):
    """Speaker clusters + a per-utterance domain shift on half the test
    speakers (the trial-dependent score offset AS-Norm exists to remove)."""
    rng = np.random.default_rng(seed)
    templates = rng.normal(size=(n_spk, d))
    bias = rng.normal(size=d)
    bias /= np.linalg.norm(bias)
    samples, pairs = [], []
    for s in range(n_spk):
        for j in range(per_spk):
            e = templates[s] + rng.normal(scale=noise, size=d)
            if shift and s % 2 == 0:
                e = e + shift * np.linalg.norm(e) * bias
            samples.append(EmbeddingSample(f"s{s}/y/{j}", e))
    for s in range(n_spk):
        pairs.append(EvaluationPair(True, f"s{s}/y/0", f"s{s}/y/1"))
        pairs.append(
            EvaluationPair(False, f"s{s}/y/0", f"s{(s + 1) % n_spk}/y/2")
        )
    # cohort: held-out utterances of the same speakers (labels -> per-spk
    # means), drawn with the same shift distribution
    cohort_embs, cohort_labels = [], []
    for s in range(n_spk):
        for j in range(6):
            e = templates[s] + rng.normal(scale=noise, size=d)
            if shift and s % 2 == 0:
                e = e + shift * np.linalg.norm(e) * bias
            cohort_embs.append(e)
            cohort_labels.append(s)
    return samples, pairs, cohort_embs, cohort_labels


def test_asnorm_scores_bounded_and_rank_preserving():
    from w2v2_speaker_tpu.eval.evaluator import ASNormCosineEvaluator

    samples, pairs, cohort, labels = _asnorm_setup()
    ev = ASNormCosineEvaluator(cohort_topk=10)
    ev.fit_parameters(cohort, labels)
    # cohort is per-speaker means: one model per unique label
    assert ev.cohort.shape == (8, 24)
    sample_map = {s.sample_id: s for s in samples}
    ppairs = [(sample_map[p.sample1_id], sample_map[p.sample2_id]) for p in pairs]
    scores = np.asarray(ev._compute_prediction_scores(ppairs))
    # squashed into (-1, 1): the framework's (s+1)/2 clip stays bijective,
    # so EER/minDCF equal those of the raw AS-Norm scores
    assert np.all(np.abs(scores) < 1.0)
    res = ev.evaluate(pairs, samples)
    assert 0.0 <= res["eer"] <= 1.0


def test_asnorm_removes_domain_shift_offset():
    """With half the population shifted along a common bias direction, raw
    cosine scores of shifted trials are offset; AS-Norm must recover a
    better EER than plain cosine."""
    from w2v2_speaker_tpu.eval.evaluator import ASNormCosineEvaluator

    samples, pairs, cohort, labels = _asnorm_setup(
        n_spk=12, per_spk=4, noise=0.55, shift=1.4, seed=11
    )
    plain = CosineDistanceEvaluator(length_norm_before_scoring=True)
    eer_plain = plain.evaluate(pairs, samples)["eer"]
    ev = ASNormCosineEvaluator(cohort_topk=6)
    ev.fit_parameters(cohort, labels)
    eer_asnorm = ev.evaluate(pairs, samples)["eer"]
    assert eer_asnorm <= eer_plain + 1e-9, (eer_asnorm, eer_plain)


def test_asnorm_requires_cohort():
    from w2v2_speaker_tpu.eval.evaluator import ASNormCosineEvaluator

    samples, pairs = _samples_and_pairs()
    ev = ASNormCosineEvaluator()
    with pytest.raises(ValueError, match="cohort"):
        ev.evaluate(pairs, samples)
    # reset drops the cohort again
    ev.fit_parameters([RNG.normal(size=16) for _ in range(5)])
    ev.reset_parameters()
    assert ev.cohort is None


def test_asnorm_falls_back_for_non_pooled():
    from w2v2_speaker_tpu.eval.evaluator import ASNormCosineEvaluator

    ev = ASNormCosineEvaluator()
    ev.fit_parameters([RNG.normal(size=16) for _ in range(5)])
    a = EmbeddingSample("a", RNG.normal(size=(10, 16)))
    b = EmbeddingSample("b", RNG.normal(size=(12, 16)))
    with pytest.warns(UserWarning, match="pooled"):
        scores = ev._compute_prediction_scores([(a, b)])
    assert len(scores) == 1


def test_build_evaluator_asnorm_preset():
    from w2v2_speaker_tpu.runtime.config import load_config
    from w2v2_speaker_tpu.runtime.experiment import build_evaluator
    import pathlib

    cfg = load_config(
        pathlib.Path(__file__).resolve().parent.parent / "config",
        "train_eval",
        ["evaluator=cosine_distance_asnorm"],
    )
    ev = build_evaluator(cfg)
    assert ev.cohort_topk == 300
    assert ev.max_num_training_samples == 2000
    assert ev.length_norm_before_scoring
