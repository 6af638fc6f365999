"""PCA / PLDA scoring backends."""

import numpy as np
import pytest

from w2v2_speaker_tpu.data.trials import EvaluationPair
from w2v2_speaker_tpu.eval.backends import (
    LDAEvaluator,
    PCA,
    PLDAEvaluator,
    TwoCovPLDA,
)
from w2v2_speaker_tpu.eval.evaluator import EmbeddingSample

RNG = np.random.default_rng(0)


def _plda_world(n_spk=20, per_spk=12, d=16, between=2.0, within=0.5):
    means = RNG.normal(scale=between, size=(n_spk, d))
    x, labels = [], []
    for s in range(n_spk):
        x.append(means[s] + RNG.normal(scale=within, size=(per_spk, d)))
        labels += [s] * per_spk
    return np.concatenate(x), np.asarray(labels), means


def test_pca_matches_sklearn():
    from sklearn.decomposition import PCA as SkPCA

    x = RNG.normal(size=(100, 12)) @ RNG.normal(size=(12, 12))
    ours = PCA(5, whiten=True).fit(x).transform(x)
    sk = SkPCA(5, whiten=True).fit(x).transform(x)
    # components are sign-ambiguous: compare up to per-column sign
    for j in range(5):
        assert np.allclose(ours[:, j], sk[:, j], atol=1e-6) or np.allclose(
            ours[:, j], -sk[:, j], atol=1e-6
        )


def test_two_cov_plda_separates_pairs():
    x, labels, means = _plda_world()
    plda = TwoCovPLDA(num_iterations=5).fit(x, labels)
    # fresh same/different pairs
    same_llr, diff_llr = [], []
    for s in range(10):
        a = means[s] + RNG.normal(scale=0.5, size=16)
        b = means[s] + RNG.normal(scale=0.5, size=16)
        c = means[(s + 5) % 20] + RNG.normal(scale=0.5, size=16)
        same_llr.append(plda.llr(a[None], b[None])[0])
        diff_llr.append(plda.llr(a[None], c[None])[0])
    assert np.mean(same_llr) > np.mean(diff_llr)
    assert min(same_llr) > max(diff_llr) - 5  # strong separation


def test_plda_recovers_covariances():
    x, labels, _ = _plda_world(n_spk=60, per_spk=20, d=6)
    plda = TwoCovPLDA(num_iterations=15).fit(x, labels)
    # ground truth: B = 4 I, W = 0.25 I
    b_diag = np.diag(plda.B).mean()
    w_diag = np.diag(plda.W).mean()
    assert b_diag == pytest.approx(4.0, rel=0.3)
    assert w_diag == pytest.approx(0.25, rel=0.2)


def _eval_setup(evaluator):
    x, labels, means = _plda_world(n_spk=12, per_spk=10, d=16)
    evaluator.fit_parameters(list(x), list(labels))
    samples, pairs = [], []
    for s in range(12):
        for j in range(2):
            samples.append(
                EmbeddingSample(
                    f"s{s}/y/{j}",
                    means[s] + RNG.normal(scale=0.5, size=16),
                )
            )
    for s in range(12):
        pairs.append(EvaluationPair(True, f"s{s}/y/0", f"s{s}/y/1"))
        pairs.append(EvaluationPair(False, f"s{s}/y/0", f"s{(s+3)%12}/y/1"))
    return evaluator.evaluate(pairs, samples)


def test_lda_evaluator_end_to_end():
    res = _eval_setup(LDAEvaluator(num_pca_components=8))
    assert res["eer"] < 0.15


def test_plda_evaluator_end_to_end():
    res = _eval_setup(
        PLDAEvaluator(num_pca_components=8, num_em_iterations=5)
    )
    assert res["eer"] < 0.15


def test_unfitted_evaluators_raise():
    ev = LDAEvaluator()
    with pytest.raises(ValueError):
        ev._compute_prediction_scores(
            [(EmbeddingSample("a", np.zeros(4)), EmbeddingSample("b", np.zeros(4)))]
        )
    pl = PLDAEvaluator()
    with pytest.raises(ValueError):
        pl.fit_parameters([np.zeros(4)], None)
