"""Golden-value tests for EER / minDCF / WER against the reference semantics
(sklearn.roc_curve + scipy brentq, Kaldi threshold sweep, jiwer WER)."""

import numpy as np
import pytest

from w2v2_speaker_tpu.eval.metrics import (
    calculate_eer,
    calculate_mdc,
    calculate_wer,
    roc_points,
)


def _reference_eer(gt, scores):
    """The exact reference implementation path (eval_metrics.py:54-79)."""
    from scipy.interpolate import interp1d
    from scipy.optimize import brentq
    from sklearn.metrics import roc_curve

    fpr, tpr, thresholds = roc_curve(gt, scores, pos_label=1)
    eer = brentq(lambda x: 1.0 - x - interp1d(fpr, tpr)(x), 0.0, 1.0)
    thresh = interp1d(fpr, thresholds)(eer).item()
    return eer, thresh


def _reference_mdc(gt, scores, c_miss=1.0, c_fa=1.0, p_target=0.05):
    """The exact reference implementation path (eval_metrics.py:90-172)."""
    from operator import itemgetter

    sorted_indexes, thresholds = zip(
        *sorted(enumerate(scores), key=itemgetter(1))
    )
    gt = [gt[i] for i in sorted_indexes]
    fnrs, fprs = [], []
    for i in range(len(gt)):
        if i == 0:
            fnrs.append(gt[i])
            fprs.append(1 - gt[i])
        else:
            fnrs.append(fnrs[i - 1] + gt[i])
            fprs.append(fprs[i - 1] + 1 - gt[i])
    fnrs_norm = sum(gt)
    fprs_norm = len(gt) - fnrs_norm
    fnrs = [x / float(fnrs_norm) for x in fnrs]
    fprs = [1 - x / float(fprs_norm) for x in fprs]
    min_c_det = float("inf")
    min_thr = thresholds[0]
    for i in range(len(fnrs)):
        c_det = c_miss * fnrs[i] * p_target + c_fa * fprs[i] * (1 - p_target)
        if c_det < min_c_det:
            min_c_det = c_det
            min_thr = thresholds[i]
    c_def = min(c_miss * p_target, c_fa * (1 - p_target))
    return min_c_det / c_def, min_thr


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
@pytest.mark.parametrize("n", [20, 101, 1000])
def test_eer_matches_reference(seed, n):
    rng = np.random.default_rng(seed)
    gt = rng.integers(0, 2, size=n)
    # positives shifted up so the ROC is non-degenerate
    scores = np.clip(rng.normal(0.35, 0.2, size=n) + 0.3 * gt, 0, 1)
    ref_eer, ref_thr = _reference_eer(list(gt), list(scores))
    eer, thr = calculate_eer(list(gt), list(scores))
    assert eer == pytest.approx(ref_eer, abs=1e-9)
    # When the EER crossing sits on a vertical ROC segment the reference's
    # threshold depends on which side brentq's final iterate lands on; accept
    # anything in the bracket the reference itself can produce.
    from scipy.interpolate import interp1d
    from sklearn.metrics import roc_curve

    fpr, _, thresholds = roc_curve(gt, scores, pos_label=1)
    f = interp1d(fpr, thresholds)
    eps = 1e-9
    lo = min(float(f(max(ref_eer - eps, 0.0))), float(f(min(ref_eer + eps, 1.0))))
    hi = max(float(f(max(ref_eer - eps, 0.0))), float(f(min(ref_eer + eps, 1.0))))
    assert lo - 1e-9 <= thr <= hi + 1e-9


def test_eer_perfect_separation():
    gt = [0] * 50 + [1] * 50
    scores = [0.1] * 50 + [0.9] * 50
    eer, _ = calculate_eer(gt, scores)
    assert eer == pytest.approx(0.0, abs=1e-12)


def test_eer_with_score_ties():
    rng = np.random.default_rng(7)
    gt = rng.integers(0, 2, size=400)
    scores = np.round(
        np.clip(rng.normal(0.4, 0.2, 400) + 0.25 * gt, 0, 1), 2
    )  # heavy ties
    ref_eer, _ = _reference_eer(list(gt), list(scores))
    eer, _ = calculate_eer(list(gt), list(scores))
    assert eer == pytest.approx(ref_eer, abs=1e-9)


def test_eer_input_validation():
    with pytest.raises(ValueError):
        calculate_eer([0, 1, 2], [0.1, 0.2, 0.3])
    with pytest.raises(ValueError):
        calculate_eer([0, 1], [0.1])


@pytest.mark.parametrize("seed", [0, 5, 9])
def test_mdc_matches_reference(seed):
    rng = np.random.default_rng(seed)
    n = 500
    gt = rng.integers(0, 2, size=n)
    scores = np.clip(rng.normal(0.4, 0.2, size=n) + 0.3 * gt, 0, 1)
    ref_mdc, ref_thr = _reference_mdc(list(gt), list(scores))
    mdc, thr = calculate_mdc(list(gt), list(scores))
    assert mdc == pytest.approx(ref_mdc, abs=1e-12)
    assert thr == pytest.approx(ref_thr, abs=1e-12)


def test_mdc_validation():
    with pytest.raises(ValueError):
        calculate_mdc([0, 1], [0.2, 0.8], c_miss=0.5)
    with pytest.raises(ValueError):
        calculate_mdc([0, 1], [0.2, 0.8], p_target=1.5)


def test_roc_matches_sklearn():
    from sklearn.metrics import roc_curve

    rng = np.random.default_rng(3)
    gt = rng.integers(0, 2, size=300)
    scores = np.round(rng.random(300), 2)
    fpr, tpr, thr = roc_points(gt, scores)
    s_fpr, s_tpr, s_thr = roc_curve(
        gt, scores, pos_label=1, drop_intermediate=False
    )
    np.testing.assert_allclose(fpr, s_fpr, atol=1e-12)
    np.testing.assert_allclose(tpr, s_tpr, atol=1e-12)
    np.testing.assert_allclose(thr[1:], s_thr[1:], atol=1e-12)


def test_wer_basics():
    assert calculate_wer(["a b c"], ["a b c"]) == 0.0
    assert calculate_wer(["a b d"], ["a b c"]) == pytest.approx(1 / 3)
    assert calculate_wer(["a b"], ["a b c"]) == pytest.approx(1 / 3)
    assert calculate_wer(["a b c d"], ["a b c"]) == pytest.approx(1 / 3)
    # corpus-level: edits summed over all pairs / total ref words
    assert calculate_wer(["x", "a b c"], ["y", "a b c"]) == pytest.approx(1 / 4)


def test_wer_empty_hyp():
    assert calculate_wer([""], ["a b"]) == pytest.approx(1.0)
