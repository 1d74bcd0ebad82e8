"""Unit tests for dirjax.utils.evaluation.

Cross-checks:
  * hand-computed AP values on tiny rankings,
  * sklearn.average_precision_score for the classic convention,
  * the reference implementation at /root/reference (loaded by file path,
    never copied) for the revisited convention.
"""

import importlib.util
import os

import numpy as np
import pytest

from dirjax.utils import evaluation as ev

REF_EVAL = "/root/reference/dirtorch/utils/evaluation.py"


def _load_reference_eval():
    if not os.path.exists(REF_EVAL):
        return None
    try:
        spec = importlib.util.spec_from_file_location("ref_evaluation", REF_EVAL)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


REF = _load_reference_eval()


class TestRevisitedAP:
    def test_empty(self):
        assert ev.average_precision_revisited([]) == 0.0

    def test_perfect_single(self):
        # one positive at rank 0: left=1, right=1 -> AP=1
        assert ev.average_precision_revisited([0]) == pytest.approx(1.0)

    def test_single_positive_rank1(self):
        # left = 0/1 = 0, right = 1/2 -> AP = (0 + 0.5)/2 = 0.25
        assert ev.average_precision_revisited([1]) == pytest.approx(0.25)

    def test_two_positives_hand_computed(self):
        # ranks [0, 2]: first: (1 + 1)/2 * 1/2 ; second: (1/2 + 2/3)/2 * 1/2
        expected = (1 + 1) / 2 * 0.5 + (1 / 2 + 2 / 3) / 2 * 0.5
        assert ev.average_precision_revisited([0, 2]) == pytest.approx(expected)

    def test_all_positives_first(self):
        assert ev.average_precision_revisited([0, 1, 2]) == pytest.approx(1.0)

    @pytest.mark.skipif(REF is None, reason="reference not importable")
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_reference(self, seed):
        rng = np.random.default_rng(seed)
        n = rng.integers(1, 50)
        ranks = np.sort(rng.choice(200, size=n, replace=False))
        ours = ev.average_precision_revisited(ranks)
        theirs = REF.compute_average_precision(ranks)
        assert ours == pytest.approx(theirs, abs=1e-12)


class TestClassicAP:
    @pytest.mark.parametrize("seed", range(5))
    def test_matches_sklearn(self, seed):
        sklearn_metrics = pytest.importorskip("sklearn.metrics")
        rng = np.random.default_rng(seed)
        labels = rng.integers(0, 2, size=100)
        if labels.sum() == 0:
            labels[0] = 1
        scores = rng.normal(size=100)
        ours = ev.average_precision_classic(labels, scores)
        theirs = sklearn_metrics.average_precision_score(labels, scores)
        assert ours == pytest.approx(theirs, abs=1e-12)

    def test_with_ties(self):
        sklearn_metrics = pytest.importorskip("sklearn.metrics")
        labels = np.array([1, 0, 1, 0, 1, 0])
        scores = np.array([0.5, 0.5, 0.5, 0.2, 0.2, 0.1])
        assert ev.average_precision_classic(labels, scores) == pytest.approx(
            sklearn_metrics.average_precision_score(labels, scores), abs=1e-12
        )

    def test_no_positives(self):
        assert ev.average_precision_classic([0, 0], [1.0, 2.0]) == 0.0


class TestQuantizedAP:
    @pytest.mark.skipif(REF is None, reason="reference not importable")
    @pytest.mark.parametrize("seed", range(3))
    def test_matches_reference(self, seed):
        rng = np.random.default_rng(seed)
        labels = rng.integers(0, 2, size=60)
        labels[0] = 1
        scores = rng.normal(size=60)
        order = np.argsort(-scores)
        ours = ev.average_precision_quantized(labels, order)
        theirs = REF.compute_average_precision_quantized(labels, order)
        assert ours == pytest.approx(float(theirs), abs=1e-12)


class TestJunkHandling:
    def test_junk_removed_before_ranking(self):
        # junk image (gt=0) scored above the positive must not hurt AP
        gt = np.array([1, 0, -1], dtype=np.int8)
        scores = np.array([0.5, 0.9, 0.1])
        ranks = ev.positive_ranks_from_scores(gt, scores)
        np.testing.assert_array_equal(ranks, [0])
        assert ev.ap_from_gt_scores(gt, scores) == pytest.approx(1.0)

    def test_no_positives_returns_minus_one(self):
        gt = np.array([-1, 0, -1], dtype=np.int8)
        scores = np.array([0.5, 0.9, 0.1])
        assert ev.ap_from_gt_scores(gt, scores) == -1.0

    def test_tie_break_matches_reference_order(self):
        # equal scores: reference uses argsort(ascending)[::-1], i.e. the
        # LAST index wins ties after reversal
        gt = np.array([1, -1], dtype=np.int8)
        scores = np.array([0.5, 0.5])
        ranks = ev.positive_ranks_from_scores(gt, scores)
        # argsort([.5,.5]) = [0,1] -> reversed [1,0]: negative first
        np.testing.assert_array_equal(ranks, [1])

    def test_modes_dict(self):
        gt_modes = {
            "easy": np.array([1, -1, -1], dtype=np.int8),
            "hard": np.array([-1, 1, -1], dtype=np.int8),
        }
        scores = np.array([0.9, 0.8, 0.1])
        res = ev.revisited_ap_modes(gt_modes, scores)
        assert res["easy"] == pytest.approx(1.0)
        # hard positive at rank 1: (left 0/1 + right 1/2) / 2 = 0.25
        assert res["hard"] == pytest.approx(0.25)


class TestTopK:
    def test_basic(self):
        scores = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1]])
        target = np.array([1, 2])
        top1, top2 = ev.accuracy_topk(scores, target, topk=(1, 2))
        assert top1 == pytest.approx(0.5)
        assert top2 == pytest.approx(0.5)

    @pytest.mark.skipif(REF is None, reason="reference not importable")
    def test_matches_reference(self):
        rng = np.random.default_rng(1)
        scores = rng.normal(size=(16, 10))
        target = rng.integers(0, 10, size=16)
        ours = ev.accuracy_topk(scores, target, topk=(1, 5))
        theirs = REF.accuracy_topk(scores, target, topk=(1, 5))
        assert ours == pytest.approx([float(t) for t in theirs])


def test_mean_excluding_invalid():
    assert ev.mean_excluding_invalid([1.0, -1.0, 0.5]) == pytest.approx(0.75)
    assert np.isnan(ev.mean_excluding_invalid([-1.0]))
