"""Recall auto-tuning (dirjax.tuning): ground-truth oracle, recall
metric, and the cheapest-knobs sweep over IVF/PQ serving indexes."""

import numpy as np
import pytest

from dirjax.serving import IVFPQIndex, PQIndex, RetrievalIndex
from dirjax.tuning import TuneResult, exact_ground_truth, recall_at_k, tune


@pytest.fixture
def clustered(rng):
    # intra-cluster spread 0.2: neighbor-score gaps must comfortably
    # exceed the int8 rerank noise (~1e-3) or recall tests would measure
    # quantization luck instead of the tuner
    centers = rng.normal(size=(16, 32)).astype(np.float32)
    db = (centers[np.arange(320) % 16]
          + 0.2 * rng.normal(size=(320, 32))).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[:8] + 0.01 * rng.normal(size=(8, 32)).astype(np.float32)
    return db, q.astype(np.float32)


class TestOracle:
    def test_exact_ground_truth_matches_argsort(self, rng):
        db = rng.normal(size=(100, 16)).astype(np.float32)
        q = rng.normal(size=(5, 16)).astype(np.float32)
        gt = exact_ground_truth(q, db, 7, chunk=32)   # force blocking
        want = (-(q @ db.T)).argsort(axis=1, kind="stable")[:, :7]
        np.testing.assert_array_equal(gt, want)

    def test_recall_at_k(self):
        gt = np.array([[0, 1, 2], [3, 4, 5]])
        assert recall_at_k(gt, gt) == 1.0
        assert recall_at_k(np.array([[0, 9, 8], [3, 4, 7]]), gt) \
            == pytest.approx(3 / 6)
        # -1 padding never counts as a hit
        assert recall_at_k(np.array([[-1, -1, -1], [-1, -1, -1]]), gt) == 0.0


class TestTune:
    def test_ivf_tune_finds_small_nprobe(self, clustered):
        # rerank=True so recall is PROBE-limited (the int8 rescore fixes
        # residual-quantization noise): the tuner must find that a
        # fraction of the 16 cells reaches the target
        db, q = clustered
        index = IVFPQIndex(db, nlist=16, m=8, ksub=16, nprobe=1,
                           rerank=True, sample=None, slab=8)
        res = tune(index, q, k=5, target=0.9, descriptors=db)
        assert isinstance(res, TuneResult)
        assert res.met and res.recall >= 0.9
        # tight clusters: a fraction of the 16 cells must be enough
        assert res.params["nprobe"] < 16
        # the sweep stops at the first (cheapest) success
        assert res.trials[-1][1] == res.recall
        # the grid walks (nprobe, rerank_factor) in cost order
        assert res.trials[0][0] == {"nprobe": 1, "rerank_factor": 1}
        # recall at the chosen setting reproduces through search()
        idxs = index.search(q, k=5, **res.params)[1]
        gt = exact_ground_truth(q, db, 5)
        assert recall_at_k(idxs, gt) == pytest.approx(res.recall)

    def test_ivf_apply_sets_default_nprobe(self, clustered):
        db, q = clustered
        index = IVFPQIndex(db, nlist=16, m=8, ksub=16, nprobe=1,
                           sample=None, slab=8)
        res = tune(index, q, k=5, target=0.9, descriptors=db)
        res.apply(index)
        assert index.nprobe == res.params["nprobe"]

    def test_unreachable_target_reports_best_effort(self, clustered):
        db, q = clustered
        index = PQIndex(db, m=4, ksub=16, sample=None)  # coarse: low recall
        res = tune(index, q, k=5, target=1.01, descriptors=db)
        assert not res.met
        assert res.recall == max(r for _, r in res.trials)

    def test_pq_rerank_sweeps_factor(self, clustered):
        db, q = clustered
        index = PQIndex(db, m=8, ksub=16, rerank=True, sample=None)
        res = tune(index, q, k=5, target=0.99, descriptors=db)
        # the sweep must actually walk the rerank_factor knob
        assert all("rerank_factor" in p for p, _ in res.trials)
        assert "rerank_factor" in res.params
        recalls = [r for _, r in res.trials]
        assert res.recall == recalls[-1]

    def test_exact_index_trivial(self, clustered):
        db, q = clustered
        index = RetrievalIndex(db)
        res = tune(index, q, k=5, target=0.99, descriptors=db)
        assert res.met and res.params == {} and res.recall == 1.0

    def test_requires_oracle(self, clustered):
        db, q = clustered
        with pytest.raises(ValueError, match="ground_truth"):
            tune(RetrievalIndex(db), q, k=5)

    def test_rejects_narrow_ground_truth(self, clustered):
        # a gt narrower than k silently INFLATES recall — must raise
        db, q = clustered
        gt5 = exact_ground_truth(q, db, 5)
        with pytest.raises(ValueError, match="columns"):
            tune(RetrievalIndex(db), q, gt5, k=10)

    def test_small_corpus_padding_recall(self, rng):
        # gt padded with -1 (corpus smaller than k): the denominator is
        # the VALID gt entries, so a perfect result still reads 1.0
        db = rng.normal(size=(5, 16)).astype(np.float32)
        q = rng.normal(size=(3, 16)).astype(np.float32)
        gt = exact_ground_truth(q, db, 10)
        assert (gt[:, 5:] == -1).all()
        perfect = np.concatenate(
            [gt[:, :5], np.full((3, 5), -1, np.int64)], axis=1)
        assert recall_at_k(perfect, gt) == 1.0
        # and a perfect exact index tunes to 1.0 at k == n
        res = tune(RetrievalIndex(db), q, k=5, target=0.95,
                   descriptors=db)
        assert res.met and res.recall == 1.0

    def test_ivf_ladder_reaches_virtual_cells(self, rng):
        # a skewed corpus splits a hot cell into virtual siblings:
        # nvlist > nlist, and the exhaustive sweep setting is nvlist
        hot = rng.normal(size=(1, 16)).astype(np.float32)
        db = np.concatenate([
            hot + 0.01 * rng.normal(size=(120, 16)),  # one giant cell
            rng.normal(size=(40, 16)),
        ]).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        index = IVFPQIndex(db, nlist=4, m=4, ksub=16, nprobe=1,
                           sample=None, slab=8, cap=4)
        assert index._ivf.nvlist > index.nlist
        q = db[:4]
        res = tune(index, q, k=3, target=2.0, descriptors=db)  # sweep all
        probed = [p["nprobe"] for p, _ in res.trials]
        assert probed[-1] == index._ivf.nvlist
