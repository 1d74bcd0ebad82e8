"""Product-quantization tests: k-means, ADC exactness, streaming top-k,
OPQ, PQIndex serving (single-device + mesh), CLI build/query.

The exactness contract under test: ADC scores equal the dot product of
queries against centroid reconstructions bit-for-fp32 — the approximation
lives entirely in the quantizer, never in the scoring kernel.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.ops.pq import (encode_pq, pq_lookup, pq_scores, pq_topk,
                           reconstruct_pq, train_opq, train_pq)
from dirjax.parallel import make_mesh
from dirjax.serving import PQIndex, RetrievalIndex


def _normed(rng, n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


@pytest.fixture
def clustered(rng):
    """Corpus with planted cluster structure (so PQ recall is meaningful)
    + unit-norm queries near corpus points."""
    centers = rng.normal(size=(20, 32)).astype(np.float32)
    db = (centers[rng.integers(0, 20, size=600)]
          + 0.15 * rng.normal(size=(600, 32)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = db[rng.choice(600, size=8, replace=False)] \
        + 0.05 * rng.normal(size=(8, 32)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return db.astype(np.float32), q.astype(np.float32)


class TestKMeansEncode:
    def test_codebook_shapes_and_codes(self, clustered):
        db, _ = clustered
        cb = train_pq(db, m=4, ksub=16, iters=8)
        assert cb.shape == (4, 16, 8)
        codes = encode_pq(db, cb)
        assert codes.shape == (600, 4) and codes.dtype == jnp.uint8
        assert int(jnp.max(codes)) < 16

    def test_training_reduces_quantization_error(self, clustered):
        db, _ = clustered
        err = []
        for iters in (1, 12):
            cb = train_pq(db, m=4, ksub=16, iters=iters, seed=3)
            rec = reconstruct_pq(encode_pq(db, cb), cb)
            err.append(float(jnp.mean(jnp.sum((db - rec) ** 2, axis=1))))
        assert err[1] < err[0]

    def test_sampled_training_close_to_full(self, clustered):
        db, _ = clustered
        full = train_pq(db, m=4, ksub=8, iters=10, seed=0, sample=None)
        sub = train_pq(db, m=4, ksub=8, iters=10, seed=0, sample=300)
        for cb in (full, sub):
            rec = reconstruct_pq(encode_pq(db, cb), cb)
            assert float(jnp.mean(jnp.sum((db - rec) ** 2, 1))) < 0.5

    def test_encode_chunked_matches_oneshot(self, clustered):
        db, _ = clustered
        cb = train_pq(db, m=4, ksub=16, iters=4)
        np.testing.assert_array_equal(
            np.asarray(encode_pq(db, cb)),
            np.asarray(encode_pq(db, cb, chunk=128)))

    def test_dim_not_divisible_raises(self, rng):
        with pytest.raises(AssertionError):
            train_pq(_normed(rng, 300, 30), m=4, ksub=8, iters=1)


class TestADC:
    def test_scores_equal_reconstruction_dot(self, clustered):
        db, q = clustered
        cb = train_pq(db, m=4, ksub=16, iters=6)
        codes = encode_pq(db, cb)
        adc = np.asarray(pq_scores(pq_lookup(q, cb), codes))
        want = np.asarray(q @ np.asarray(reconstruct_pq(codes, cb)).T)
        np.testing.assert_allclose(adc, want, rtol=0, atol=1e-5)

    def test_topk_matches_dense(self, clustered):
        db, q = clustered
        cb = train_pq(db, m=4, ksub=16, iters=6)
        codes = encode_pq(db, cb)
        luts = pq_lookup(q, cb)
        vals, idxs = pq_topk(luts, codes, k=10, chunk=128)
        dense = np.asarray(pq_scores(luts, codes))
        dv, di = jax.lax.top_k(jnp.asarray(dense), 10)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(dv),
                                   atol=1e-5)
        # ties may permute between chunked and dense selection: compare
        # the score of the picked index, not the index itself
        picked = np.take_along_axis(dense, np.asarray(idxs), axis=1)
        np.testing.assert_allclose(picked, np.asarray(dv), atol=1e-5)

    def test_hierarchical_matches_dense(self, clustered):
        """Force the fine-max hierarchy (tiny block/chunk) and check it
        returns exactly the dense top-k (scores compared, ties tolerated)."""
        db, q = clustered
        cb = train_pq(db, m=4, ksub=16, iters=6)
        codes = encode_pq(db, cb)
        luts = pq_lookup(q, cb)
        vals, idxs = pq_topk(luts, codes, k=7, chunk=128, block=8)
        dense = np.asarray(pq_scores(luts, codes))
        dv, _ = jax.lax.top_k(jnp.asarray(dense), 7)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(dv),
                                   atol=1e-5)
        picked = np.take_along_axis(dense, np.asarray(idxs), axis=1)
        np.testing.assert_allclose(picked, np.asarray(dv), atol=1e-5)
        assert np.asarray(idxs).min() >= 0
        for row in np.asarray(idxs):   # no duplicate candidates
            assert len(set(row.tolist())) == len(row)

    def test_prepadded_n_valid_matches_unpadded(self, clustered):
        """pq_pad_codes + n_valid (the serving indexes' zero-copy path)
        must return exactly what per-call padding returns — padded junk
        rows can never surface, on the dense path or the hierarchy."""
        from dirjax.ops.pq import pq_pad_codes

        db, q = clustered
        cb = train_pq(db, m=4, ksub=16, iters=6)
        codes = encode_pq(db, cb)
        luts = pq_lookup(q, cb)
        padded, n = pq_pad_codes(codes)
        assert n == len(db) and padded.shape[0] % 256 == 0
        for kw in ({}, {"chunk": 128, "block": 8}):   # dense + hierarchy
            v0, i0 = pq_topk(luts, codes, k=10, **kw)
            v1, i1 = pq_topk(luts, padded, k=10, n_valid=n, **kw)
            np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                                       atol=1e-6)
            assert np.asarray(i1).max() < n

    def test_fused_search_matches_eager_stages(self, clustered):
        """PQIndex.search (one fused jit dispatch) == rotate/lookup/topk
        composed eagerly, including the OPQ rotation and int8 rerank."""
        db, q = clustered
        index = PQIndex(db, m=4, ksub=16, opq=True, rerank=True,
                        train_iters=6, seed=0)
        vals, idxs = index.search(q, k=5, rerank_factor=3)
        luts = pq_lookup(
            jnp.matmul(jnp.asarray(q), index.rotation,
                       precision=jax.lax.Precision.HIGHEST),
            index.codebooks)
        av, ai = pq_topk(luts, index._codes, k=15, n_valid=index.n)
        rows = np.asarray(index._rerank_db)[np.asarray(ai)].astype(
            np.float32)
        rows *= np.asarray(index._rerank_scales).reshape(-1)[
            np.asarray(ai)][:, :, None]
        scores = np.einsum("qd,qkd->qk", q, rows)
        order = np.argsort(-scores, axis=1)[:, :5]
        expect = np.take_along_axis(scores, order, axis=1)
        np.testing.assert_allclose(vals, expect, rtol=2e-5, atol=1e-5)

    def test_hierarchical_deep_pyramid_ragged(self, rng):
        """> 4096 fine blocks forces a multi-level pyramid; a ragged row
        count exercises every pad/mask path."""
        n, d = 40_009, 16
        db = rng.normal(size=(n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = _normed(rng, 3, d)
        cb = train_pq(db[:2000], m=4, ksub=16, iters=4, sample=None)
        codes = encode_pq(db, cb)
        luts = pq_lookup(q, cb)
        vals, idxs = pq_topk(luts, codes, k=5, chunk=4096, block=8)
        dense = np.asarray(pq_scores(luts, codes))
        dv, _ = jax.lax.top_k(jnp.asarray(dense), 5)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(dv),
                                   atol=1e-5)
        assert int(np.max(idxs)) < n

    def test_bf16_compute_close(self, clustered):
        db, q = clustered
        cb = train_pq(db, m=4, ksub=16, iters=6)
        codes = encode_pq(db, cb)
        luts = pq_lookup(q, cb)
        v32, _ = pq_topk(luts, codes, k=5)
        vbf, _ = pq_topk(luts, codes, k=5, compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(v32), np.asarray(vbf),
                                   rtol=0.02, atol=0.02)

    def test_topk_k_exceeds_n(self, clustered):
        db, q = clustered
        cb = train_pq(db[:40], m=4, ksub=8, iters=4, sample=None)
        codes = encode_pq(db[:40], cb)
        vals, idxs = pq_topk(pq_lookup(q, cb), codes, k=64)
        assert vals.shape == (8, 64)
        assert np.all(np.asarray(vals[:, 40:]) == -np.inf)
        assert np.all(np.asarray(idxs[:, 40:]) == -1)

    def test_recall_against_exact(self, clustered):
        db, q = clustered
        cb = train_pq(db, m=8, ksub=32, iters=15)
        _, idxs = pq_topk(pq_lookup(q, cb), encode_pq(db, cb), k=10)
        idxs = np.asarray(idxs)
        exact = (-(q @ db.T)).argsort(axis=1)
        # 8 B/row vs 128 B raw; thresholds are below the deterministic
        # seed-0 measurements (recall@10 0.39, NN-in-top10 0.75)
        recall = np.mean([len(set(map(int, a)) & set(map(int, b))) / 10.0
                          for a, b in zip(idxs, exact[:, :10])])
        nn_hit = np.mean([exact[i, 0] in set(map(int, idxs[i]))
                          for i in range(len(q))])
        assert recall >= 0.3, recall
        assert nn_hit >= 0.6, nn_hit


class TestReviewRegressions:
    def test_encode_empty_batch(self, clustered):
        db, _ = clustered
        cb = train_pq(db, m=4, ksub=16, iters=3)
        codes = encode_pq(np.zeros((0, db.shape[1]), np.float32), cb)
        assert codes.shape == (0, 4) and codes.dtype == jnp.uint8

    def test_unsafe_pallas_block_falls_back(self, clustered):
        # block=48 -> tile//block=21 violates the Mosaic sublane rule;
        # the hier path must take the XLA scan instead of tracing a
        # kernel shape that has wedged the chip (and previously this
        # combination failed at trace: 1024 % 48 != 0)
        rng = np.random.default_rng(3)
        db = rng.normal(size=(9000, 32)).astype(np.float32)
        q = rng.normal(size=(4, 32)).astype(np.float32)
        cb = train_pq(db, m=4, ksub=16, iters=3, sample=None)
        codes = encode_pq(db, cb)
        luts = pq_lookup(q, cb)
        vals, idxs = pq_topk(luts, codes, k=5, chunk=4800, block=48,
                             use_pallas=True)
        dense = np.asarray(pq_scores(luts, codes))
        picked = np.take_along_axis(dense, np.asarray(idxs), axis=1)
        dv, _ = jax.lax.top_k(jnp.asarray(dense), 5)
        np.testing.assert_allclose(picked, np.asarray(dv), atol=1e-5)


class TestGroupedKernel:
    """r5: 8-bit codebooks (mk > 1024) run phase A as grouped one-hot
    slices and phase C on 8-row fine blocks — results must stay exact
    vs the XLA scan and the brute-force oracle."""

    def test_pallas_geometry_invariants(self):
        from dirjax.ops.pq import _pallas_geometry

        # legacy single-slice geometries untouched (r3-measured)
        assert _pallas_geometry(512, 32, 256, 2) == (1024, 1)
        assert _pallas_geometry(1024, 64, 256, 2) == (512, 1)
        for mk, m, nq, db in ((8192, 32, 256, 2), (8192, 32, 256, 4),
                              (16384, 64, 256, 2), (2048, 8, 64, 2)):
            tile, groups = _pallas_geometry(mk, m, nq, db)
            assert m % groups == 0, (mk, m, groups)
            g = mk // groups
            assert g % (mk // m) == 0, "slices must be ksub-aligned"
            assert g <= 512
            # conservative VMEM estimate honored (the wedge guard)
            est = mk * nq * db + m * mk * 2 \
                + tile * (m + 4 * g + db * g + 4 * nq)
            assert est <= 12 << 20, (mk, m, nq, db, est)
        # when nothing fits the budget the sentinel tells callers to
        # take the XLA scan instead of compiling an over-VMEM kernel
        tile, _ = _pallas_geometry(8192, 32, 2048, 4)
        assert tile == 0

    def test_ksub256_matches_xla_and_oracle(self):
        rng = np.random.default_rng(11)
        m, ksub, n, nq, k = 8, 256, 6000, 8, 10
        dim = 64
        cb = jnp.asarray(rng.normal(size=(m, ksub, dim // m)), jnp.float32)
        codes = jnp.asarray(rng.integers(0, ksub, size=(n, m)), jnp.uint8)
        q = jnp.asarray(rng.normal(size=(nq, dim)), jnp.float32)
        luts = pq_lookup(q, cb)
        for dt in (None, jnp.bfloat16):
            v1, i1 = pq_topk(luts, codes, k, compute_dtype=dt,
                             use_pallas=True, chunk=1000)
            v0, i0 = pq_topk(luts, codes, k, compute_dtype=dt,
                             use_pallas=False, chunk=1000)
            np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
            np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                                       rtol=1e-6, atol=1e-5)
        oh = np.eye(ksub, dtype=np.float64)[np.asarray(codes)]
        s = np.einsum("nmk,qmk->qn", oh, np.asarray(luts, np.float64))
        top = np.argsort(-s, axis=1)[:, :k]
        v1, i1 = pq_topk(luts, codes, k, use_pallas=True, chunk=1000)
        for a, b in zip(np.asarray(i1), top):
            assert set(a) == set(b)


class TestOPQ:
    def test_rotation_orthogonal_and_better(self, rng):
        # anisotropic data: energy front-loaded like whitened descriptors
        scales = np.exp(-np.arange(32) / 6.0)
        x = (rng.normal(size=(500, 32)) * scales).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        r, cb_opq = train_opq(x, m=4, ksub=16, iters=10, opq_iters=4)
        np.testing.assert_allclose(np.asarray(r @ r.T), np.eye(32),
                                   atol=1e-4)
        cb_pq = train_pq(x, m=4, ksub=16, iters=10)
        err_pq = float(jnp.mean(jnp.sum(
            (x - reconstruct_pq(encode_pq(x, cb_pq), cb_pq)) ** 2, 1)))
        xr = x @ np.asarray(r)
        err_opq = float(jnp.mean(jnp.sum(
            (xr - reconstruct_pq(encode_pq(xr, cb_opq), cb_opq)) ** 2, 1)))
        assert err_opq <= err_pq * 1.05, (err_opq, err_pq)


class TestPQIndex:
    def test_search_shapes_and_recall(self, clustered):
        db, q = clustered
        index = PQIndex(db, m=8, ksub=32,
                        keys=[f"img{i}" for i in range(len(db))])
        vals, idxs = index.search(q, k=5)
        assert vals.shape == (8, 5) and idxs.shape == (8, 5)
        assert index.lookup(idxs)[0][0] == f"img{int(idxs[0, 0])}"
        exact = (-(q @ db.T)).argsort(axis=1)[:, :5]
        rec = np.mean([len(set(map(int, a)) & set(map(int, b))) / 5.0
                       for a, b in zip(idxs, exact)])
        assert rec >= 0.15, rec  # far above chance (5/600); exact-order
        # quality is covered by test_rerank_recovers_exact_order

    def test_rerank_recovers_exact_order(self, clustered):
        db, q = clustered
        plain = PQIndex(db, m=8, ksub=32, seed=1)
        rer = PQIndex(db, m=8, ksub=32, seed=1, rerank=True)
        exact = (-(q @ db.T)).argsort(axis=1)[:, :5]
        _, idxs = rer.search(q, k=5, rerank_factor=8)
        _, raw = plain.search(q, k=5)
        hit = lambda got: np.mean([  # noqa: E731
            len(set(map(int, a)) & set(map(int, b))) / 5.0
            for a, b in zip(got, exact)])
        assert hit(idxs) >= hit(raw)
        assert hit(idxs) >= 0.8, hit(idxs)

    def test_save_load_roundtrip_and_dispatch(self, clustered, tmp_path):
        db, q = clustered
        index = PQIndex(db, m=4, ksub=16, keys=[str(i) for i in
                                                range(len(db))],
                        opq=True, rerank=True)
        p = str(tmp_path / "pq.npz")
        index.save(p)
        for loaded in (PQIndex.load(p), RetrievalIndex.load(p)):
            assert isinstance(loaded, PQIndex)
            np.testing.assert_array_equal(loaded.search(q, 4)[1],
                                          index.search(q, 4)[1])
            assert loaded.keys[:2] == ["0", "1"]

    def test_add_then_search_finds_new_rows(self, clustered):
        db, q = clustered
        index = PQIndex(db[:500], m=4, ksub=16,
                        keys=[str(i) for i in range(500)])
        index.add(db[500:], keys=[str(i) for i in range(500, 600)])
        assert index.n == 600
        vals, idxs = index.search(q, k=600)
        assert int(np.max(idxs)) >= 500  # late rows reachable

    def test_aqe_runs_and_changes_ranking(self, clustered):
        db, q = clustered
        index = PQIndex(db, m=8, ksub=32)
        plain = index.search(q, k=5)[1]
        with_aqe = index.search(q, k=5, aqe={"k": 3, "alpha": 3})[1]
        assert with_aqe.shape == plain.shape

    def test_single_query_vector(self, clustered):
        db, q = clustered
        index = PQIndex(db, m=4, ksub=16)
        vals, idxs = index.search(q[0], k=3)
        assert vals.shape == (1, 3)


class TestShardedPQ:
    def test_mesh_matches_single_device(self, clustered):
        db, q = clustered
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        single = PQIndex(db, m=4, ksub=16, seed=2)
        shard = PQIndex(db, m=4, ksub=16, seed=2, mesh=mesh)
        sv, si = single.search(q, k=7)
        mv, mi = shard.search(q, k=7)
        np.testing.assert_allclose(sv, mv, atol=1e-5)
        # ties may permute across the shard merge: compare via scores
        luts = pq_lookup(q, single.codebooks)
        dense = np.asarray(pq_scores(luts, single._codes))
        np.testing.assert_allclose(
            np.take_along_axis(dense, mi, axis=1), sv, atol=1e-5)

    def test_mesh_ragged_rows(self, clustered):
        db, q = clustered
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        shard = PQIndex(db[:597], m=4, ksub=16, seed=2, mesh=mesh)
        vals, idxs = shard.search(q, k=5)
        assert int(np.max(idxs)) < 597


class TestCLI:
    def test_build_query_pq(self, clustered, tmp_path):
        db, q = clustered
        from dirjax.cli.index import main
        np.save(tmp_path / "db.npy", db)
        np.save(tmp_path / "q.npy", q)
        keys = tmp_path / "keys.txt"
        keys.write_text("".join(f"img{i}\n" for i in range(len(db))))
        out = str(tmp_path / "pq.npz")
        main(["build", "--descs", str(tmp_path / "db.npy"),
              "--keys", str(keys), "--pq", "4", "--pq-rerank",
              "--out", out, "--gpu", "-1"])
        res = main(["query", "--index", out,
                    "--descs", str(tmp_path / "q.npy"), "-k", "3",
                    "--gpu", "-1"])
        assert len(res["keys"]) == len(q)
        assert all(len(row) >= 3 for row in res["indices"])

    def test_int8_queries_rejected_on_pq(self, clustered, tmp_path):
        db, q = clustered
        from dirjax.cli.index import main
        np.save(tmp_path / "db.npy", db)
        np.save(tmp_path / "q.npy", q)
        out = str(tmp_path / "pq.npz")
        main(["build", "--descs", str(tmp_path / "db.npy"),
              "--pq", "4", "--out", out, "--gpu", "-1"])
        with pytest.raises(SystemExit):
            main(["query", "--index", out, "--descs",
                  str(tmp_path / "q.npy"), "--int8-queries", "--gpu", "-1"])
