"""IVF-ADC tier: build invariants, full-probe exactness, partial-probe
recall, and the streamed-vs-in-memory build equivalence.

Reference scope note: the reference toolbox has no approximate search at
all (ranking is one dense matmul, dirtorch/utils/common.py:30-38); these
tests define the subsystem's own contract, anchored on dense ADC over
reconstructions as the oracle.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dirjax.ops.ivf import (IVFArrays, bin_ivf, build_ivf, ivf_assign,
                            ivf_topk, train_ivf)
from dirjax.ops.pq import encode_pq, pq_lookup


def _dense_reference(q, centroids, assign, codes, luts):
    """Oracle: q . centroid[cell(i)] + sum_m luts[q, m, codes[i, m]]."""
    bias = (np.asarray(q, np.float32)
            @ np.asarray(centroids, np.float32).T)        # (nq, nlist)
    luts = np.asarray(luts)
    codes = np.asarray(codes)
    nq, n = luts.shape[0], codes.shape[0]
    adc = np.zeros((nq, n), np.float32)
    for mi in range(codes.shape[1]):
        adc += luts[:, mi, :][:, codes[:, mi]]
    return bias[:, np.asarray(assign)] + adc


def _make(n=700, d=32, nlist=6, m=4, ksub=8, seed=0, clustered=False):
    rng = np.random.default_rng(seed)
    if clustered:
        centers = rng.standard_normal((nlist, d)).astype(np.float32)
        pick = rng.integers(0, nlist, n)
        x = centers[pick] + 0.15 * rng.standard_normal((n, d))
    else:
        x = rng.standard_normal((n, d))
    x = x.astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ivf, centroids, codebooks = build_ivf(
        x, nlist, m, ksub, slab=16, coarse_iters=8, pq_iters=6,
        seed=seed, sample=None)
    return x, ivf, centroids, codebooks


def test_build_invariants():
    x, ivf, centroids, codebooks = _make()
    n = x.shape[0]
    rows = np.asarray(ivf.slab_rows)
    flat = rows[rows >= 0]
    # every row stored exactly once
    assert sorted(flat.tolist()) == list(range(n))
    # every slab owned by exactly one virtual cell
    tab = np.asarray(ivf.vlist_tab)
    owned = tab[tab >= 0]
    assert sorted(owned.tolist()) == list(range(rows.shape[0]))
    # stored codes are the residual encodings
    assign = ivf_assign(x, centroids)
    res = x - np.asarray(centroids)[assign]
    want = np.asarray(encode_pq(res, codebooks))
    codes = np.asarray(ivf.codes)
    for s in range(rows.shape[0]):
        for r in range(rows.shape[1]):
            if rows[s, r] >= 0:
                assert (codes[s, r] == want[rows[s, r]]).all()
    # sibling virtual cells repeat their centroid
    cv = np.asarray(ivf.centroids_v)
    adj = np.asarray(ivf.probe_adjust)
    np.testing.assert_allclose(adj, -0.5 * np.sum(cv * cv, axis=1),
                               rtol=1e-6)


def test_full_probe_matches_dense_adc():
    x, ivf, centroids, codebooks = _make()
    rng = np.random.default_rng(1)
    q = rng.standard_normal((5, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    luts = pq_lookup(q, codebooks)
    k = 12
    vals, idxs = ivf_topk(luts, q, ivf, k, nprobe=ivf.nvlist)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    assign = ivf_assign(x, centroids)
    res = x - np.asarray(centroids)[assign]
    codes = np.asarray(encode_pq(res, codebooks))
    dense = _dense_reference(q, centroids, assign, codes, luts)
    want = np.sort(dense, axis=1)[:, ::-1][:, :k]
    np.testing.assert_allclose(vals, want, atol=2e-4)
    picked = np.take_along_axis(dense, idxs, axis=1)
    np.testing.assert_allclose(vals, picked, atol=2e-4)
    assert np.all((0 <= idxs) & (idxs < x.shape[0]))
    for row in idxs:                      # no duplicate results per query
        assert len(set(row.tolist())) == len(row)


def test_partial_probe_recall_on_clustered_data():
    x, ivf, centroids, codebooks = _make(n=900, nlist=8, clustered=True,
                                         seed=3)
    rng = np.random.default_rng(4)
    q = x[rng.integers(0, len(x), 6)] + 0.02 * rng.standard_normal(
        (6, x.shape[1])).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    luts = pq_lookup(q, codebooks)
    k = 10
    assign = ivf_assign(x, centroids)
    res = x - np.asarray(centroids)[assign]
    codes = np.asarray(encode_pq(res, codebooks))
    dense = _dense_reference(q, centroids, assign, codes, luts)
    exact = np.argsort(dense, axis=1)[:, ::-1][:, :k]
    _, idxs = ivf_topk(luts, q, ivf, k, nprobe=3)
    idxs = np.asarray(idxs)
    recall = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                      for a, b in zip(idxs, exact)])
    assert recall >= 0.5, recall          # 3/8+ cells on tight clusters
    # full probe recovers everything
    _, idxs_full = ivf_topk(luts, q, ivf, k, nprobe=ivf.nvlist)
    recall_full = np.mean([len(set(a.tolist()) & set(b.tolist())) / k
                           for a, b in zip(np.asarray(idxs_full), exact)])
    assert recall_full == 1.0


def test_union_matches_perquery_at_full_probe():
    x, ivf, centroids, codebooks = _make(seed=41)
    rng = np.random.default_rng(42)
    q = rng.standard_normal((6, x.shape[1])).astype(np.float32)
    luts = pq_lookup(q, codebooks)
    v_u, i_u = ivf_topk(luts, q, ivf, 11, nprobe=ivf.nvlist, union=True)
    v_p, i_p = ivf_topk(luts, q, ivf, 11, nprobe=ivf.nvlist, union=False)
    np.testing.assert_array_equal(np.asarray(i_u), np.asarray(i_p))
    np.testing.assert_allclose(np.asarray(v_u), np.asarray(v_p), atol=2e-4)


def test_union_dedup_no_duplicate_results():
    x, ivf, centroids, codebooks = _make(seed=43)
    # identical queries maximize duplicate probes across the batch
    q = np.repeat(x[:1], 8, axis=0)
    luts = pq_lookup(q, codebooks)
    _, idxs = ivf_topk(luts, q, ivf, 20, nprobe=3, union=True)
    for row in np.asarray(idxs):
        real = [i for i in row.tolist() if i >= 0]
        assert len(set(real)) == len(real), row


def test_ivf_assign_empty_batch():
    import jax.numpy as jnp

    from dirjax.ops.ivf import ivf_assign
    cents = np.eye(4, dtype=np.float32)
    out = ivf_assign(np.zeros((0, 4), np.float32), cents)
    assert out.shape == (0,)


def test_union_recall_superset_of_perquery():
    x, ivf, centroids, codebooks = _make(n=900, nlist=8, clustered=True,
                                         seed=45)
    rng = np.random.default_rng(46)
    q = x[rng.integers(0, len(x), 8)]
    luts = pq_lookup(q, codebooks)
    assign = ivf_assign(x, centroids)
    res = x - np.asarray(centroids)[assign]
    codes = np.asarray(encode_pq(res, codebooks))
    dense = _dense_reference(q, centroids, assign, codes, luts)
    exact = np.argsort(dense, axis=1)[:, ::-1][:, :10]

    def recall(idxs):
        return np.mean([len(set(a.tolist()) & set(b.tolist())) / 10
                        for a, b in zip(np.asarray(idxs), exact)])

    _, i_u = ivf_topk(luts, q, ivf, 10, nprobe=2, union=True)
    _, i_p = ivf_topk(luts, q, ivf, 10, nprobe=2, union=False)
    assert recall(i_u) >= recall(i_p) - 1e-9  # union sees >= the cells


def test_sampled_codebook_training_serves():
    rng = np.random.default_rng(51)
    x = rng.standard_normal((600, 32)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    # sample < n exercises the device-side residual-sample branch
    ivf, centroids, codebooks = build_ivf(x, 5, 4, 8, slab=16,
                                          coarse_iters=5, pq_iters=5,
                                          sample=200)
    q = x[:8]
    luts = pq_lookup(q, codebooks)
    _, idxs = ivf_topk(luts, q, ivf, 5, nprobe=ivf.nvlist)
    idxs = np.asarray(idxs)
    assert ((idxs >= 0) & (idxs < 600)).all()
    # codebooks trained on a sample still encode every row: stored codes
    # must equal a direct re-encode of the residuals
    assign = ivf_assign(x, centroids)
    want = np.asarray(encode_pq(
        x - np.asarray(centroids)[assign], codebooks))
    rows = np.asarray(ivf.slab_rows)
    codes = np.asarray(ivf.codes)
    valid = rows >= 0
    assert (codes[valid] == want[rows[valid]]).all()


def test_k_past_corpus_pads():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((40, 16)).astype(np.float32)
    ivf, centroids, codebooks = build_ivf(x, 2, 4, 8, slab=16,
                                          coarse_iters=4, pq_iters=4,
                                          sample=None)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    luts = pq_lookup(q, codebooks)
    vals, idxs = ivf_topk(luts, q, ivf, 64, nprobe=4)
    vals, idxs = np.asarray(vals), np.asarray(idxs)
    assert vals.shape == (3, 64) and idxs.shape == (3, 64)
    assert (idxs[:, :40] >= 0).all()
    assert (idxs[:, 40:] == -1).all()
    assert np.isneginf(vals[:, 40:]).all()


def test_streamed_build_matches_in_memory():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((500, 24)).astype(np.float32)
    ivf_a, centroids, codebooks = build_ivf(
        x, 5, 4, 8, slab=16, cap=3, coarse_iters=6, pq_iters=5,
        sample=None)
    # the streaming recipe: assign + residual-encode chunk-wise, then bin
    assign = np.concatenate([
        ivf_assign(x[s: s + 128], centroids) for s in range(0, 500, 128)])
    codes = np.concatenate([
        np.asarray(encode_pq(
            x[s: s + 128] - np.asarray(centroids)[assign[s: s + 128]],
            codebooks))
        for s in range(0, 500, 128)])
    ivf_b = bin_ivf(assign, codes, centroids, slab=16, cap=3)
    for a, b in zip(ivf_a, ivf_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestIVFPQIndex:
    """Serving wrapper: search/keys/add/save/load + CLI loop."""

    def _data(self, n=600, d=32, seed=21):
        rng = np.random.default_rng(seed)
        x = rng.standard_normal((n, d)).astype(np.float32)
        x /= np.linalg.norm(x, axis=1, keepdims=True)
        return x

    def _index(self, x, **kw):
        from dirjax.serving import IVFPQIndex

        kw.setdefault("train_iters", 5)
        kw.setdefault("sample", None)
        return IVFPQIndex(x, nlist=6, m=4, ksub=8, nprobe=3, **kw)

    def test_self_retrieval_full_probe(self):
        x = self._data()
        idx = self._index(x, keys=[f"im{i}" for i in range(len(x))])
        vals, ids = idx.search(x[:5], k=3, nprobe=idx._ivf.nvlist)
        # PQ is lossy, so ask only that the true row ranks in the top 3
        ids = np.asarray(ids)
        assert all(i in row for i, row in enumerate(ids))
        keys = idx.lookup(ids)
        assert keys[0][list(ids[0]).index(0)] == "im0"
        assert vals.shape == (5, 3)

    def test_nprobe_recall_knob(self):
        x = self._data()
        idx = self._index(x)
        _, full = idx.search(x[:8], k=5, nprobe=idx._ivf.nvlist)
        _, part = idx.search(x[:8], k=5, nprobe=2)
        overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 5
                           for a, b in zip(np.asarray(part),
                                           np.asarray(full))])
        assert 0.3 <= overlap <= 1.0   # partial probe is a subset search

    def test_rerank_exactifies(self):
        x = self._data()
        idx = self._index(x, rerank=True)
        vals, ids = idx.search(x[:4], k=3, nprobe=idx._ivf.nvlist)
        # int8 rescore of the shortlist: top-1 = the row itself, and the
        # returned score is the (near-)exact dot, not the ADC estimate
        assert [row[0] for row in np.asarray(ids)] == [0, 1, 2, 3]
        np.testing.assert_allclose(np.asarray(vals)[:, 0], 1.0, atol=0.05)

    def test_save_load_roundtrip(self, tmp_path):
        from dirjax.serving import IVFPQIndex, RetrievalIndex

        x = self._data()
        idx = self._index(x, keys=[f"im{i}" for i in range(len(x))],
                          opq=True)
        p = str(tmp_path / "ivf.npz")
        idx.save(p)
        # the universal loader dispatches on the archive contents
        idx2 = RetrievalIndex.load(p)
        assert isinstance(idx2, IVFPQIndex)
        assert idx2.n == idx.n and idx2.keys == idx.keys
        v1, i1 = idx.search(x[:6], k=4)
        v2, i2 = idx2.search(x[:6], k=4)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   atol=1e-5)

    def test_add_then_find_new_rows(self):
        x = self._data()
        idx = self._index(x[:500], keys=[f"im{i}" for i in range(500)])
        idx.add(x[500:], keys=[f"im{i}" for i in range(500, len(x))])
        assert idx.n == len(x)
        _, ids = idx.search(x[500:504], k=3, nprobe=idx._ivf.nvlist)
        assert [row[0] for row in np.asarray(ids)] == [500, 501, 502, 503]

    def test_cli_ivf_build_query(self, tmp_path):
        import json

        from dirjax.cli.index import main

        x = self._data(n=300)
        dp = str(tmp_path / "f.dbdescs.npy")
        qp = str(tmp_path / "f.qdescs.npy")
        np.save(dp, x)
        np.save(qp, x[:4])
        ip = str(tmp_path / "ivf.npz")
        main(["build", "--descs", dp, "--ivf", "4", "--pq", "4",
              "--pq-ksub", "8", "--nprobe", "4", "--out", ip,
              "--gpu", "-1"])
        oj = str(tmp_path / "hits.json")
        main(["query", "--index", ip, "--descs", qp, "-k", "3",
              "--nprobe", "4", "--out-json", oj, "--gpu", "-1"])
        res = json.load(open(oj))
        assert [row[0] for row in res["indices"]] == [0, 1, 2, 3]

    def test_cli_ivf_aqe_query(self, tmp_path):
        from dirjax.cli.index import main

        x = self._data(n=200)
        dp = str(tmp_path / "g.dbdescs.npy")
        qp = str(tmp_path / "g.qdescs.npy")
        np.save(dp, x)
        np.save(qp, x[:4])
        ip = str(tmp_path / "g.npz")
        main(["build", "--descs", dp, "--ivf", "4", "--pq", "4",
              "--pq-ksub", "8", "--out", ip, "--gpu", "-1"])
        out = main(["query", "--index", ip, "--descs", qp, "-k", "3",
                    "--nprobe", "4", "--aqe", "4", "3", "--gpu", "-1"])
        # expansion mixes the query with its reconstructed neighbors;
        # the self-row (weight ~1 at alpha=3) must still rank first
        assert [row[0] for row in out["indices"]] == [0, 1, 2, 3]

    def test_aqe_matches_manual_expansion(self):
        """search(aqe=...) == reconstruct-expand-renormalize done by hand
        on the host, then searched plainly — pins the exact semantics
        (IVF reconstructions as neighbors, vals**alpha weights, /(k+1),
        L2 renorm), including the OPQ un-rotation of reconstructions."""
        from dirjax.ops.ivf import ivf_topk, unbin_ivf
        from dirjax.ops.pq import pq_lookup, reconstruct_pq

        x = self._data()
        idx = self._index(x, opq=True)
        q = x[:4]
        kq, alpha = 5, 3.0
        full = idx._ivf.nvlist
        va, ia = idx.search(q, k=4, nprobe=full,
                            aqe={"k": kq, "alpha": alpha})

        qr = np.asarray(idx._rotate(jnp.asarray(q)))
        vals, nbrs = ivf_topk(pq_lookup(jnp.asarray(qr), idx.codebooks),
                              jnp.asarray(qr), idx._ivf, kq, nprobe=full)
        vals, nbrs = np.asarray(vals), np.asarray(nbrs)
        assign, codes = unbin_ivf(idx._ivf, idx.n)
        recon = np.asarray(reconstruct_pq(jnp.asarray(codes),
                                          idx.codebooks))
        recon = recon + np.asarray(idx._centroids)[assign]
        nb = recon[nbrs] @ np.asarray(idx.rotation).T   # back to input space
        w = np.sign(vals) ** int(alpha) * np.abs(vals) ** alpha
        exp = (q + np.einsum("nk,nkd->nd", w, nb)) / (kq + 1.0)
        exp /= np.linalg.norm(exp, axis=1, keepdims=True)
        vm, im = idx.search(exp.astype(np.float32), k=4, nprobe=full)

        np.testing.assert_array_equal(np.asarray(ia), np.asarray(im))
        np.testing.assert_allclose(np.asarray(va), np.asarray(vm),
                                   atol=1e-4)

    def test_aqe_never_returns_removed(self):
        x = self._data(n=300)
        idx = self._index(x)
        idx.remove(indices=[0, 1, 2])
        _, ids = idx.search(x[:5], k=4, nprobe=idx._ivf.nvlist,
                            aqe={"k": 3, "alpha": 1.0})
        assert not np.isin(np.asarray(ids), [0, 1, 2]).any()

    def test_aqe_cache_invalidated_by_add(self):
        x = self._data(n=400)
        idx = self._index(x[:300])
        # prime the unbin cache, then grow the index: the AQE path must
        # reconstruct against the REBINNED rows, not the stale cache
        idx.search(x[:2], k=2, aqe={"k": 2, "alpha": 1.0})
        assert idx._coding is not None
        idx.add(x[300:])
        assert idx._coding is None
        _, ids = idx.search(x[300:302], k=2, nprobe=idx._ivf.nvlist,
                            aqe={"k": 3, "alpha": 3.0})
        assert [row[0] for row in np.asarray(ids)] == [300, 301]


class TestShardedIVF:
    """Cell-sharded inverted file on the 8-device virtual mesh."""

    @pytest.fixture(scope="class")
    def mesh(self):
        import dirjax.parallel as par

        assert jax.device_count() >= 8, "conftest provides 8 devices"
        return par.make_mesh(data=1, db=4, devices=jax.devices()[:4])

    def test_full_probe_matches_single_chip(self, mesh):
        from dirjax.parallel.ranking import shard_ivf, sharded_ivf_topk

        x, ivf, centroids, codebooks = _make(n=800, nlist=8, seed=31)
        rng = np.random.default_rng(32)
        q = rng.standard_normal((5, x.shape[1])).astype(np.float32)
        luts = pq_lookup(q, codebooks)
        k = 15
        v1, i1 = ivf_topk(luts, q, ivf, k, nprobe=ivf.nvlist)
        sh = shard_ivf(ivf, mesh)
        # nprobe >= nvlist * ndev: every shard probes all its cells, so
        # the candidate set equals the single-chip full probe exactly
        v2, i2 = sharded_ivf_topk(luts, q, sh, k, mesh,
                                  nprobe=ivf.nvlist * 4)
        np.testing.assert_allclose(np.asarray(v2), np.asarray(v1),
                                   atol=2e-4)
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(i1))

    def test_shard_partition_covers_all_slabs(self, mesh):
        from dirjax.parallel.ranking import shard_ivf

        x, ivf, _, _ = _make(n=640, nlist=7, seed=33)
        sh = shard_ivf(ivf, mesh)
        rows = np.asarray(sh.slab_rows)
        flat = rows[rows >= 0]
        assert sorted(flat.tolist()) == list(range(len(x)))
        # every shard's local tab references only its own slab range
        tab = np.asarray(sh.vlist_tab)
        for d in range(tab.shape[0]):
            local = tab[d][tab[d] >= 0]
            assert local.max(initial=-1) < sh.codes.shape[1]

    def test_partial_probe_sane(self, mesh):
        from dirjax.parallel.ranking import shard_ivf, sharded_ivf_topk

        x, ivf, centroids, codebooks = _make(n=900, nlist=8,
                                             clustered=True, seed=35)
        q = x[:6]
        luts = pq_lookup(q, codebooks)
        sh = shard_ivf(ivf, mesh)
        vals, idxs = sharded_ivf_topk(luts, q, sh, 10, mesh, nprobe=8)
        idxs = np.asarray(idxs)
        assert ((idxs >= -1) & (idxs < len(x))).all()
        # local probing approximates the single-chip probe: heavy overlap
        _, i1 = ivf_topk(luts, q, ivf, 10, nprobe=8)
        overlap = np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(idxs, np.asarray(i1))])
        assert overlap >= 0.6, overlap


def test_bfloat16_compute_close():
    x, ivf, centroids, codebooks = _make(seed=13)
    rng = np.random.default_rng(14)
    q = rng.standard_normal((4, x.shape[1])).astype(np.float32)
    luts = pq_lookup(q, codebooks)
    v32, i32 = ivf_topk(luts, q, ivf, 10, nprobe=ivf.nvlist)
    vbf, ibf = ivf_topk(luts, q, ivf, 10, nprobe=ivf.nvlist,
                        compute_dtype=jnp.bfloat16)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(i32), np.asarray(ibf))])
    assert overlap >= 0.8, overlap
    np.testing.assert_allclose(np.asarray(vbf), np.asarray(v32),
                               rtol=0.03, atol=0.03)
