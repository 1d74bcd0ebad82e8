"""Deletion support (tombstones + compact) across all three index
classes. The contract under test: after ``remove()``, searches are EXACT
over the surviving rows (identical to an index built without them, up to
each class's own approximation), removed rows are never returned,
tombstones survive save/load, and ``compact()`` renumbers with a correct
old->new mapping."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.parallel import make_mesh
from dirjax.serving import IVFPQIndex, PQIndex, RetrievalIndex


@pytest.fixture
def corpus(rng):
    db = rng.normal(size=(200, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return db, q


def exact_topk(q, db, k, keep=None):
    """Oracle: top-k over the kept rows, reported in ORIGINAL indices."""
    s = q @ db.T
    if keep is not None:
        s = s.copy()
        s[:, ~keep] = -np.inf
    return (-s).argsort(axis=1)[:, :k]


class TestRetrievalIndexRemove:
    def test_removed_rows_never_returned(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db)
        # remove the top hit of every query: results must re-rank exactly
        top1 = exact_topk(q, db, 1)[:, 0]
        assert index.remove(indices=top1) == len(set(top1.tolist()))
        keep = np.ones(len(db), bool)
        keep[top1] = False
        vals, idxs = index.search(q, k=7)
        np.testing.assert_array_equal(idxs, exact_topk(q, db, 7, keep))
        assert not np.isin(idxs, top1).any()
        # scores are the true dot products of the surviving hits
        np.testing.assert_allclose(
            vals, np.take_along_axis(q @ db.T, idxs, axis=1), atol=1e-5)

    def test_remove_by_key_and_validation(self, corpus):
        db, q = corpus
        keys = [f"img{i}" for i in range(len(db))]
        index = RetrievalIndex(db, keys=keys)
        assert index.remove(keys=["img3", "img7"]) == 2
        assert index.remove(indices=[3]) == 0          # already tombstoned
        assert index.n_removed == 2
        idxs = index.search(q, k=10)[1]
        assert not np.isin(idxs, [3, 7]).any()
        with pytest.raises(KeyError, match="imgX"):
            index.remove(keys=["imgX"])
        with pytest.raises(IndexError):
            index.remove(indices=[len(db)])
        with pytest.raises(ValueError, match="exactly one"):
            index.remove()
        keyless = RetrievalIndex(db)
        with pytest.raises(ValueError, match="no keys"):
            keyless.remove(keys=["img0"])

    def test_int8_remove(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db, dtype=jnp.int8)
        clean = RetrievalIndex(db, dtype=jnp.int8)
        rm = np.arange(0, 40)
        index.remove(indices=rm)
        vals, idxs = index.search(q, k=5)
        assert not np.isin(idxs, rm).any()
        # int8 ranking noise aside, must match the same int8 index's own
        # ranking restricted to the kept rows
        v_all, i_all = clean.search(q, k=45)
        for qi in range(len(q)):
            kept = [j for j in i_all[qi] if j >= 40][:5]
            np.testing.assert_array_equal(idxs[qi], kept)

    def test_mesh_remove(self, corpus):
        db, q = corpus
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        index = RetrievalIndex(db, mesh=mesh)
        rm = np.array([0, 5, 190, 199])
        index.remove(indices=rm)
        keep = np.ones(len(db), bool)
        keep[rm] = False
        idxs = index.search(q, k=6)[1]
        np.testing.assert_array_equal(idxs, exact_topk(q, db, 6, keep))

    def test_save_load_keeps_tombstones(self, corpus, tmp_path):
        db, q = corpus
        path = str(tmp_path / "idx.npz")
        index = RetrievalIndex(db, keys=[f"i{i}" for i in range(len(db))])
        index.remove(indices=[1, 2, 3])
        index.save(path)
        back = RetrievalIndex.load(path)
        assert back.n_removed == 3
        assert not np.isin(back.search(q, k=8)[1], [1, 2, 3]).any()

    def test_save_load_keeps_tombstones_int8(self, corpus, tmp_path):
        db, q = corpus
        path = str(tmp_path / "idx8.npz")
        index = RetrievalIndex(db, dtype=jnp.int8)
        index.remove(indices=[0, 199])
        index.save(path)
        back = RetrievalIndex.load(path)
        assert back.dtype == jnp.int8 and back.n_removed == 2
        assert not np.isin(back.search(q, k=8)[1], [0, 199]).any()

    def test_compact_renumbers(self, corpus):
        db, q = corpus
        keys = [f"img{i}" for i in range(len(db))]
        index = RetrievalIndex(db, keys=keys)
        rm = np.array([0, 10, 20])
        index.remove(indices=rm)
        before_keys = index.lookup(index.search(q, k=7)[1])
        mapping = index.compact()
        assert index.n == len(db) - 3 and index.n_removed == 0
        assert (mapping[rm] == -1).all()
        kept = np.setdiff1d(np.arange(len(db)), rm)
        np.testing.assert_array_equal(mapping[kept],
                                      np.arange(len(kept)))
        # identical results, now expressed in the renumbered space
        vals, idxs = index.search(q, k=7)
        assert index.lookup(idxs) == before_keys
        np.testing.assert_array_equal(
            idxs, exact_topk(q, db[kept], 7))

    def test_k_over_n_contract_survives_remove(self, corpus):
        # the clean kernel path raises on k > n; tombstoning a row must
        # not silently change that into shape-truncated results
        db, q = corpus
        index = RetrievalIndex(db)
        with pytest.raises(ValueError, match="exceeds"):
            index.search(q, k=len(db) + 1)
        index.remove(indices=[0])
        with pytest.raises(ValueError, match="exceeds"):
            index.search(q, k=len(db) + 1)

    def test_lookup_sentinel_maps_to_none(self, corpus):
        # when fewer than k live rows survive, idxs pad with -1; lookup
        # must return None there, never keys[-1] (the last image)
        db, q = corpus
        keys = [f"img{i}" for i in range(len(db))]
        index = RetrievalIndex(db, keys=keys)
        index.remove(indices=np.arange(len(db) - 3))     # 3 live rows
        vals, idxs = index.search(q, k=8)
        assert (idxs[:, 3:] == -1).all() and (idxs[:, :3] >= 0).all()
        names = index.lookup(idxs)
        for row, irow in zip(names, idxs):
            assert row[3:] == [None] * 5
            assert row[:3] == [f"img{j}" for j in irow[:3]]
            assert keys[-1] not in row[3:]

    def test_cli_remove_rejects_both_selectors(self, corpus, tmp_path):
        import numpy as np

        from dirjax.cli.index import main
        db, _ = corpus
        descs = str(tmp_path / "d.npy")
        keysf = str(tmp_path / "k.txt")
        np.save(descs, db)
        open(keysf, "w").write("\n".join(f"i{i}" for i in range(len(db))))
        out = str(tmp_path / "i.npz")
        main(["build", "--descs", descs, "--keys", keysf,
              "--out", out, "--gpu", "-1"])
        with pytest.raises(SystemExit, match="not both"):
            main(["remove", "--index", out, "--keys", keysf,
                  "--indices", "1", "--gpu", "-1"])

    def test_add_after_remove(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db)
        index.remove(indices=[0])
        extra = -db[:1]                     # anti-correlated row
        index.add(extra)
        assert index.n == len(db) + 1 and index.n_removed == 1
        keep = np.ones(len(db) + 1, bool)
        keep[0] = False
        full = np.concatenate([db, extra])
        idxs = index.search(q, k=4)[1]
        np.testing.assert_array_equal(idxs, exact_topk(q, full, 4, keep))


class TestPQRemove:
    def _clustered(self, rng, n=160, d=32):
        centers = rng.normal(size=(8, d)).astype(np.float32)
        db = (centers[np.arange(n) % 8]
              + 0.05 * rng.normal(size=(n, d))).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        return db

    def test_pq_removed_never_returned(self, rng):
        db = self._clustered(rng)
        q = db[:4] + 0.01 * rng.normal(size=(4, db.shape[1])).astype(np.float32)
        index = PQIndex(db, m=8, ksub=16, sample=None)
        base = index.search(q, k=10)[1]
        rm = np.unique(base[:, 0])
        index.remove(indices=rm)
        idxs = index.search(q, k=10)[1]
        assert not np.isin(idxs, rm).any()
        # surviving results == the clean index's ranking minus removed
        for qi in range(len(q)):
            want = [j for j in index.search(q, k=10 + len(rm))[1][qi]
                    if j not in set(rm.tolist())][:10]
            assert idxs[qi].tolist()[: len(want)] == want

    def test_pq_rerank_remove_roundtrip(self, rng, tmp_path):
        db = self._clustered(rng)
        q = db[8:12]
        index = PQIndex(db, m=8, ksub=16, rerank=True, sample=None,
                        keys=[f"k{i}" for i in range(len(db))])
        index.remove(keys=["k8", "k9", "k10", "k11"])
        idxs = index.search(q, k=5)[1]
        assert not np.isin(idxs, [8, 9, 10, 11]).any()
        path = str(tmp_path / "pq.npz")
        index.save(path)
        back = RetrievalIndex.load(path)       # auto-dispatch
        assert isinstance(back, PQIndex) and back.n_removed == 4
        assert not np.isin(back.search(q, k=5)[1], [8, 9, 10, 11]).any()
        mapping = back.compact()
        assert back.n == len(db) - 4
        assert back.lookup(back.search(q, k=3)[1])[0][0].startswith("k")
        assert (mapping[[8, 9, 10, 11]] == -1).all()

    def test_pq_mesh_remove_and_compact(self, rng):
        db = self._clustered(rng)
        q = db[:4]
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        index = PQIndex(db, m=8, ksub=16, sample=None, mesh=mesh)
        single = PQIndex.__new__(PQIndex)   # same codebooks, no mesh
        single.__dict__.update(
            {k: v for k, v in index.__dict__.items()
             if k not in ("_codes", "_n_valid", "mesh")})
        single.mesh = None
        single._codes = jnp.asarray(np.asarray(index._codes[: index.n]))
        rm = np.array([0, 9, 17, 150])
        index.remove(indices=rm)
        single.remove(indices=rm)
        np.testing.assert_array_equal(index.search(q, k=6)[1],
                                      single.search(q, k=6)[1])
        index.compact()
        single.compact()
        assert index.n == single.n == len(db) - 4
        np.testing.assert_array_equal(index.search(q, k=6)[1],
                                      single.search(q, k=6)[1])

    def test_ivf_remove_and_compact(self, rng, tmp_path):
        db = self._clustered(rng, n=192)
        q = db[:4]
        index = IVFPQIndex(db, nlist=8, m=8, ksub=16, nprobe=8,
                           sample=None, slab=8)
        rm = index.search(q, k=1)[1][:, 0]
        index.remove(indices=rm)
        idxs = index.search(q, k=6)[1]
        assert not np.isin(idxs, rm).any()
        path = str(tmp_path / "ivf.npz")
        index.save(path)
        back = RetrievalIndex.load(path)
        assert isinstance(back, IVFPQIndex)
        assert back.n_removed == len(np.unique(rm))
        assert not np.isin(back.search(q, k=6)[1], rm).any()
        back.compact()
        assert back.n == len(db) - len(np.unique(rm))
        assert back.n_removed == 0
        # post-compact search still avoids the deleted vectors' content:
        # each query's old nearest neighbor is gone, results stay valid
        v2, i2 = back.search(q, k=6)
        assert (i2 >= 0).all() and (i2 < back.n).all()


class TestAQETombstoneInvisibility:
    """r5: tombstoned rows must not STEER query expansion either — the
    expansion neighbor set over-fetches and filters against the device
    tombstone mask, so a search with aqe on a tombstoned index equals the
    same search after compact() (same codecs, rows physically dropped)."""

    AQE = {"k": 5, "alpha": 3.0}

    def _assert_tomb_equals_compact(self, index, q, k=7, **opts):
        v1, i1 = index.search(q, k=k, **opts)
        mapping = index.compact()
        v2, i2 = index.search(q, k=k, **opts)
        np.testing.assert_allclose(v1, v2, rtol=2e-5, atol=2e-6)
        np.testing.assert_array_equal(
            np.where(i1 >= 0, mapping[np.maximum(i1, 0)], -1), i2)

    def test_fp32_dense(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db)
        # remove each query's strongest expansion neighbor: if the
        # tombstone leaked into the expansion, scores would differ
        index.remove(indices=exact_topk(q, db, 1)[:, 0])
        self._assert_tomb_equals_compact(index, q, aqe=self.AQE)

    def test_int8(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db, dtype=jnp.int8)
        index.remove(indices=exact_topk(q, db, 1)[:, 0])
        self._assert_tomb_equals_compact(index, q, aqe=self.AQE)

    def test_mesh(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db, mesh=make_mesh(data=1, db=8,
                                                  devices=jax.devices()[:8]))
        index.remove(indices=exact_topk(q, db, 1)[:, 0])
        self._assert_tomb_equals_compact(index, q, aqe=self.AQE)

    def test_pq(self, corpus, rng):
        db, q = corpus
        index = PQIndex(db, m=8, ksub=16, seed=0, train_iters=4)
        index.remove(indices=rng.choice(len(db), 9, replace=False))
        self._assert_tomb_equals_compact(index, q, aqe=self.AQE)

    def test_ivf(self, corpus, rng):
        db, q = corpus
        index = IVFPQIndex(db, nlist=8, m=8, ksub=16, nprobe=8, seed=0,
                           train_iters=4)
        index.remove(indices=rng.choice(len(db), 9, replace=False))
        self._assert_tomb_equals_compact(index, q, aqe=self.AQE)

    def test_fp32_dense_differs_from_leaky_expansion(self, corpus):
        """The pre-r5 behavior (expansion over ALL rows) must NOT match:
        guards against the filter silently becoming a no-op."""
        db, q = corpus
        index = RetrievalIndex(db)
        leaky_v, _ = index.search(q, k=7, aqe=self.AQE)
        index.remove(indices=exact_topk(q, db, 1)[:, 0])
        clean_v, _ = index.search(q, k=7, aqe=self.AQE)
        assert not np.allclose(leaky_v, clean_v)
