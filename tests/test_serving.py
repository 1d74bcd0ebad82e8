"""RetrievalIndex tests: single-device and mesh-sharded search, AQE, I/O."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.parallel import make_mesh
from dirjax.serving import RetrievalIndex


@pytest.fixture
def corpus(rng):
    db = rng.normal(size=(200, 64)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    q = rng.normal(size=(5, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return db, q


class TestSingleDevice:
    def test_search_exact(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db, keys=[f"img{i}" for i in range(len(db))])
        vals, idxs = index.search(q, k=7)
        want = (-(q @ db.T)).argsort(axis=1)[:, :7]
        np.testing.assert_array_equal(idxs, want)
        names = index.lookup(idxs)
        assert names[0][0] == f"img{want[0][0]}"

    def test_search_with_aqe(self, corpus):
        db, q = corpus
        index = RetrievalIndex(db)
        vals, idxs = index.search(q, k=5, aqe={"k": 3, "alpha": 3})
        from dirjax.ops import expand_queries

        q2 = np.asarray(expand_queries(q, db, alpha=3, k=3))
        want = (-(q2 @ db.T)).argsort(axis=1)[:, :5]
        np.testing.assert_array_equal(idxs, want)

    def test_bf16_ranking_close(self, corpus):
        db, q = corpus
        fp32 = RetrievalIndex(db).search(q, k=5)[1]
        bf16 = RetrievalIndex(db, dtype=jnp.bfloat16).search(q, k=5)[1]
        # bf16 may permute near-ties; top-1 must agree on random data
        np.testing.assert_array_equal(fp32[:, 0], bf16[:, 0])

    def test_save_load_roundtrip(self, corpus, tmp_path):
        db, q = corpus
        index = RetrievalIndex(db, keys=[f"k{i}" for i in range(len(db))])
        p = str(tmp_path / "index.npz")
        index.save(p)
        loaded = RetrievalIndex.load(p)
        np.testing.assert_array_equal(loaded.search(q, 3)[1],
                                      index.search(q, 3)[1])
        assert loaded.keys[:2] == ["k0", "k1"]


class TestSharded:
    def test_mesh_search_matches(self, corpus):
        db, q = corpus
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        index = RetrievalIndex(db, mesh=mesh)
        vals, idxs = index.search(q, k=6)
        want = (-(q @ db.T)).argsort(axis=1)[:, :6]
        np.testing.assert_array_equal(idxs, want)

    def test_mesh_aqe(self, corpus):
        db, q = corpus
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        idxs = RetrievalIndex(db, mesh=mesh).search(q, k=4,
                                                    aqe={"k": 3, "alpha": 3})[1]
        single = RetrievalIndex(db).search(q, k=4, aqe={"k": 3, "alpha": 3})[1]
        np.testing.assert_array_equal(idxs, single)


class TestFusedHeadWiring:
    def test_extractor_fused_flag_equivalent(self, rng):
        from dirjax.extraction import FeatureExtractor
        from dirjax.models import create_model

        model = create_model("resnet18_rmac", out_dim=64)
        params = model.init(jax.random.PRNGKey(0))
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        plain = np.asarray(FeatureExtractor(model, params, fused_head=False)(x))
        fused = np.asarray(FeatureExtractor(model, params, fused_head=True)(x))
        np.testing.assert_allclose(plain, fused, rtol=1e-4, atol=1e-5)


class TestServingGrowthAndBuckets:
    def _db(self, n=100, d=32, seed=0):
        rng = np.random.default_rng(seed)
        x = rng.normal(size=(n, d)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    def test_query_count_bucketing_pads_and_slices(self):
        db = self._db()
        idx = RetrievalIndex(db)
        q = db[:3]
        v3, i3 = idx.search(q, k=5)
        assert v3.shape == (3, 5)
        # identical to an exact-bucket search of the same queries
        v4, i4 = idx.search(np.concatenate([q, db[3:4]]), k=5)
        np.testing.assert_array_equal(i3, i4[:3])
        np.testing.assert_allclose(v3, v4[:3], rtol=1e-6)
        assert np.array_equal(i3[:, 0], np.arange(3))

    @pytest.mark.parametrize("mode", ["fp32", "int8", "mesh", "mesh_int8"])
    def test_add_grows_index(self, mode):
        import jax.numpy as jnp

        from dirjax.parallel import make_mesh

        db = self._db(60)
        extra = self._db(17, seed=9)
        kw = {}
        if "int8" in mode:
            kw["dtype"] = jnp.int8
        if "mesh" in mode:
            kw["mesh"] = make_mesh(db=4)
        idx = RetrievalIndex(db, keys=[f"a{j}" for j in range(60)], **kw)
        idx.add(extra, keys=[f"b{j}" for j in range(17)])
        assert idx.n == 77
        v, i = idx.search(extra[:5], k=1)
        # each added row retrieves itself (quantization can't break top-1
        # self-similarity on random descriptors)
        np.testing.assert_array_equal(i[:, 0], 60 + np.arange(5))
        assert idx.lookup(i[:1])[0] == ["b0"]

    def test_add_requires_keys_when_keyed(self):
        idx = RetrievalIndex(self._db(), keys=[str(j) for j in range(100)])
        with pytest.raises(AssertionError):
            idx.add(self._db(3, seed=5))
