"""Tests for dirjax.ops: GeM/MAC pooling (incl. masked), sympow multi-chain
pooling, whitening, AQE/ADBA, ranking. Cross-checked against torch and
against the reference's common.py loaded by file path."""

import importlib.util

import jax.numpy as jnp
import numpy as np
import pytest

import dirjax.ops as ops

REF_COMMON = "/root/reference/dirtorch/utils/common.py"


def _load_ref_common():
    try:
        spec = importlib.util.spec_from_file_location("ref_common", REF_COMMON)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


REF = _load_ref_common()


class TestGeM:
    def test_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        x = rng.random((2, 7, 5, 16), dtype=np.float32)  # NHWC
        p = 2.7
        ours = np.asarray(ops.gem_pool(jnp.asarray(x), p))
        xt = torch.from_numpy(x).permute(0, 3, 1, 2)  # NCHW
        theirs = (
            torch.nn.functional.adaptive_avg_pool2d(xt.clamp(min=1e-6).pow(p), 1)
            .pow(1.0 / p).squeeze(-1).squeeze(-1).numpy()
        )
        np.testing.assert_allclose(ours, theirs, rtol=1e-5)

    def test_p1_is_avg(self, rng):
        x = rng.random((3, 4, 4, 8), dtype=np.float32) + 0.1
        np.testing.assert_allclose(
            np.asarray(ops.gem_pool(jnp.asarray(x), 1.0)),
            x.mean(axis=(1, 2)), rtol=1e-5)

    def test_large_p_approaches_max(self, rng):
        x = rng.random((1, 6, 6, 4), dtype=np.float32) + 0.5
        # keep x^p in fp32 range: scale so per-channel max is 1
        x = x / x.max(axis=(1, 2), keepdims=True)
        # gem == max * mean((x/max)^p)^(1/p) >= max * (1/36)^(1/64) ~ 0.946*max
        pooled = np.asarray(ops.gem_pool(jnp.asarray(x), 64.0))
        np.testing.assert_allclose(pooled, x.max(axis=(1, 2)), rtol=0.06)

    def test_masked_equals_cropped(self, rng):
        """GeM over a padded map with a validity mask == GeM over the crop."""
        x = rng.random((1, 8, 8, 8), dtype=np.float32)
        h, w = 5, 3
        padded = np.zeros_like(x)
        padded[:, :h, :w] = x[:, :h, :w]
        mask = np.zeros((1, 8, 8), dtype=bool)
        mask[:, :h, :w] = True
        ours = np.asarray(ops.gem_pool(jnp.asarray(padded), 3.0, mask=jnp.asarray(mask)))
        exact = np.asarray(ops.gem_pool(jnp.asarray(x[:, :h, :w]), 3.0))
        np.testing.assert_allclose(ours, exact, rtol=1e-5)

    def test_mac_masked(self, rng):
        x = rng.random((2, 6, 6, 4), dtype=np.float32)
        mask = np.zeros((2, 6, 6), dtype=bool)
        mask[:, :3, :4] = True
        ours = np.asarray(ops.mac_pool(jnp.asarray(x), mask=jnp.asarray(mask)))
        np.testing.assert_allclose(ours, x[:, :3, :4].max(axis=(1, 2)), rtol=1e-6)


class TestSympowPool:
    @pytest.mark.skipif(REF is None, reason="reference common.py not importable")
    @pytest.mark.parametrize("pooling", ["mean", "gem"])
    def test_matches_reference(self, rng, pooling):
        torch = pytest.importorskip("torch")
        descs = [rng.normal(size=(5, 32)).astype(np.float32) for _ in range(3)]
        ours = np.asarray(ops.pool_descriptors(
            [jnp.asarray(d) for d in descs], pooling=pooling, gemp=3, l2norm=False))
        theirs = REF.pool([torch.from_numpy(d) for d in descs], pooling, gemp=3).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-6)

    def test_single_chain_passthrough(self, rng):
        d = rng.normal(size=(4, 8)).astype(np.float32)
        out = np.asarray(ops.pool_descriptors([jnp.asarray(d)], l2norm=False))
        np.testing.assert_allclose(out, d)


class TestWhitening:
    @pytest.mark.skipif(REF is None, reason="reference common.py not importable")
    @pytest.mark.parametrize("whitenp,whitenv,whitenm", [
        (0.5, None, 1.0), (0.25, None, 1.0), (0.5, 16, 2.0)])
    def test_matches_reference(self, rng, whitenp, whitenv, whitenm):
        X = rng.normal(size=(40, 32)).astype(np.float32)
        train = rng.normal(size=(100, 32)).astype(np.float32)
        pca = ops.fit_pca(train)

        class FakeSklearnPCA:
            mean_ = np.asarray(pca.mean)
            components_ = np.asarray(pca.components)
            explained_variance_ = np.asarray(pca.variance)
            whiten = True

        ours = np.asarray(ops.apply_whitening(
            jnp.asarray(X), pca, whitenp=whitenp, whitenv=whitenv, whitenm=whitenm))
        theirs = REF.whiten_features(
            X.astype(np.float64), FakeSklearnPCA(), whitenp=whitenp,
            whitenv=whitenv, whitenm=whitenm)
        np.testing.assert_allclose(ours, theirs, rtol=1e-3, atol=1e-5)

    def test_fit_pca_matches_sklearn(self, rng):
        decomposition = pytest.importorskip("sklearn.decomposition")
        X = rng.normal(size=(64, 16))
        ours = ops.fit_pca(X)
        ref = decomposition.PCA(whiten=True).fit(X)
        np.testing.assert_allclose(ours.mean, ref.mean_, atol=1e-5)
        np.testing.assert_allclose(ours.variance, ref.explained_variance_, rtol=1e-5)
        np.testing.assert_allclose(np.abs(ours.components), np.abs(ref.components_),
                                   atol=1e-4)

    def test_fit_pca_device_matches_host_svd(self, rng):
        # L2-normalized rows with an anisotropic spectrum — the actual
        # descriptor regime the device fit is built for
        X = rng.normal(size=(400, 24)) * np.linspace(3.0, 0.1, 24)
        X /= np.linalg.norm(X, axis=1, keepdims=True)
        host = ops.fit_pca(X)
        dev = ops.fit_pca_device(jnp.asarray(X, jnp.float32))
        np.testing.assert_allclose(dev.mean, host.mean, atol=1e-5)
        np.testing.assert_allclose(dev.variance, host.variance,
                                   rtol=1e-3, atol=1e-6)
        np.testing.assert_allclose(np.abs(dev.components),
                                   np.abs(host.components),
                                   atol=2e-3)
        # retrieval is what matters: whitened cosine scores must agree
        # regardless of per-component sign conventions
        q = rng.normal(size=(8, 24)).astype(np.float32)
        db = rng.normal(size=(16, 24)).astype(np.float32)
        s_host = np.asarray(ops.apply_whitening(q, host, whitenp=0.25)) @ \
            np.asarray(ops.apply_whitening(db, host, whitenp=0.25)).T
        s_dev = np.asarray(ops.apply_whitening(q, dev, whitenp=0.25)) @ \
            np.asarray(ops.apply_whitening(db, dev, whitenp=0.25)).T
        np.testing.assert_allclose(s_dev, s_host, rtol=1e-3, atol=1e-4)

    def test_fit_pca_device_streamed_chunks(self, rng):
        X = rng.normal(size=(96, 12)).astype(np.float32)
        whole = ops.fit_pca_device(X)
        # uniform 32-row chunks as a generator: the >HBM streaming path
        chunks = (X[i:i + 32] for i in range(0, 96, 32))
        streamed = ops.fit_pca_device(chunks)
        np.testing.assert_allclose(streamed.mean, whole.mean, atol=1e-6)
        np.testing.assert_allclose(streamed.variance, whole.variance,
                                   rtol=1e-5)
        np.testing.assert_allclose(streamed.components, whole.components,
                                   atol=1e-5)

    def test_fit_pca_device_rejects_degenerate(self):
        with pytest.raises(ValueError, match="at least 2 rows"):
            ops.fit_pca_device(np.zeros((1, 4), np.float32))

    def test_folded_matrix_equivalent(self, rng):
        X = rng.normal(size=(10, 24)).astype(np.float32)
        pca = ops.fit_pca(rng.normal(size=(50, 24)))
        direct = np.asarray(ops.apply_whitening(jnp.asarray(X), pca, whitenp=0.25,
                                                l2norm=False))
        W, b = ops.whitening_matrix(pca, whitenp=0.25)
        folded = X @ W + b
        np.testing.assert_allclose(folded, direct, rtol=1e-3, atol=1e-5)


def _reference_expand_numpy(descs, db=None, alpha=0, k=0):
    """Straight transcription of the documented reference semantics
    (test_dir.py:24-44) as a slow numpy loop, used as the test oracle."""
    if k == 0:
        return descs
    n = descs.shape[0]
    db_descs = db if db is not None else descs
    sim = descs @ db_descs.T
    if db is None:
        sim[np.diag_indices(n)] = 0
    idx = np.argpartition(sim, -k, axis=1)[:, -k:]
    out = np.zeros_like(descs)
    for i in range(n):
        rows = [db_descs[j] * sim[i, j] ** alpha for j in idx[i]]
        new_q = np.vstack([descs[i]] + rows).mean(axis=0)
        out[i] = new_q / np.linalg.norm(new_q)
    return out


class TestQueryExpansion:
    def test_aqe_matches_oracle(self, rng):
        q = rng.normal(size=(6, 16)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db = rng.normal(size=(20, 16)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        ours = np.asarray(ops.expand_queries(q, db, alpha=3, k=5))
        oracle = _reference_expand_numpy(q, db, alpha=3, k=5)
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)

    def test_adba_matches_oracle(self, rng):
        db = rng.normal(size=(12, 16)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        ours = np.asarray(ops.expand_database(db, alpha=2, k=4))
        oracle = _reference_expand_numpy(db.copy(), None, alpha=2, k=4)
        np.testing.assert_allclose(ours, oracle, rtol=1e-4, atol=1e-5)

    def test_k0_identity(self, rng):
        q = rng.normal(size=(3, 8)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(ops.expand_descriptors(q, k=0)), q)

    def test_output_is_normalized(self, rng):
        q = rng.normal(size=(4, 8)).astype(np.float32)
        db = rng.normal(size=(9, 8)).astype(np.float32)
        out = np.asarray(ops.expand_queries(q, db, alpha=1, k=3))
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


class TestRanking:
    def test_scores(self, rng):
        q = rng.normal(size=(4, 16)).astype(np.float32)
        db = rng.normal(size=(30, 16)).astype(np.float32)
        np.testing.assert_allclose(np.asarray(ops.compute_scores(q, db)), q @ db.T,
                                   rtol=1e-5)

    def test_chunked_matches_full(self, rng):
        q = rng.normal(size=(3, 8)).astype(np.float32)
        db = rng.normal(size=(25, 8)).astype(np.float32)
        full = np.asarray(ops.compute_scores(q, db))
        chunked = ops.compute_scores_chunked(q, db, chunk=7)
        # fp32 accumulation order differs between the chunked and full paths
        np.testing.assert_allclose(chunked, full, rtol=1e-5, atol=1e-6)

    def test_topk(self, rng):
        q = rng.normal(size=(2, 8)).astype(np.float32)
        db = rng.normal(size=(50, 8)).astype(np.float32)
        vals, idx = ops.rank_topk(q, db, k=5)
        scores = q @ db.T
        np.testing.assert_array_equal(np.asarray(idx), (-scores).argsort(axis=1)[:, :5])


class TestCenterBias:
    def test_matches_torch_interpolate(self):
        torch = pytest.importorskip("torch")
        b = 0.8
        h, w = 13, 9
        ours = np.asarray(ops.center_bias_mask(h, w, b))
        base = 1 + torch.tensor(
            [[[[0, 0, 0, 0], [0, b, b, 0], [0, b, b, 0], [0, 0, 0, 0]]]],
            dtype=torch.float32)
        theirs = torch.nn.functional.interpolate(
            base, size=(h, w), mode="bilinear", align_corners=True)[0, 0].numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)
