"""Round-4 additions: device-native index construction paths.

``PQIndex.from_codes`` and device-array ``RetrievalIndex`` construction
exist so the server/bench can build 1M-row indexes without round-tripping
the corpus through the 8 MB/s host tunnel — and so extraction output
(already on device) feeds an index directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.ops.pq import encode_pq, pq_lookup, train_pq
from dirjax.serving import PQIndex, RetrievalIndex


@pytest.fixture(scope="module")
def corpus():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((512, 64)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x


def test_pq_from_codes_matches_trained(corpus):
    trained = PQIndex(corpus, m=8, ksub=16, train_iters=5, seed=0)
    codes = np.asarray(trained._codes)
    rebuilt = PQIndex.from_codes(trained.codebooks, codes)
    assert rebuilt.n == trained.n and rebuilt.dim == trained.dim
    assert rebuilt.m == trained.m and rebuilt.ksub == trained.ksub
    q = corpus[:9]
    v1, i1 = trained.search(q, k=7)
    v2, i2 = rebuilt.search(q, k=7)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_pq_from_codes_device_codes_and_keys(corpus):
    trained = PQIndex(corpus, m=8, ksub=16, train_iters=5, seed=0)
    keys = [f"img{i}" for i in range(len(corpus))]
    rebuilt = PQIndex.from_codes(trained.codebooks,
                                 jnp.asarray(trained._codes), keys=keys)
    _, idxs = rebuilt.search(corpus[:3], k=5)
    looked = rebuilt.lookup(idxs)
    assert looked[0][0] == f"img{int(idxs[0][0])}"
    # tombstones work on the from_codes path too
    removed = rebuilt.remove(keys=[keys[int(idxs[0][0])]])
    assert removed == 1
    _, idxs2 = rebuilt.search(corpus[:3], k=5)
    assert int(idxs[0][0]) not in idxs2[0]


def test_pq_from_codes_rotation(corpus):
    trained = PQIndex(corpus, m=8, ksub=16, train_iters=5, seed=0,
                      opq=True, sample=None)
    rebuilt = PQIndex.from_codes(trained.codebooks,
                                 np.asarray(trained._codes),
                                 rotation=trained.rotation)
    v1, i1 = trained.search(corpus[:5], k=4)
    v2, i2 = rebuilt.search(corpus[:5], k=4)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-6)


def test_pq_from_codes_shape_validation(corpus):
    cbs = train_pq(corpus, 8, 16, iters=2)
    with pytest.raises(AssertionError):
        PQIndex.from_codes(cbs, np.zeros((10, 4), np.uint8))  # wrong m


def test_retrieval_index_accepts_device_array(corpus):
    dev = jnp.asarray(corpus, jnp.bfloat16)
    a = RetrievalIndex(dev, dtype=jnp.bfloat16)
    b = RetrievalIndex(corpus, dtype=jnp.bfloat16)
    q = corpus[:6]
    va, ia = a.search(q, k=8)
    vb, ib = b.search(q, k=8)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(va, vb, rtol=1e-6)


def test_whitening_rank_deficient_is_finite():
    """Rank-deficient corpora (rank < D) have zero-clipped trailing
    eigenvalues; whitening must zero EXACTLY those directions, not
    divide by zero (found via the r4 recall study: 530 NaN columns).
    Default mode keeps reference parity (tiny positive eigenvalues still
    divide — fit noise amplifies exactly like dirtorch's own math, so
    fold-vs-apply agreement is only asserted under the opt-in
    ``dead_floor``, which zeroes the noise directions)."""
    from dirjax.ops.whitening import (apply_whitening, fit_pca_device,
                                      whitening_matrix)

    rng = np.random.default_rng(0)
    basis = rng.standard_normal((12, 64)).astype(np.float32)
    x = rng.standard_normal((300, 12)).astype(np.float32) @ basis  # rank 12
    pca = fit_pca_device(x)
    out = np.asarray(apply_whitening(x, pca, whitenp=0.5))
    assert np.isfinite(out).all()          # parity mode: finite, no NaN
    assert np.abs(out).sum() > 0
    # dead_floor mode: noise directions are zeroed, so the f32 apply and
    # the f64 folded (W, b) agree everywhere
    outf = np.asarray(apply_whitening(x, pca, whitenp=0.5, dead_floor=1e-7))
    assert np.isfinite(outf).all()
    dead = np.asarray(pca.variance) <= float(np.max(pca.variance)) * 1e-7
    assert dead.any() and not np.abs(outf[:, dead]).any()
    w, b = whitening_matrix(pca, whitenp=0.5, dead_floor=1e-7)
    assert np.isfinite(w).all() and np.isfinite(b).all()
    folded = x @ w + b
    folded /= np.linalg.norm(folded, axis=1, keepdims=True)
    np.testing.assert_allclose(folded, outf, atol=2e-4)


def test_whitening_full_rank_unchanged_by_guard():
    """The dead-direction floor must not perturb healthy spectra."""
    from dirjax.ops.whitening import apply_whitening, fit_pca_device

    rng = np.random.default_rng(1)
    x = rng.standard_normal((300, 32)).astype(np.float32)
    pca = fit_pca_device(x)
    out = np.asarray(apply_whitening(x, pca, whitenp=0.5))
    # plain reimplementation without any guard
    xt = (x - pca.mean) @ pca.components.T
    ref = xt / np.power(pca.variance, 0.5)
    ref /= np.linalg.norm(ref, axis=1, keepdims=True)
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_retrieval_index_device_array_int8(corpus):
    dev = jnp.asarray(corpus)
    a = RetrievalIndex(dev, dtype=jnp.int8)
    b = RetrievalIndex(corpus, dtype=jnp.int8)
    q = corpus[:6]
    va, ia = a.search(q, k=8)
    vb, ib = b.search(q, k=8)
    np.testing.assert_array_equal(ia, ib)
    np.testing.assert_allclose(va, vb, rtol=1e-5)
