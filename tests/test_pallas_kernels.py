"""Pallas kernel tests (interpret mode on CPU) against their XLA oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.ops.gem_head import _fused_call, fused_gem_head, gem_head_reference
from dirjax.ops.topk_pallas import _fused as topk_fused
from dirjax.ops.topk_pallas import rank_topk_fused


class TestFusedGemHead:
    @pytest.mark.parametrize("shape", [(2, 4, 4, 128), (1, 9, 5, 256)])
    def test_matches_reference(self, rng, shape):
        B, H, W, C = shape
        D = 512
        x = (rng.random((B, H, W, C)) + 0.05).astype(np.float32)
        w = rng.normal(size=(C, D)).astype(np.float32) * 0.02
        b = rng.normal(size=(D,)).astype(np.float32) * 0.01
        p = 2.5
        mask = np.ones((B, H, W), np.float32)
        got = np.asarray(_fused_call(jnp.asarray(x), jnp.asarray(mask), p,
                                     jnp.asarray(w), jnp.asarray(b),
                                     interpret=True))
        want = np.asarray(gem_head_reference(jnp.asarray(x), None, p,
                                             jnp.asarray(w), jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_masked(self, rng):
        B, H, W, C, D = 1, 8, 6, 128, 256
        x = (rng.random((B, H, W, C)) + 0.05).astype(np.float32)
        w = rng.normal(size=(C, D)).astype(np.float32) * 0.02
        b = np.zeros((D,), np.float32)
        mask = np.zeros((B, H, W), np.float32)
        mask[:, :5, :3] = 1.0
        got = np.asarray(_fused_call(jnp.asarray(x), jnp.asarray(mask), 3.0,
                                     jnp.asarray(w), jnp.asarray(b),
                                     interpret=True))
        want = np.asarray(gem_head_reference(
            jnp.asarray(x), jnp.asarray(mask) > 0.5, 3.0, jnp.asarray(w),
            jnp.asarray(b)))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)

    def test_dispatcher_fallback_on_cpu(self, rng):
        x = (rng.random((1, 4, 4, 128)) + 0.1).astype(np.float32)
        w = rng.normal(size=(128, 128)).astype(np.float32)
        b = np.zeros((128,), np.float32)
        out = fused_gem_head(x, 3.0, w, b)  # auto -> XLA path on CPU
        assert np.asarray(out).shape == (1, 128)
        np.testing.assert_allclose(np.linalg.norm(np.asarray(out), axis=1),
                                   1.0, rtol=1e-5)


class TestFusedTopK:
    @pytest.mark.parametrize("nd,tile", [(100, 32), (256, 64), (50, 64), (1030, 512)])
    def test_matches_lax_topk(self, rng, nd, tile):
        nq, d, k = 8, 128, 5
        q = rng.normal(size=(nq, d)).astype(np.float32)
        db = rng.normal(size=(nd, d)).astype(np.float32)
        vals, idxs = topk_fused(jnp.asarray(q), jnp.asarray(db), k,
                                min(tile, nd), True)
        scores = q @ db.T
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(scores), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))

    def test_dispatcher_cpu(self, rng):
        q = rng.normal(size=(4, 64)).astype(np.float32)
        db = rng.normal(size=(300, 64)).astype(np.float32)
        vals, idxs = rank_topk_fused(q, db, 7)
        scores = q @ db.T
        np.testing.assert_array_equal(np.asarray(idxs),
                                      (-scores).argsort(axis=1)[:, :7])


class TestBlockMaxTopK:
    @pytest.mark.parametrize("nd,tile,k", [(1024, 256, 5), (1000, 256, 10),
                                           (4096, 512, 100), (300, 256, 7)])
    def test_matches_lax_topk(self, rng, nd, tile, k):
        from dirjax.ops.topk_pallas import _blockmax

        nq, d = 8, 128
        q = rng.normal(size=(nq, d)).astype(np.float32)
        db = rng.normal(size=(nd, d)).astype(np.float32)
        vals, idxs = _blockmax(jnp.asarray(q), jnp.asarray(db), k, tile)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))

    def test_adversarial_one_block_holds_all(self, rng):
        """All top-k concentrated in a single 128-column block."""
        from dirjax.ops.topk_pallas import _blockmax

        nq, d, nd, k = 2, 64, 1024, 8
        q = rng.normal(size=(nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db = rng.normal(size=(nd, d)).astype(np.float32) * 0.01
        # rows 256..263 are scaled copies of the queries -> dominate block 2
        for j in range(k // 2):
            db[256 + j] = q[0] * (1.0 + j)
            db[260 + j] = q[1] * (1.0 + j)
        vals, idxs = _blockmax(jnp.asarray(q), jnp.asarray(db), k, 256)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))


class TestTopkSelect:
    """Iterative exact selection kernel (the lax.top_k replacement inside
    the two-phase ranking's selection stage)."""

    @pytest.mark.parametrize("nq,n,k", [
        (16, 1000, 10), (7, 7816, 100), (48, 12800, 100),
        (5, 128, 128), (3, 256, 1),
    ])
    def test_matches_lax_topk(self, rng, nq, n, k):
        from dirjax.ops.topk_pallas import topk_select

        x = jnp.asarray(rng.normal(size=(nq, n)).astype(np.float32))
        v, i = topk_select(x, k)
        vr, ir = jax.lax.top_k(x, k)
        np.testing.assert_array_equal(np.asarray(v), np.asarray(vr))
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ir))

    def test_ties_take_lowest_index(self):
        from dirjax.ops.topk_pallas import topk_select

        x = np.zeros((4, 256), np.float32)
        x[:, 17] = 1.0
        x[:, 200] = 1.0
        _, i = topk_select(jnp.asarray(x), 3)
        assert list(np.asarray(i)[0][:2]) == [17, 200]

    def test_neg_inf_rows_yield_sentinels(self):
        from dirjax.ops.topk_pallas import topk_select

        x = np.full((2, 256), -np.inf, np.float32)
        x[0, 3] = 1.0
        v, i = topk_select(jnp.asarray(x), 2)
        assert i[0, 0] == 3 and i[0, 1] == -1 and i[1, 0] == -1

    def test_k_exceeds_n_raises(self):
        from dirjax.ops.topk_pallas import topk_select

        with pytest.raises(ValueError):
            topk_select(jnp.zeros((2, 64)), 65)
