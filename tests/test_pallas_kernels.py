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


class TestHierarchicalTopK:
    """Fine-max stream (phase 1) + hierarchical recompute (phase 2) — the
    large-k serving path. Phase 1 writes only per-fine-block maxima; the
    answer must still be EXACTLY lax.top_k over the dense scores."""

    @pytest.mark.parametrize("nd,tile,k", [(1024, 256, 5), (1000, 256, 10),
                                           (4096, 512, 100), (300, 256, 7),
                                           (2048, 256, 1), (5000, 1024, 64)])
    def test_matches_lax_topk(self, rng, nd, tile, k):
        from dirjax.ops.topk_pallas import _hierarchical

        nq, d = 8, 128
        q = rng.normal(size=(nq, d)).astype(np.float32)
        db = rng.normal(size=(nd, d)).astype(np.float32)
        vals, idxs = _hierarchical(jnp.asarray(q), jnp.asarray(db), k, tile)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))

    @pytest.mark.parametrize("nq", [1, 3, 7])
    def test_sub_sublane_query_counts_padded(self, rng, nq):
        """nq < 8 must pad to one sublane tile through rank_topk_fused:
        Mosaic miscompiles sub-8-row phase-1 dots ('vector.broadcast'
        bf16->f32 verification error, hit on chip by the server
        warmup's nq=1 bucket, r4) — and the answer must still be the
        un-padded query count."""
        from dirjax.ops.topk_pallas import rank_topk_fused

        d, nd, k = 128, 2048, 20
        q = rng.normal(size=(nq, d)).astype(np.float32)
        db = rng.normal(size=(nd, d)).astype(np.float32)
        vals, idxs = rank_topk_fused(jnp.asarray(q), jnp.asarray(db), k,
                                     use_pallas=True)
        assert vals.shape == (nq, k)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_array_equal(np.asarray(idxs),
                                      np.asarray(want_idxs))

    def test_adversarial_one_fine_block_holds_all(self, rng):
        """All top-k concentrated in a single fine block (one consecutive
        8-row range) — the worst case for the containment argument."""
        from dirjax.ops.topk_pallas import _hierarchical

        nq, d, nd, k = 2, 64, 2048, 8
        tile = 512
        q = rng.normal(size=(nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db = rng.normal(size=(nd, d)).astype(np.float32) * 0.01
        base = tile * 1 + 37 * 8         # fine block 37 of tile 1
        for j in range(8):               # rows base..base+7
            db[base + j] = q[0] * (1.0 + j)
        vals, idxs = _hierarchical(jnp.asarray(q), jnp.asarray(db), k, tile)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_array_equal(np.asarray(idxs)[0],
                                      np.asarray(want_idxs)[0])
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   rtol=1e-5, atol=1e-5)

    def test_adversarial_spread_one_per_tile(self, rng):
        """Top-k spread over exactly k distinct tiles (forces the level-0
        selection to need all k tiles)."""
        from dirjax.ops.topk_pallas import _hierarchical

        nq, d, k, tile = 1, 64, 8, 256
        nd = tile * k
        q = rng.normal(size=(nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db = rng.normal(size=(nd, d)).astype(np.float32) * 0.01
        for t in range(k):
            db[t * tile + 7 * t + 3] = q[0] * (2.0 + t)
        vals, idxs = _hierarchical(jnp.asarray(q), jnp.asarray(db), k, tile)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))

    def test_ragged_tail_never_selected(self, rng):
        """Valid rows end mid-tile; indices must stay < Nd even when the
        query correlates perfectly with garbage-pad directions."""
        from dirjax.ops.topk_pallas import _hierarchical

        nq, d, nd, tile, k = 4, 64, 900, 256, 20
        q = rng.normal(size=(nq, d)).astype(np.float32)
        db = rng.normal(size=(nd, d)).astype(np.float32)
        vals, idxs = _hierarchical(jnp.asarray(q), jnp.asarray(db), k, tile)
        assert np.asarray(idxs).max() < nd
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), k)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))

    def test_int8_hierarchical_matches_dense_dequantized(self, rng):
        from dirjax.ops.topk_pallas import _hierarchical, quantize_db

        nq, d, nd, tile, k = 4, 128, 2048, 256, 32
        db = rng.normal(size=(nd, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = rng.normal(size=(nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db8, scales = quantize_db(db)
        vals, idxs = _hierarchical(jnp.asarray(q, jnp.bfloat16), db8, k,
                                   tile, scales)
        # oracle: dense scores over the same quantized values with the same
        # bf16 query rounding
        qb = np.asarray(jnp.asarray(q, jnp.bfloat16), np.float32)
        dense = (qb @ np.asarray(db8, np.float32).T) * np.asarray(scales)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(dense), k)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))
        np.testing.assert_allclose(np.asarray(vals), np.asarray(want_vals),
                                   rtol=1e-3, atol=1e-3)

    def test_dispatcher_large_k_uses_hierarchy(self, rng):
        """rank_topk_fused with use_pallas routes k>16 through the
        hierarchical path and still equals the dense oracle."""
        q = rng.normal(size=(4, 64)).astype(np.float32)
        db = rng.normal(size=(1024, 64)).astype(np.float32)
        vals, idxs = rank_topk_fused(q, db, 50, use_pallas=True,
                                     tile_rows=256)
        want_vals, want_idxs = jax.lax.top_k(jnp.asarray(q @ db.T), 50)
        np.testing.assert_array_equal(np.asarray(idxs), np.asarray(want_idxs))
