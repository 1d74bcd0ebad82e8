"""int8-quantized database ranking: quantize_db + the int8 kernel path +
the serving index. Pallas runs in interpret mode on the CPU harness; the
same code paths are exercised compiled on TPU (PERF_NOTES.md)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.ops.qe import expand_queries, expand_queries_quantized
from dirjax.ops.topk_pallas import quantize_db, rank_topk_fused
from dirjax.serving import RetrievalIndex

rng = np.random.default_rng(3)


def _normed(n, d):
    x = rng.normal(size=(n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def test_quantize_roundtrip_error_bound():
    db = _normed(200, 64)
    q8, scales = quantize_db(db)
    assert q8.dtype == jnp.int8 and scales.shape == (1, 200)
    deq = np.asarray(q8, np.float32) * np.asarray(scales).T
    # symmetric rounding: per-element error <= half a quantization step
    step = np.asarray(scales).T  # (N, 1)
    assert np.all(np.abs(deq - db) <= step / 2 + 1e-7)
    # zero row must not produce NaN/inf scales
    q8z, sz = quantize_db(np.zeros((3, 8), np.float32))
    assert np.all(np.isfinite(np.asarray(sz))) and np.all(np.asarray(q8z) == 0)


def test_int8_requires_scales():
    db8, scales = quantize_db(_normed(64, 32))
    with pytest.raises(ValueError):
        rank_topk_fused(_normed(4, 32), db8, 5)


def test_int8_kernel_matches_dense_dequantized():
    """The Pallas int8 path must equal a dense top-k over the SAME quantized
    values (quantization noise is a property of the data, not the kernel)."""
    db = _normed(1024, 128)
    q = _normed(16, 128)
    db8, scales = quantize_db(db)
    vals_k, idxs_k = rank_topk_fused(q, db8, 10, db_scales=scales,
                                     use_pallas=True)
    deq = np.asarray(db8, np.float32) * np.asarray(scales).T
    dense = np.asarray(q, np.float32) @ deq.T
    order = np.argsort(-dense, axis=1)[:, :10]
    # overlap of index sets (bf16 query rounding can swap near-ties)
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(np.asarray(idxs_k), order)])
    assert overlap >= 0.95, overlap
    # values must match the dense scores at the returned indices
    got = np.take_along_axis(dense, np.asarray(idxs_k), axis=1)
    assert np.allclose(np.asarray(vals_k), got, atol=2e-2)


def test_int8_ranking_close_to_fp32():
    db = _normed(1024, 256)
    q = _normed(8, 256)
    db8, scales = quantize_db(db)
    _, idx8 = rank_topk_fused(q, db8, 10, db_scales=scales, use_pallas=True)
    _, idx32 = rank_topk_fused(q, db, 10, use_pallas=False)
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(np.asarray(idx8), np.asarray(idx32))])
    assert overlap >= 0.8, f"int8 vs fp32 top-10 overlap {overlap}"
    # the top-1 neighbor survives quantization essentially always
    top1 = np.mean(np.asarray(idx8)[:, 0] == np.asarray(idx32)[:, 0])
    assert top1 >= 0.8


def _int8q_oracle(q, db8, scales):
    """Exact full-int8 scores: int32 dot, fp32 convert, db + query scales
    (mirrors both the kernel and fallback paths bit-for-bit)."""
    from dirjax.ops.topk_pallas import _quantize_block

    q8, qs = _quantize_block(jnp.asarray(q))
    raw = np.asarray(q8, np.int64) @ np.asarray(db8, np.int64).T
    return (raw.astype(np.float32) * np.asarray(scales)
            * np.asarray(qs).reshape(-1, 1))


def test_full_int8_hierarchical_matches_oracle():
    """quantize_queries=True (int8 MXU mode) must equal a dense top-k over
    the SAME doubly-quantized scores."""
    db = _normed(2048, 128)
    q = _normed(8, 128)
    db8, scales = quantize_db(db)
    vals, idxs = rank_topk_fused(q, db8, 32, db_scales=scales,
                                 use_pallas=True, tile_rows=256,
                                 quantize_queries=True)
    dense = _int8q_oracle(q, db8, scales)
    wv, wi = jax.lax.top_k(jnp.asarray(dense), 32)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(wv),
                               rtol=1e-5, atol=1e-6)


def test_full_int8_dense_fallback_matches_oracle():
    db = _normed(100, 32)
    q = _normed(4, 32)
    db8, scales = quantize_db(db)
    vals, idxs = rank_topk_fused(q, db8, 5, db_scales=scales,
                                 use_pallas=True, quantize_queries=True)
    dense = _int8q_oracle(q, db8, scales)
    wv, wi = jax.lax.top_k(jnp.asarray(dense), 5)
    np.testing.assert_array_equal(np.asarray(idxs), np.asarray(wi))
    np.testing.assert_allclose(np.asarray(vals), np.asarray(wv),
                               rtol=1e-5, atol=1e-6)


def test_full_int8_close_to_fp32_ranking():
    """Double quantization still recovers essentially the fp32 neighbors
    (the accuracy contract the serving docs advertise)."""
    db = _normed(1024, 256)
    q = _normed(8, 256)
    db8, scales = quantize_db(db)
    _, idx8 = rank_topk_fused(q, db8, 10, db_scales=scales,
                              use_pallas=True, quantize_queries=True)
    _, idx32 = rank_topk_fused(q, db, 10, use_pallas=False)
    overlap = np.mean([len(set(a) & set(b)) / 10.0
                       for a, b in zip(np.asarray(idx8), np.asarray(idx32))])
    assert overlap >= 0.8, f"full-int8 vs fp32 top-10 overlap {overlap}"


def test_quantize_queries_requires_int8_db():
    db = _normed(300, 32)
    q = _normed(4, 32)
    with pytest.raises(ValueError, match="int8 database"):
        rank_topk_fused(q, db, 5, quantize_queries=True)
    idx = RetrievalIndex(db, dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="int8 index"):
        idx.search(q, k=5, int8_queries=True)


def test_small_quantized_db_fallback():
    # below one kernel tile the eager fallback must serve the same answers
    db = _normed(100, 32)
    q = _normed(4, 32)
    db8, scales = quantize_db(db)
    vals, idxs = rank_topk_fused(q, db8, 5, db_scales=scales, use_pallas=True)
    deq = np.asarray(db8, np.float32) * np.asarray(scales).T
    order = np.argsort(-(np.asarray(q) @ deq.T), axis=1)[:, :5]
    assert np.array_equal(np.asarray(idxs), order)


def test_expand_queries_quantized_matches_dense():
    db = _normed(600, 64)
    q = _normed(5, 64)
    db8, scales = quantize_db(db)
    deq = np.asarray(db8, np.float32) * np.asarray(scales).T
    want = np.asarray(expand_queries(q, deq, alpha=3.0, k=4))
    got = np.asarray(expand_queries_quantized(q, db8, scales, alpha=3.0, k=4))
    # same semantics over the same (quantized) neighbor set; bf16 top-k may
    # reorder near-ties, so compare the expanded vectors, not the paths
    cos = np.sum(want * got, axis=1)
    assert np.all(cos > 0.999), cos


class TestRetrievalIndexInt8:
    def test_search_matches_fp32_index(self):
        db = _normed(512, 128)
        q = _normed(6, 128)
        idx8 = RetrievalIndex(db, dtype=jnp.int8)
        idx32 = RetrievalIndex(db, dtype=jnp.float32)
        v8, i8 = idx8.search(q, k=5)
        v32, i32 = idx32.search(q, k=5)
        overlap = np.mean([len(set(a) & set(b)) / 5.0 for a, b in zip(i8, i32)])
        assert overlap >= 0.8
        assert np.allclose(v8[:, 0], v32[:, 0], atol=2e-2)

    def test_int8_queries_mode(self):
        db = _normed(512, 128)
        q = _normed(6, 128)
        idx8 = RetrievalIndex(db, dtype=jnp.int8)
        v, i = idx8.search(q, k=5, int8_queries=True)
        assert v.shape == (6, 5)
        # full-int8 still recovers the fp32 top-1 on well-separated data
        _, i32 = RetrievalIndex(db, dtype=jnp.float32).search(q, k=5)
        assert np.mean(i[:, 0] == i32[:, 0]) >= 0.8
        # the mode must not stick across calls (it is a per-call
        # parameter, never instance state — instance state raced under
        # the batcher's concurrent dispatch workers)
        v2, i2 = idx8.search(q, k=5)
        assert not hasattr(idx8, "_int8_queries")
        _, iq = idx8.search(q, k=5, int8_queries=True)
        np.testing.assert_array_equal(iq, i)   # param still honored

    def test_aqe_runs_and_normalizes(self):
        db = _normed(512, 64)
        idx = RetrievalIndex(db, dtype=jnp.int8)
        v, i = idx.search(_normed(3, 64), k=5, aqe={"k": 4, "alpha": 3.0})
        assert v.shape == (3, 5) and np.all((0 <= i) & (i < 512))

    def test_save_load_roundtrip(self, tmp_path):
        db = _normed(128, 32)
        keys = [f"img{j}" for j in range(128)]
        idx = RetrievalIndex(db, keys=keys, dtype=jnp.int8)
        p = str(tmp_path / "index.npz")
        idx.save(p)
        # int8 archives store rows+scales (4x smaller) and reload EXACTLY
        with np.load(p) as data:
            assert data["descriptors_i8"].dtype == np.int8
            step = np.abs(db).max(axis=1, keepdims=True) / 127.0
            deq = data["descriptors_i8"].astype(np.float32) * data["scales"].T
            assert np.all(np.abs(deq - db) <= step / 2 + 1e-7)
        back = RetrievalIndex.load(p)          # dtype inferred from archive
        assert back.dtype == jnp.int8
        assert np.array_equal(np.asarray(back._db), np.asarray(idx._db))
        assert back.lookup([[0, 5]]) == [["img0", "img5"]]
        # a float reload dequantizes on request
        as_f32 = RetrievalIndex.load(p, dtype=jnp.float32)
        assert as_f32.dtype == jnp.float32
        v1, i1 = back.search(db[:3], k=4)
        v2, i2 = as_f32.search(db[:3], k=4)
        assert np.array_equal(i1, i2)

    def test_int8_mesh_matches_single_chip(self):
        """int8 + mesh: rows and scales sharded over 'db'; results must
        match the single-chip int8 index (same quantized values)."""
        from dirjax.parallel import make_mesh

        db = _normed(67, 64)  # ragged: forces pad rows on the 4-way shard
        q = _normed(5, 64)
        mesh = make_mesh(db=4)
        idx_m = RetrievalIndex(db, mesh=mesh, dtype=jnp.int8)
        idx_1 = RetrievalIndex(db, dtype=jnp.int8)
        vm, im = idx_m.search(q, k=7)
        v1, i1 = idx_1.search(q, k=7)
        assert np.array_equal(im, i1)
        np.testing.assert_allclose(vm, v1, atol=2e-2)
        # AQE path composes with the sharded int8 database too
        va, ia = idx_m.search(q, k=3, aqe={"k": 4, "alpha": 3.0})
        assert va.shape == (5, 3) and np.all((0 <= ia) & (ia < 67))


class TestDispatcherRegressions:
    """Review findings on rank_topk_fused's dispatch (round 3)."""

    def test_int8_unaligned_tile_never_reaches_fused(self):
        # tile_rows % 128 != 0 used to fall through to the scale-less
        # _fused kernel -> silently unscaled (wrong) rankings
        db = _normed(512, 64)
        q = _normed(4, 64)
        db8, scales = quantize_db(db)
        vals, idxs = rank_topk_fused(q, db8, 5, db_scales=scales,
                                     tile_rows=200, use_pallas=True)
        deq = np.asarray(db8, np.float32) * np.asarray(scales).T
        dense = np.asarray(q, np.float32) @ deq.T
        got = np.take_along_axis(dense, np.asarray(idxs), axis=1)
        assert np.allclose(np.asarray(vals), got, atol=2e-2)

    def test_small_k_pallas_interprets_off_tpu(self):
        # the small-k _fused path previously hardcoded interpret=False
        # and crashed off-TPU while the k>16 path auto-interpreted
        db = _normed(512, 64)
        q = _normed(4, 64)
        vals, idxs = rank_topk_fused(q, db, 5, use_pallas=True,
                                     tile_rows=256)
        want = np.argsort(-(np.asarray(q) @ np.asarray(db).T))[:, :5]
        np.testing.assert_array_equal(np.asarray(idxs), want)

    def test_small_dim_auto_tile_clamped(self):
        # D=64 bf16 auto-derives tile_rows past _hierarchical's
        # 128*128 bound; the dispatcher must clamp instead of asserting
        db = _normed(33024, 64)
        q = _normed(4, 64)
        vals, idxs = rank_topk_fused(jnp.asarray(q, jnp.bfloat16),
                                     jnp.asarray(db, jnp.bfloat16), 50,
                                     use_pallas=True)
        dense = np.asarray(q, np.float32) @ np.asarray(db, np.float32).T
        order = np.argsort(-dense, axis=1)[:, :50]
        overlap = np.mean([len(set(a.tolist()) & set(b.tolist())) / 50
                           for a, b in zip(np.asarray(idxs), order)])
        assert overlap >= 0.9, overlap
