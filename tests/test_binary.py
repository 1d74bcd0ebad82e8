"""Binary-hash tier tests: packing, ITQ, exact Hamming top-k vs a numpy
oracle, asymmetric rescore recall, BinaryIndex serving (add / remove /
compact / save / load / loader dispatch).

Hamming exactness contract: returned VALUES match the brute-force oracle
exactly (they are ``n_bits - 2*dist`` integers); tie-broken indices may
differ (Hamming distances are small ints — ties are the common case), so
index assertions compare score-equivalence, not index identity.
"""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from dirjax.ops.binary import (BinaryCodec, binarize, fit_itq, hamming_topk,
                               pad_for_search, project_queries, unpack_pm1)
from dirjax.serving import BinaryIndex, RetrievalIndex


def _oracle_sims(qp, dbp):
    """Brute-force ±1-dot similarity from packed codes, on host."""
    x = np.bitwise_xor(qp[:, None, :], dbp[None, :, :])
    dist = np.unpackbits(x.view(np.uint8), axis=-1).sum(-1)
    return 32 * qp.shape[1] - 2 * dist.astype(np.int64)


def _rand_codes(rng, n, w):
    return rng.integers(0, 2 ** 32, size=(n, w), dtype=np.uint64) \
        .astype(np.uint32)


class TestPacking:
    def test_binarize_packs_projection_signs(self, rng):
        x = rng.normal(size=(17, 64)).astype(np.float32)
        codec = BinaryCodec(mean=jnp.zeros(64),
                            proj=jnp.eye(64, dtype=jnp.float32))
        packed = np.asarray(binarize(x, codec))
        assert packed.shape == (17, 2) and packed.dtype == np.uint32
        bits = (x >= 0)
        for w in range(2):
            for b in range(32):
                got = (packed[:, w] >> b) & 1
                np.testing.assert_array_equal(got, bits[:, 32 * w + b])

    def test_binarize_and_project_matches_separate(self, rng):
        """The fused query-side encoder (one shared centered matmul, one
        dispatch) must reproduce binarize + project_queries exactly."""
        from dirjax.ops.binary import binarize_and_project, project_queries

        x = rng.normal(size=(9, 64)).astype(np.float32)
        mean = rng.normal(size=64).astype(np.float32) * 0.1
        q_proj, _ = np.linalg.qr(rng.normal(size=(64, 64)))
        codec = BinaryCodec(mean=jnp.asarray(mean),
                            proj=jnp.asarray(q_proj, dtype=jnp.float32))
        packed, v = binarize_and_project(x, codec)
        np.testing.assert_array_equal(np.asarray(packed),
                                      np.asarray(binarize(x, codec)))
        np.testing.assert_array_equal(np.asarray(v),
                                      np.asarray(project_queries(x, codec)))

    def test_unpack_pm1_roundtrip(self, rng):
        codes = _rand_codes(rng, 5, 3)
        pm1 = np.asarray(unpack_pm1(jnp.asarray(codes)))
        assert pm1.shape == (5, 96) and set(np.unique(pm1)) <= {-1.0, 1.0}
        bits = ((pm1 + 1) / 2).astype(np.uint32)
        repacked = sum(bits[:, None, :].reshape(5, 3, 32)[..., b] << b
                       for b in range(32)).astype(np.uint32)
        np.testing.assert_array_equal(repacked, codes)

    def test_pad_for_search_is_idempotent(self, rng):
        codes = jnp.asarray(_rand_codes(rng, 300, 2))
        padded = pad_for_search(codes)
        assert padded.shape[0] % 128 == 0
        np.testing.assert_array_equal(np.asarray(pad_for_search(padded)),
                                      np.asarray(padded))


class TestHammingTopk:
    @pytest.mark.parametrize("n,block,chunk", [
        (1000, 128, 32768),     # single chunk, padded tail
        (1000, 16, 64),         # many chunks + many blocks
        (64, 128, 32768),       # db smaller than one block
    ])
    def test_values_match_oracle(self, rng, n, block, chunk):
        qp = jnp.asarray(_rand_codes(rng, 5, 2))
        dbp = _rand_codes(rng, n, 2)
        k = min(10, n)
        vals, idxs = hamming_topk(qp, jnp.asarray(dbp), k,
                                  block=block, chunk_rows=chunk)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        oracle = _oracle_sims(np.asarray(qp), dbp)
        expect = -np.sort(-oracle, axis=1)[:, :k]
        np.testing.assert_array_equal(vals.astype(np.int64), expect)
        # every returned index's score matches its returned value
        got = np.take_along_axis(oracle, idxs, axis=1)
        np.testing.assert_array_equal(got, vals.astype(np.int64))

    def test_n_valid_masks_tail_rows(self, rng):
        dbp = _rand_codes(rng, 200, 2)
        qp = jnp.asarray(dbp[:3])        # queries = rows -> dist 0 to self
        padded = pad_for_search(jnp.asarray(dbp))
        vals, idxs = hamming_topk(qp, padded, 150, n_valid=200)
        assert int(np.max(np.asarray(idxs))) < 200
        oracle = _oracle_sims(np.asarray(qp), dbp)
        expect = -np.sort(-oracle, axis=1)[:, :150]
        np.testing.assert_array_equal(np.asarray(vals).astype(np.int64),
                                      expect)

    def test_k_exceeding_rows_raises(self, rng):
        dbp = jnp.asarray(_rand_codes(rng, 50, 1))
        with pytest.raises(AssertionError):
            hamming_topk(dbp[:2], dbp, 51)


class TestHammingMxu:
    """The Pallas MXU unpack-matmul path (interpret mode off-TPU) must
    return the exact oracle VALUES — same contract as the scan."""

    @pytest.mark.parametrize("n,w,k", [
        (1000, 2, 10),       # ragged: 1000 valid rows in 1024-padded tiles
        (513, 2, 100),       # tail rows the hierarchy cannot address
        (4096, 16, 7),       # multi-tile, 512-bit codes
    ])
    def test_values_match_oracle(self, rng, n, w, k):
        from dirjax.ops.binary import bytes_for_search, hamming_topk_mxu

        qp = jnp.asarray(_rand_codes(rng, 5, w))
        dbp = _rand_codes(rng, n, w)
        vals, idxs = hamming_topk_mxu(qp, bytes_for_search(dbp), k,
                                      n_valid=n)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        oracle = _oracle_sims(np.asarray(qp), dbp)
        np.testing.assert_array_equal(vals.astype(np.int64),
                                      -np.sort(-oracle, axis=1)[:, :k])
        assert int(idxs.max()) < n
        got = np.take_along_axis(oracle, idxs, axis=1)
        np.testing.assert_array_equal(got, vals.astype(np.int64))

    def test_single_query_padded(self, rng):
        """nq < 8 pads to one sublane tile (Mosaic miscompiles sub-8-row
        dots — 'vector.broadcast' verification error, found on chip by
        the server warmup's nq=1 bucket, r4)."""
        from dirjax.ops.binary import bytes_for_search, hamming_topk_mxu

        dbp = _rand_codes(rng, 600, 4)
        qp = jnp.asarray(dbp[:1])
        vals, idxs = hamming_topk_mxu(qp, bytes_for_search(dbp), 5,
                                      n_valid=600)
        assert vals.shape == (1, 5) and int(vals[0, 0]) == 128
        oracle = _oracle_sims(np.asarray(qp), dbp)
        np.testing.assert_array_equal(
            np.asarray(vals[0]).astype(np.int64),
            -np.sort(-oracle[0])[:5])

    def test_byte_layout_scan_parity(self, rng):
        """The scan path accepts the byte layout (uint8 corpus + uint32
        queries auto-convert) and matches the uint32 result bit-for-bit —
        the single-chip BinaryIndex stores bytes and must be able to fall
        back to the scan off-TPU."""
        from dirjax.ops.binary import _to_bytes

        dbp = _rand_codes(rng, 300, 4)
        qp = jnp.asarray(_rand_codes(rng, 3, 4))
        v32, i32 = hamming_topk(qp, jnp.asarray(dbp), 20)
        v8, i8 = hamming_topk(qp, _to_bytes(jnp.asarray(dbp)), 20)
        np.testing.assert_array_equal(np.asarray(v32), np.asarray(v8))
        np.testing.assert_array_equal(np.asarray(i32), np.asarray(i8))
        # unpack_pm1 agrees across layouts (asym rescore relies on it)
        np.testing.assert_array_equal(
            np.asarray(unpack_pm1(jnp.asarray(dbp))),
            np.asarray(unpack_pm1(_to_bytes(jnp.asarray(dbp)))))


class TestITQ:
    def test_projection_is_orthonormal(self, rng):
        x = rng.normal(size=(400, 48)).astype(np.float32)
        codec = fit_itq(x, n_bits=32, iters=5)
        p = np.asarray(codec.proj)
        assert p.shape == (48, 32)
        np.testing.assert_allclose(p.T @ p, np.eye(32), atol=1e-4)

    def test_rotation_improves_itq_objective(self, rng):
        # Orthogonal rotations preserve ||V||_F, so minimizing the ITQ
        # loss ||sign(VR) - VR||^2 is exactly maximizing sum |VR|.
        # On anisotropic data the learned rotation must beat PCA-only.
        scales = np.linspace(3.0, 0.1, 32)
        x = (rng.normal(size=(600, 32)) * scales).astype(np.float32)

        def l1(codec):
            return float(np.abs(np.asarray(
                project_queries(x, codec))).sum())

        assert l1(fit_itq(x, n_bits=32, iters=20)) \
            > l1(fit_itq(x, n_bits=32, iters=0))

    def test_bad_n_bits_rejected(self, rng):
        x = rng.normal(size=(100, 64)).astype(np.float32)
        with pytest.raises(AssertionError):
            fit_itq(x, n_bits=40)       # not a multiple of 32
        with pytest.raises(AssertionError):
            fit_itq(x, n_bits=96)       # > dim

    def test_sample_caps_fit_rows(self, rng):
        x = rng.normal(size=(300, 32)).astype(np.float32)
        codec = fit_itq(x, iters=2, sample=64)
        assert codec.proj.shape == (32, 32)


@pytest.fixture
def clustered(rng):
    """800 rows in 20 clusters + cluster labels for query/db rows.

    64-bit codes CANNOT order same-cluster near-duplicates: the 800 rows
    collapse to ~54 distinct codes, so each query's top Hamming score ties
    across dozens of interchangeable rows. Ground truth for recall tests
    must therefore live at CLUSTER granularity — exact-index recall@10 has
    a ~0.25 information-theoretic ceiling on this fixture."""
    centers = rng.normal(size=(20, 64)).astype(np.float32)
    db_cls = rng.integers(0, 20, size=800)
    db = (centers[db_cls]
          + 0.15 * rng.normal(size=(800, 64)).astype(np.float32))
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    src = rng.choice(800, size=8, replace=False)
    q = db[src] + 0.05 * rng.normal(size=(8, 64)).astype(np.float32)
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    return (db.astype(np.float32), q.astype(np.float32),
            db_cls, db_cls[src])


def _recall(idxs, gt, k):
    hits = sum(len(set(map(int, r[:k])) & set(map(int, g[:k])))
               for r, g in zip(idxs, gt))
    return hits / (len(gt) * k)


def _cluster_recall(idxs, db_cls, q_cls):
    """Fraction of returned rows belonging to the query's true cluster —
    the granularity a 64-bit code can actually express (see fixture)."""
    hits = sum(int(db_cls[int(i)] == c) for row, c in zip(idxs, q_cls)
               for i in row)
    return hits / idxs.size


class TestBinaryIndex:
    def test_recall_and_asym_beats_symmetric(self, clustered):
        db, q, db_cls, q_cls = clustered
        _, gt = RetrievalIndex(db).search(q, k=10)
        sym = BinaryIndex(db, itq_iters=10, asym=False, sample=None)
        asym = BinaryIndex(db, itq_iters=10, asym=True, sample=None)
        _, i_sym = sym.search(q, k=10)
        _, i_asym = asym.search(q, k=10, rerank_factor=8)
        # cluster-granularity recall: 64-bit codes separate the 20
        # clusters cleanly even though they cannot order rows within one
        assert _cluster_recall(i_sym, db_cls, q_cls) > 0.9
        assert _cluster_recall(i_asym, db_cls, q_cls) > 0.9
        # fine-grained (exact-index) recall is tie-limited here. r5: asym
        # is now the EXACT top-k under the continuous score (not a
        # reorder of the symmetric shortlist), so pointwise >= vs the
        # float gt no longer holds structurally on tie-heavy 64-bit
        # codes — allow tie-luck noise but no systematic loss
        r_sym, r_asym = _recall(i_sym, gt, 10), _recall(i_asym, gt, 10)
        assert r_asym >= r_sym - 0.05, (r_sym, r_asym)

    def test_self_query_found(self, clustered):
        db = clustered[0]
        idx = BinaryIndex(db, itq_iters=5, sample=None)
        _, ids = idx.search(db[:6], k=5)
        # a row's own code is at Hamming distance 0 — it must surface
        # (near-duplicate cluster mates can tie it, hence top-5 not top-1)
        assert all(i in set(map(int, row)) for i, row in enumerate(ids))

    def test_keys_add_remove_compact(self, clustered):
        db, q = clustered[:2]
        keys = [f"img{i}" for i in range(len(db))]
        idx = BinaryIndex(db[:700], keys=keys[:700], itq_iters=3,
                          sample=None)
        idx.add(db[700:], keys=keys[700:])
        assert idx.n == 800
        vals, ids = idx.search(q, k=5)
        names = idx.lookup(ids)
        assert all(n1 == f"img{j}" for row, jrow in zip(names, ids)
                   for n1, j in zip(row, jrow))
        top = [int(r[0]) for r in ids]
        idx.remove(indices=top)
        v2, ids2 = idx.search(q, k=5, rerank_factor=200)
        assert not (set(map(int, ids2.ravel())) & set(top))
        mapping = idx.compact()
        assert idx.n == 800 - len(set(top))
        v3, ids3 = idx.search(q, k=5, rerank_factor=200)
        # compact() renumbers rows; duplicate codes make asym scores tie
        # exactly and lax.top_k tie-breaks by position, so pre/post result
        # *sets* may legitimately differ. Scores must be unchanged, rows
        # must map through `mapping`, and removed rows must stay gone.
        np.testing.assert_allclose(v3, v2, rtol=1e-6)
        removed_keys = {f"img{i}" for i in set(top)}
        names3 = idx.lookup(ids3)
        assert not ({n for row in names3 for n in row} & removed_keys)
        # every surviving pre-compact result whose renamed row is NOT in
        # the post-compact result must be score-tied with one that is
        renamed = {int(mapping[i]): float(v)
                   for i, v in zip(ids2.ravel(), v2.ravel()) if i >= 0}
        got3 = {int(i): float(v) for i, v in zip(ids3.ravel(), v3.ravel())}
        for i, v in renamed.items():
            if i not in got3:
                assert any(abs(v - w) <= 1e-6 * abs(v)
                           for w in got3.values()), (i, v)

    def test_save_load_roundtrip_and_dispatch(self, clustered, tmp_path):
        db, q = clustered[:2]
        idx = BinaryIndex(db, keys=[str(i) for i in range(len(db))],
                          itq_iters=3, sample=None)
        idx.remove(indices=[3, 7])
        path = os.path.join(tmp_path, "bin.npz")
        idx.save(path)
        back = RetrievalIndex.load(path)      # auto-dispatch
        assert isinstance(back, BinaryIndex)
        assert back.n == idx.n and back.n_removed == 2 and back.asym
        v1, i1 = idx.search(q, k=5)
        v2, i2 = back.search(q, k=5)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_array_equal(i1, i2)

    def test_single_query_and_k_guard(self, clustered):
        db, q = clustered[:2]
        idx = BinaryIndex(db, itq_iters=0, sample=None)
        vals, ids = idx.search(q[0], k=3)
        assert vals.shape == (1, 3)
        with pytest.raises(ValueError):
            idx.search(q, k=len(db) + 1)


class TestShardedBinary:
    """8-device virtual CPU mesh: the hamming tier's SPMD path."""

    @pytest.fixture
    def mesh(self):
        import jax

        from dirjax.parallel import make_mesh
        return make_mesh(data=1, db=8, devices=jax.devices()[:8])

    def test_sym_values_match_single_device(self, rng, mesh):
        from dirjax.parallel import shard_codes_binary, sharded_hamming_topk

        dbp = _rand_codes(rng, 999, 2)        # ragged: pads to 8*128
        qp = jnp.asarray(_rand_codes(rng, 5, 2))
        codes_sh, n = shard_codes_binary(jnp.asarray(dbp), mesh)
        vals, idxs = sharded_hamming_topk(qp, codes_sh, 12, mesh, n)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        oracle = _oracle_sims(np.asarray(qp), dbp)
        expect = -np.sort(-oracle, axis=1)[:, :12]
        np.testing.assert_array_equal(vals.astype(np.int64), expect)
        assert int(idxs.max()) < 999
        got = np.take_along_axis(oracle, idxs, axis=1)
        np.testing.assert_array_equal(got, vals.astype(np.int64))

    def test_asym_full_rerank_matches_exact_rescore(self, clustered, mesh):
        """rerank deep enough to cover every shard row -> the merged asym
        top-k must equal the brute-force asymmetric scores."""
        from dirjax.ops.binary import (binarize, fit_itq, project_queries,
                                       unpack_pm1)
        from dirjax.parallel import shard_codes_binary, sharded_hamming_topk

        db, q = clustered[:2]
        codec = fit_itq(db, iters=3, sample=None)
        codes = binarize(db, codec)
        codes_sh, n = shard_codes_binary(codes, mesh)
        vq = project_queries(q, codec)
        qp = binarize(jnp.asarray(q), codec)
        vals, idxs = sharded_hamming_topk(qp, codes_sh, 10, mesh, n,
                                          vq=vq, rerank_factor=100)
        vals, idxs = np.asarray(vals), np.asarray(idxs)
        full = np.asarray(vq) @ np.asarray(unpack_pm1(codes)).T
        np.testing.assert_allclose(vals, -np.sort(-full, axis=1)[:, :10],
                                   rtol=1e-5)
        got = np.take_along_axis(full, idxs, axis=1)
        np.testing.assert_allclose(got, vals, rtol=1e-5)

    def test_binary_index_mesh_matches_single(self, clustered, mesh):
        db, q = clustered[:2]
        single = BinaryIndex(db, itq_iters=3, sample=None, seed=1)
        shard = BinaryIndex(db, itq_iters=3, sample=None, seed=1, mesh=mesh)
        sv, _ = single.search(q, k=7, rerank_factor=100)
        mv, mi = shard.search(q, k=7, rerank_factor=100)
        # deep mesh rerank -> the same top score set, up to arithmetic:
        # single-chip asym scores are bf16-input/f32-accumulate (r5),
        # the mesh rescore einsum is fp32 HIGHEST
        np.testing.assert_allclose(sv, mv, rtol=5e-3)
        assert int(np.asarray(mi).max()) < len(db)

    def test_mesh_add_remove_compact(self, clustered, mesh):
        db, q = clustered[:2]
        idx = BinaryIndex(db[:500], itq_iters=2, sample=None, mesh=mesh)
        idx.add(db[500:])
        assert idx.n == 800
        _, ids = idx.search(q, k=5)
        top = [int(r[0]) for r in ids]
        idx.remove(indices=top)
        idx.compact()
        assert idx.n == 800 - len(set(top))
        v, i = idx.search(q, k=5, rerank_factor=200)
        assert int(np.asarray(i).max()) < idx.n


class TestTuning:
    def test_tune_single_chip_asym_has_no_knob(self, clustered):
        """r5: single-chip asym search is exact under its score — the
        tuner measures it once instead of sweeping rerank_factor."""
        from dirjax.tuning import tune

        db, q = clustered[:2]
        idx = BinaryIndex(db, itq_iters=5, sample=None)
        res = tune(idx, q, k=5, target=0.6, descriptors=db)
        assert res.trials == [(dict(), res.trials[0][1])]
        assert res.met == (res.recall >= 0.6)

    def test_tune_sweeps_rerank_factor_on_mesh(self, clustered):
        from dirjax.tuning import tune

        import jax

        from dirjax.parallel import make_mesh

        db, q = clustered[:2]
        mesh = make_mesh(data=1, db=8, devices=jax.devices()[:8])
        idx = BinaryIndex(db, itq_iters=5, sample=None, mesh=mesh)
        res = tune(idx, q, k=5, target=0.6, descriptors=db)
        assert res.trials and "rerank_factor" in res.trials[0][0]
        assert res.met == (res.recall >= 0.6)

    def test_tune_symmetric_has_no_knob(self, clustered):
        from dirjax.tuning import tune

        db, q = clustered[:2]
        idx = BinaryIndex(db, itq_iters=5, asym=False, sample=None)
        res = tune(idx, q, k=5, target=2.0, descriptors=db)  # unmeetable
        assert [p for p, _ in res.trials] == [{}]
        assert not res.met


class TestCLI:
    def test_build_query_binary(self, clustered, tmp_path):
        from dirjax.cli.index import main

        db, q = clustered[:2]
        np.save(tmp_path / "db.npy", db)
        np.save(tmp_path / "q.npy", q)
        keys = tmp_path / "keys.txt"
        keys.write_text("".join(f"img{i}\n" for i in range(len(db))))
        out = str(tmp_path / "bin.npz")
        main(["build", "--descs", str(tmp_path / "db.npy"),
              "--keys", str(keys), "--binary", "-1",
              "--out", out, "--gpu", "-1"])
        res = main(["query", "--index", out,
                    "--descs", str(tmp_path / "q.npy"), "-k", "3",
                    "--gpu", "-1"])
        assert len(res["keys"]) == len(q)
        assert all(len(row) >= 3 for row in res["indices"])

    def test_conflicting_storage_flags_rejected(self, clustered, tmp_path):
        from dirjax.cli.index import main

        db = clustered[0]
        np.save(tmp_path / "db.npy", db)
        out = str(tmp_path / "idx.npz")
        for flags in (["--binary", "64", "--int8"],
                      ["--binary", "64", "--pq", "8"],
                      ["--pq", "8", "--int8"],
                      ["--ivf", "4", "--int8"]):
            with pytest.raises(SystemExit, match="conflicting"):
                main(["build", "--descs", str(tmp_path / "db.npy"),
                      "--out", out, "--gpu", "-1"] + flags)

    def test_aqe_rejected_on_binary(self, clustered, tmp_path):
        from dirjax.cli.index import main

        db, q = clustered[:2]
        np.save(tmp_path / "db.npy", db)
        np.save(tmp_path / "q.npy", q)
        out = str(tmp_path / "bin.npz")
        main(["build", "--descs", str(tmp_path / "db.npy"),
              "--binary", "64", "--out", out, "--gpu", "-1"])
        with pytest.raises(SystemExit):
            main(["query", "--index", out, "--descs",
                  str(tmp_path / "q.npy"), "--aqe", "3", "2",
                  "--gpu", "-1"])


class TestFusedSearch:
    """r5: the ONE-dispatch search (encode -> top-k). Symmetric mode must
    reproduce the staged pipeline exactly on both ranking backends;
    asymmetric mode is the EXACT top-k under the continuous-query score
    (bf16-input/f32-accumulate) — graded against a brute-force oracle,
    with MXU-interpret and XLA-fallback paths agreeing with each other."""

    def _corpus(self, rng, n=900, d=64, bits=32):
        db = rng.normal(size=(n, d)).astype(np.float32)
        q = rng.normal(size=(5, d)).astype(np.float32)
        codec = fit_itq(db, bits, iters=3)
        from dirjax.ops.binary import binarize, bytes_for_search

        return db, q, codec, bytes_for_search(binarize(db, codec))

    @pytest.mark.parametrize("mxu", [True, False])
    def test_fused_sym_matches_staged(self, rng, mxu):
        from dirjax.ops.binary import (hamming_search_fused, hamming_topk,
                                       hamming_topk_mxu,
                                       binarize_and_project)

        n, k = 900, 9
        db, q, codec, dbb = self._corpus(rng, n=n)
        v1, i1 = hamming_search_fused(q, codec, dbb, k, n_valid=n,
                                      asym=False, use_mxu=mxu,
                                      interpret=True)
        qp, _ = binarize_and_project(jnp.asarray(q), codec)
        rank = hamming_topk_mxu if mxu else hamming_topk
        v2, i2 = rank(qp, dbb, k, n_valid=n)
        np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_fused_asym_matches_oracle(self, rng):
        """Asym top-k vs the brute-force continuous-query oracle: the
        returned values must equal the oracle scores OF the returned
        rows (bf16 tolerance), and the selected set must match the
        fp32 oracle's top-k wherever the margin exceeds bf16 noise."""
        from dirjax.ops.binary import (hamming_search_fused, project_queries,
                                       unpack_pm1)

        n, k = 900, 9
        db, q, codec, dbb = self._corpus(rng, n=n)
        vq = np.asarray(project_queries(q, codec))
        pm1 = np.asarray(unpack_pm1(jnp.asarray(dbb[:n])))
        oracle = vq @ pm1.T                          # (5, n) fp32
        for mxu in (True, False):
            v, i = hamming_search_fused(q, codec, dbb, k, n_valid=n,
                                        asym=True, use_mxu=mxu,
                                        interpret=True)
            v, i = np.asarray(v), np.asarray(i)
            got = np.take_along_axis(oracle, i, axis=1)
            # returned values are the (bf16-input) scores of those rows
            np.testing.assert_allclose(v, got, rtol=2e-2, atol=0.5)
            # the k-th..(k+1)-th oracle gap bounds which ranks bf16 can
            # legally swap; with a clear margin the sets must agree
            top = np.argsort(-oracle, axis=1)
            for r in range(len(q)):
                margin = oracle[r, top[r, k - 1]] - oracle[r, top[r, k]]
                if margin > 0.2:   # far above bf16 rounding at these norms
                    assert set(i[r]) == set(top[r, :k].tolist())

    def test_fused_asym_backends_agree(self, rng):
        from dirjax.ops.binary import hamming_search_fused

        n, k = 1100, 7
        db, q, codec, dbb = self._corpus(rng, n=n, bits=32)
        v1, i1 = hamming_search_fused(q, codec, dbb, k, n_valid=n,
                                      asym=True, use_mxu=True,
                                      interpret=True)
        v2, i2 = hamming_search_fused(q, codec, dbb, k, n_valid=n,
                                      asym=True, use_mxu=False,
                                      interpret=True)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-3, atol=1e-3)

    def test_fused_single_query(self, rng):
        from dirjax.ops.binary import (bytes_for_search, binarize,
                                       hamming_search_fused)

        n, d = 400, 32
        db = rng.normal(size=(n, d)).astype(np.float32)
        codec = fit_itq(db, 32, iters=2)
        dbb = bytes_for_search(binarize(db, codec))
        for asym in (False, True):
            v, i = hamming_search_fused(db[:1], codec, dbb, 3,
                                        n_valid=n, asym=asym,
                                        use_mxu=True, interpret=True)
            assert v.shape == (1, 3) and int(i[0, 0]) == 0  # self-match
