"""Regression tests for the round-3 fixes (VERDICT.md / ADVICE.md round 2).

Covers:
* deploy() manifest rewrite over an existing cache stays a single valid
  JSON document (the 'a+'/O_APPEND concatenation bug, ADVICE r2 high);
* evaluate_val_loss works for the triplet loss family (VERDICT weak #1);
* ShardedExtractor survives the extraction pipeline's OOM fallback
  (call_adaptive, VERDICT weak #4);
* make_multihost_mesh default branch + process-grouped layout
  (VERDICT weak #5);
* RetrievalIndex.add keeps keys/db consistent when the swap fails
  (ADVICE r2 low);
* the native loader fast path enforces the same Missing-field contract
  as the PIL path (ADVICE r2 low).
"""

import json
import os

import jax
import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.parallel.mesh import make_mesh, make_multihost_mesh, \
    multihost_layout


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    return D.Synthetic(str(tmp_path_factory.mktemp("synth_r3")),
                       revisited=True)


class TestDeployManifest:
    def test_incremental_deploy_keeps_manifest_valid(self, synth, tmp_path):
        cache = str(tmp_path / "cache")
        D.deploy(synth, cache)
        manifest = os.path.join(cache, "imsizes.json")
        first = json.load(open(manifest))
        assert len(first) == len(synth)
        # a second deploy that rewrites the manifest (redo forces
        # updated > 0) must REPLACE the JSON document, not append a second
        # one after it (the O_APPEND bug made json.load fail here)
        D.deploy(synth, cache, redo=True)
        second = json.load(open(manifest))
        assert second == first
        # and a third deploy reads the manifest instead of re-deploying
        deployed = D.deploy(synth, cache)
        assert deployed.imsizes == {k: tuple(v) for k, v in second.items()}


class TestTripletValLoss:
    @pytest.fixture(scope="class")
    def labeled(self, tmp_path_factory):
        from PIL import Image

        root = str(tmp_path_factory.mktemp("valtriplet"))
        rng = np.random.default_rng(0)
        rows = []
        for i in range(8):
            cls = i % 2
            base = np.zeros((48, 48, 3), np.uint8)
            base[..., cls] = 130
            noise = rng.integers(0, 50, size=base.shape, dtype=np.uint8)
            Image.fromarray(base + noise).save(f"{root}/img{i}.jpg")
            rows.append(f"img{i}.jpg c{cls}")
        open(f"{root}/train.txt", "w").write("\n".join(rows))
        return D.ImageListLabels(f"{root}/train.txt", root=root)

    @pytest.mark.parametrize("loss", ["triplet", "tripletlogexp", "ap"])
    def test_val_loss_all_losses(self, labeled, loss):
        from dirjax.models import create_model
        from dirjax.train import TrainConfig, evaluate_val_loss

        cfg = TrainConfig(arch="resnet18_rmac", out_dim=16, loss=loss,
                          nq=5, batch_size=8, image_size=32, threads=2)
        model = create_model(cfg.arch, out_dim=cfg.out_dim)
        params = model.init(jax.random.PRNGKey(0))
        # crashed at trace time for the triplet family before round 3
        val = evaluate_val_loss(model, params, cfg, labeled)
        assert np.isfinite(val)


class TestShardedExtractorAdaptive:
    def test_call_adaptive_matches_call(self):
        from dirjax.models import create_model
        from dirjax.parallel.extraction import ShardedExtractor

        model = create_model("resnet18_rmac", out_dim=16)
        params = model.init(jax.random.PRNGKey(0))
        mesh = make_mesh()
        ext = ShardedExtractor(model, params, mesh)
        imgs = np.random.default_rng(0).standard_normal(
            (3, 40, 40, 3)).astype(np.float32)
        ref = np.asarray(ext(imgs))
        out = ext.call_adaptive(imgs)
        np.testing.assert_allclose(out, ref, rtol=1e-6)

    def test_flush_oom_fallback_ducktyped(self, monkeypatch):
        """extract_image_features' OOM retry path must work for extractors
        without their own call_adaptive (pure duck-typing)."""
        from dirjax.extraction import adaptive_call

        calls = []

        class Tiny:
            def __call__(self, images, mask=None):
                calls.append(len(images))
                if len(images) > 1:
                    raise RuntimeError("RESOURCE_EXHAUSTED: fake oom")
                return np.full((1, 4), float(images[0, 0, 0, 0]), np.float32)

        imgs = np.arange(4, dtype=np.float32).reshape(4, 1, 1, 1)
        out = adaptive_call(Tiny(), imgs)
        assert out.shape == (4, 4)
        np.testing.assert_array_equal(out[:, 0], [0, 1, 2, 3])
        assert 1 in calls and max(calls) == 4  # actually recursed


class _FakeDev:
    def __init__(self, pid, did):
        self.process_index = pid
        self.id = did

    def __repr__(self):
        return f"dev(p{self.process_index},d{self.id})"


class TestMultihostMesh:
    def test_default_uses_local_device_count(self):
        # no explicit devices: db_per_host = jax.local_device_count()
        # (this branch was dead before round 3)
        mesh = make_multihost_mesh()
        assert mesh.shape["db"] == jax.local_device_count()
        assert mesh.shape["data"] == 1

    def test_explicit_devices_infer_per_host(self):
        mesh = make_multihost_mesh(devices=jax.devices()[:4])
        assert mesh.shape["db"] == 4

    def test_layout_groups_by_process(self):
        devs = [_FakeDev(pid, did) for pid in (1, 0) for did in (3, 1, 2, 0)]
        arr = multihost_layout(devs, 4)
        assert arr.shape == (2, 4)
        # rows = hosts in process order; within a row, id order
        assert [[d.process_index for d in row] for row in arr] \
            == [[0] * 4, [1] * 4]
        assert [d.id for d in arr[0]] == [0, 1, 2, 3]

    def test_layout_rejects_host_straddling_rows(self):
        devs = [_FakeDev(pid, did) for pid in (0, 1) for did in range(3)]
        with pytest.raises(AssertionError):
            multihost_layout(devs, 2)  # 6 devices, rows of 2 straddle hosts


class TestServingAddConsistency:
    def test_keys_untouched_when_add_fails(self, monkeypatch):
        import dirjax.serving as serving

        rng = np.random.default_rng(0)
        db = rng.standard_normal((16, 8)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)  # self-match top-1
        idx = serving.RetrievalIndex(db, keys=[f"k{i}" for i in range(16)],
                                     dtype=np.float32)

        def boom(*a, **k):
            raise RuntimeError("RESOURCE_EXHAUSTED: fake")

        monkeypatch.setattr(serving.jnp, "concatenate", boom)
        with pytest.raises(RuntimeError):
            idx.add(rng.standard_normal((2, 8)).astype(np.float32),
                    keys=["a", "b"])
        monkeypatch.undo()
        assert len(idx.keys) == 16 and idx.n == 16  # no skew
        # and the index still works after the failed add
        vals, ids = idx.search(db[:2], k=1)
        assert list(ids[:, 0]) == [0, 1]


class TestShardedStreamingTopk:
    """sharded_topk(stream=True): per-shard row-chunk streaming with a
    running top-k — bounded shard memory (never an (nq, Nd_shard) score
    matrix), same answers as the dense per-shard path."""

    def _data(self, n=1000, d=32, nq=6):
        rng = np.random.default_rng(7)
        db = rng.standard_normal((n, d)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        q = rng.standard_normal((nq, d)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        return q, db

    def test_stream_matches_dense(self, monkeypatch):
        import jax.numpy as jnp

        import dirjax.parallel.ranking as pr

        monkeypatch.setattr(pr, "_STREAM_CHUNK", 16)  # force many chunks
        q, db = self._data()
        mesh = make_mesh(1, 8)
        dbs, n = pr.shard_database(jnp.asarray(db), mesh)
        vd, idd = pr.sharded_topk(q, dbs, 10, mesh, n, stream=False)
        vs, ids = pr.sharded_topk(q, dbs, 10, mesh, n, stream=True)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(idd))
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd),
                                   rtol=1e-6, atol=1e-7)

    def test_sharded_full_int8_matches_oracle(self):
        """quantize_queries on the sharded path == dense full-int8 oracle
        (int32 accumulation, db + query scales on the values)."""
        import jax.numpy as jnp

        import dirjax.parallel.ranking as pr
        from dirjax.ops.topk_pallas import _quantize_block

        q, db = self._data(n=500)
        mesh = make_mesh(1, 8)
        db8, scales, n = pr.shard_database_quantized(jnp.asarray(db), mesh)
        vals, idxs = pr.sharded_topk(q, db8, 7, mesh, n, db_scales=scales,
                                     quantize_queries=True)
        q8, qs = _quantize_block(jnp.asarray(q))
        db8_h = np.asarray(db8[:n], np.int64)
        dense = (np.asarray(q8, np.int64) @ db8_h.T).astype(np.float32) \
            * np.asarray(scales)[:, :n] * np.asarray(qs)[:, None]
        want = np.argsort(-dense, axis=1)[:, :7]
        np.testing.assert_array_equal(np.asarray(idxs), want)
        got = np.take_along_axis(dense, np.asarray(idxs), axis=1)
        np.testing.assert_allclose(np.asarray(vals), got, rtol=1e-5,
                                   atol=1e-6)

    def test_stream_int8_matches_dense(self, monkeypatch):
        import jax.numpy as jnp

        import dirjax.parallel.ranking as pr

        monkeypatch.setattr(pr, "_STREAM_CHUNK", 32)
        q, db = self._data(n=777)   # ragged shards + ragged chunks
        mesh = make_mesh(1, 8)
        db8, scales, n = pr.shard_database_quantized(jnp.asarray(db), mesh)
        vd, idd = pr.sharded_topk(q, db8, 7, mesh, n, db_scales=scales,
                                  stream=False)
        vs, ids = pr.sharded_topk(q, db8, 7, mesh, n, db_scales=scales,
                                  stream=True)
        np.testing.assert_array_equal(np.asarray(ids), np.asarray(idd))
        np.testing.assert_allclose(np.asarray(vs), np.asarray(vd),
                                   rtol=1e-5, atol=1e-6)


class TestChunkedExactEval:
    def test_chunked_scores_match_dense_map(self, synth, tmp_path):
        """eval_model with chunked scoring (bounded HBM for >1GB databases)
        must produce bit-identical mAP to the dense path — junk-aware
        protocols get full rows either way, just assembled in chunks."""
        from dirjax.extraction import FeatureExtractor, eval_model
        from dirjax.models import create_model

        model = create_model("resnet18_rmac", out_dim=16)
        params = model.init(jax.random.PRNGKey(0))
        ex = FeatureExtractor(model, params)
        feats = str(tmp_path / "feats")
        dense = eval_model(synth, ex, "Scale(48)", threads=2,
                           score_chunk=0, save_feats=feats)
        chunked = eval_model(synth, ex, "Scale(48)", threads=2,
                             score_chunk=7, load_feats=feats)
        for key in dense:
            np.testing.assert_allclose(chunked[key], dense[key], atol=1e-7)


class TestNativeFastPathContract:
    def test_missing_field_raises_same_as_pil(self, tmp_path):
        from dirjax.data import native
        from dirjax.data.loader import get_loader

        if not native.available():
            pytest.skip("native lib not built")
        from PIL import Image

        Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(
            str(tmp_path / "x.jpg"))
        (tmp_path / "list.txt").write_text("x.jpg\n")
        ds = D.ImageList(str(tmp_path / "list.txt"), root=str(tmp_path))
        loader = get_loader(ds, trf_chain="", output=("img", "label"),
                            totensor=True)
        assert loader._native_fast_path() is not None
        with pytest.raises(AssertionError, match="Missing field"):
            loader[0]
        # PIL path behaves identically
        loader_pil = get_loader(ds, trf_chain="", output=("img", "label"),
                                totensor=True, native_decode=False)
        with pytest.raises(AssertionError, match="Missing field"):
            loader_pil[0]
