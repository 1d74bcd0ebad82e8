"""Sharding tests on the 8-device virtual CPU mesh: sharded extraction,
database-sharded ranking + AQE, and the DP+TP train step."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dirjax.parallel as par
from dirjax.models import create_model


@pytest.fixture(scope="module")
def devices8():
    assert jax.device_count() >= 8, "conftest must provide 8 virtual devices"
    return jax.devices()[:8]


class TestMesh:
    def test_make_mesh_default(self, devices8):
        mesh = par.make_mesh(devices=devices8)
        assert mesh.shape == {"data": 8, "db": 1}

    def test_make_mesh_2d(self, devices8):
        mesh = par.make_mesh(data=2, db=4, devices=devices8)
        assert mesh.shape == {"data": 2, "db": 4}

    def test_bad_factorization(self, devices8):
        with pytest.raises(AssertionError):
            par.make_mesh(data=3, db=3, devices=devices8)


class TestShardedRanking:
    @pytest.fixture(scope="class")
    def mesh(self, devices8):
        return par.make_mesh(data=1, db=8, devices=devices8)

    def test_topk_matches_dense(self, mesh, rng):
        q = rng.normal(size=(6, 64)).astype(np.float32)
        db = rng.normal(size=(101, 64)).astype(np.float32)  # not divisible by 8
        db_sh, n = par.shard_database(db, mesh)
        assert n == 101
        vals, idxs = par.sharded_topk(jnp.asarray(q), db_sh, 7, mesh, n)
        want_idx = (-(q @ db.T)).argsort(axis=1)[:, :7]
        np.testing.assert_array_equal(np.asarray(idxs), want_idx)

    def test_scores_match_dense(self, mesh, rng):
        q = rng.normal(size=(3, 32)).astype(np.float32)
        db = rng.normal(size=(50, 32)).astype(np.float32)
        db_sh, n = par.shard_database(db, mesh)
        scores = np.asarray(par.sharded_scores(jnp.asarray(q), db_sh, mesh, n))
        np.testing.assert_allclose(scores, q @ db.T, rtol=1e-5, atol=1e-6)

    def test_sharded_aqe_matches_single_device(self, mesh, rng):
        from dirjax.ops import expand_queries

        q = rng.normal(size=(4, 32)).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        db = rng.normal(size=(64, 32)).astype(np.float32)
        db /= np.linalg.norm(db, axis=1, keepdims=True)
        db_sh, n = par.shard_database(db, mesh)
        ours = np.asarray(par.sharded_aqe(jnp.asarray(q), db_sh, mesh, n,
                                          alpha=3, k=5))
        want = np.asarray(expand_queries(q, db, alpha=3, k=5))
        np.testing.assert_allclose(ours, want, rtol=1e-4, atol=1e-5)


class TestShardedExtraction:
    def test_matches_single_device(self, devices8, rng):
        mesh = par.make_mesh(data=8, db=1, devices=devices8)
        model = create_model("resnet18_rmac", out_dim=64)
        params = model.init(jax.random.PRNGKey(0))
        ex = par.ShardedExtractor(model, params, mesh)
        x = rng.normal(size=(5, 64, 64, 3)).astype(np.float32)  # pads to 8
        sharded = np.asarray(ex(x))
        single = np.asarray(model.apply(params, jnp.asarray(x)))
        assert sharded.shape == (5, 64)
        np.testing.assert_allclose(sharded, single, rtol=1e-4, atol=1e-5)


class TestShardedTrainStep:
    def test_dp_tp_step_runs_and_improves(self, devices8, rng):
        from dirjax.train import (TrainConfig, make_optimizer,
                                  make_sharded_train_step)

        mesh = par.make_mesh(data=4, db=2, devices=devices8)
        cfg = TrainConfig(arch="resnet18_rmac", out_dim=64, batch_size=8,
                          nq=10, learning_rate=1e-3)
        model = create_model(cfg.arch, out_dim=cfg.out_dim)
        params = model.init(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, params)
        opt_state = tx.init(params)
        step, shard_args = make_sharded_train_step(model, cfg, tx, mesh)

        images = rng.normal(size=(8, 64, 64, 3)).astype(np.float32)
        labels = np.asarray([0, 0, 1, 1, 2, 2, 3, 3], np.int32)
        params, opt_state, images_d, labels_d = shard_args(
            params, opt_state, jnp.asarray(images), jnp.asarray(labels))
        losses = []
        for _ in range(3):
            params, opt_state, loss = step(params, opt_state, images_d, labels_d)
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]  # overfits the fixed batch

    def test_bn_frozen(self, rng):
        from dirjax.train import TrainConfig, make_optimizer, make_train_step

        cfg = TrainConfig(arch="resnet18_rmac", out_dim=32, nq=10,
                          learning_rate=1e-2, freeze_bn=True)
        model = create_model(cfg.arch, out_dim=cfg.out_dim)
        params = model.init(jax.random.PRNGKey(0))
        tx = make_optimizer(cfg, params)
        opt_state = tx.init(params)
        step = make_train_step(model, cfg, tx)
        images = rng.normal(size=(4, 64, 64, 3)).astype(np.float32)
        labels = jnp.asarray([0, 0, 1, 1])
        bn_before = np.asarray(params["backbone"]["stem"]["bn"]["scale"])
        fc_before = np.asarray(params["fc"]["kernel"])
        params2, _, _ = step(params, opt_state, jnp.asarray(images), labels)
        np.testing.assert_array_equal(
            np.asarray(params2["backbone"]["stem"]["bn"]["scale"]), bn_before)
        assert not np.allclose(np.asarray(params2["fc"]["kernel"]), fc_before)


class TestShardedUint8:
    def test_uint8_matches_float(self, devices8, rng):
        mesh = par.make_mesh(data=8, db=1, devices=devices8)
        model = create_model("resnet18_rmac", out_dim=32)
        params = model.init(jax.random.PRNGKey(0))
        ex = par.ShardedExtractor(model, params, mesh)
        u8 = rng.integers(0, 255, size=(3, 64, 64, 3), dtype=np.uint8)
        # float path applies the same (x/255 - mean)/std on host
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        fl = (u8.astype(np.float32) / 255.0 - mean) / std
        np.testing.assert_allclose(np.asarray(ex(u8)), np.asarray(ex(fl)),
                                   rtol=1e-4, atol=1e-5)


class TestShardedEvalModel:
    def test_sharded_extractor_drops_into_eval(self, devices8, tmp_path, rng):
        """ShardedExtractor shares FeatureExtractor's call signature, so the
        whole benchmark evaluation can run SPMD unchanged."""
        import dirjax.datasets as D
        from dirjax.extraction import FeatureExtractor, eval_model

        synth = D.Synthetic(str(tmp_path / "s"), revisited=True)
        mesh = par.make_mesh(data=8, db=1, devices=devices8)
        model = create_model("resnet18_rmac", out_dim=32)
        params = model.init(jax.random.PRNGKey(0))
        sharded = par.ShardedExtractor(model, params, mesh)
        single = FeatureExtractor(model, params)
        res_sh = eval_model(synth, sharded, "")
        res_si = eval_model(synth, single, "")
        for mode in ("easy", "medium", "hard"):
            assert res_sh[f"mAP-{mode}"] == pytest.approx(
                res_si[f"mAP-{mode}"], abs=1e-4)


def test_multihost_mesh_layout():
    """make_multihost_mesh: 'db' rows are ICI-adjacent (same process),
    'data' spans processes; full pipeline runs on the resulting mesh. On
    the single-process CPU harness every device shares process_index, so
    db_per_host must be explicit."""
    import numpy as np

    from dirjax.parallel import make_multihost_mesh, shard_database, sharded_topk
    from dirjax.parallel.mesh import make_mesh

    mesh = make_multihost_mesh(db_per_host=4)
    assert dict(mesh.shape) == {"data": 2, "db": 4}
    # each "host row" holds consecutive device ids (the ICI-adjacent sort)
    ids = np.array([[d.id for d in row] for row in mesh.devices])
    assert (np.diff(ids, axis=1) == 1).all()

    rng = np.random.default_rng(0)
    db = rng.normal(size=(33, 16)).astype(np.float32)
    db /= np.linalg.norm(db, axis=1, keepdims=True)
    db_sh, n = shard_database(db, mesh)
    v, i = sharded_topk(db[:3], db_sh, 4, mesh, n)
    assert np.array_equal(np.asarray(i)[:, 0], np.arange(3))
    # equality with the plain mesh layout
    mesh2 = make_mesh(data=2, db=4)
    db_sh2, n2 = shard_database(db, mesh2)
    v2, i2 = sharded_topk(db[:3], db_sh2, 4, mesh2, n2)
    assert np.array_equal(np.asarray(i), np.asarray(i2))
