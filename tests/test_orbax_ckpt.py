"""Orbax sharded/async training checkpoints (dirjax/utils/orbax_ckpt.py).

Contracts under test: save/restore round-trips params AND optimizer
state exactly (incl. optax NamedTuple structure), sharded leaves restore
ONTO their NamedSharding from the abstract template, retention keeps
only max_to_keep steps, and ``fit(ckpt_format="orbax")`` resumes
epoch-exact like the npz path does."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dirjax.parallel import make_mesh
from dirjax.utils.orbax_ckpt import TrainCheckpointer, is_orbax_dir


# same tiny recipe as test_train_extra.CFG (kept local: test modules
# here are top-level, not a package)
CFG = dict(arch="resnet18_rmac", out_dim=32, batch_size=6, nq=10,
           learning_rate=3e-4, image_size=64,
           trfs="RandomScale(64,72), RandomCrop(64), RandomFlip()")


def tree_equal(a, b):
    return all(jax.tree.leaves(jax.tree.map(
        lambda x, y: bool(np.array_equal(np.asarray(x), np.asarray(y))),
        a, b)))


class TestTrainCheckpointer:
    def test_roundtrip_params_opt_extra(self, tmp_path):
        params = {"conv": {"w": jnp.arange(12.0).reshape(3, 4)},
                  "fc": jnp.ones((4,), jnp.bfloat16)}
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)
        with TrainCheckpointer(str(tmp_path / "ck")) as ck:
            ck.save(0, params, opt_state,
                    extra={"epoch": 0, "best": 0.25, "arch": "r18"})
            ck.wait()
            # templates may be the live trees themselves
            p2, o2, ex = ck.restore(params, opt_state)
        assert tree_equal(p2, params) and tree_equal(o2, opt_state)
        assert type(o2) is type(opt_state)       # optax tuple structure
        assert p2["fc"].dtype == jnp.bfloat16
        assert ex == {"epoch": 0, "best": 0.25, "arch": "r18"}
        assert is_orbax_dir(str(tmp_path / "ck"))
        assert not is_orbax_dir(str(tmp_path))

    def test_sharded_restore_lands_on_mesh(self, tmp_path):
        mesh = make_mesh(4, 2)
        sh = NamedSharding(mesh, P(None, "db"))
        w = jax.device_put(jnp.arange(64.0).reshape(8, 8), sh)
        with TrainCheckpointer(str(tmp_path / "ck"),
                               async_save=False) as ck:
            ck.save(0, {"w": w})
            # template carries the sharding -> restore places shards
            p2, _, _ = ck.restore({"w": w})
        assert p2["w"].sharding.is_equivalent_to(sh, 2)
        np.testing.assert_array_equal(np.asarray(p2["w"]), np.asarray(w))

    def test_retention_and_latest(self, tmp_path):
        with TrainCheckpointer(str(tmp_path / "ck"), max_to_keep=2) as ck:
            for step in range(4):
                ck.save(step, {"w": jnp.full((2,), float(step))})
            ck.wait()
            assert ck.latest_step() == 3
            assert list(ck.all_steps()) == [2, 3]
            p, _, ex = ck.restore({"w": jnp.zeros((2,))}, step=2)
        np.testing.assert_array_equal(np.asarray(p["w"]), [2.0, 2.0])
        assert ex == {}

    def test_restore_empty_dir_raises(self, tmp_path):
        with TrainCheckpointer(str(tmp_path / "ck")) as ck:
            with pytest.raises(FileNotFoundError, match="no checkpoint"):
                ck.restore({"w": jnp.zeros(2)})


class TestFitOrbax:
    def test_fit_orbax_resume_matches_npz_semantics(self, tmp_path):
        from dirjax.train import TrainConfig, fit
        import dirjax.datasets as D
        from PIL import Image

        root = str(tmp_path / "data")
        import os

        os.makedirs(root)
        rng = np.random.default_rng(0)
        rows = []
        for i in range(12):
            cls = i % 3
            base = np.zeros((72, 72, 3), np.uint8)
            base[..., cls] = 120
            noise = rng.integers(0, 60, size=base.shape, dtype=np.uint8)
            Image.fromarray(base + noise).save(f"{root}/img{i}.jpg")
            rows.append(f"img{i}.jpg c{cls}")
        open(f"{root}/train.txt", "w").write("\n".join(rows))
        labeled = D.ImageListLabels(f"{root}/train.txt", root=root)

        out = str(tmp_path / "run")
        cfg = TrainConfig(epochs=1, **CFG)
        fit(labeled, cfg, out_dir=out, steps_per_epoch=2,
            ckpt_format="orbax")
        ckdir = out + "/orbax"
        assert is_orbax_dir(ckdir)

        cfg2 = TrainConfig(epochs=3, **CFG)
        _, _, hist = fit(labeled, cfg2, out_dir=out, steps_per_epoch=2,
                         ckpt_format="orbax", resume=ckdir)
        # resumed from epoch 1: exactly epochs 1 and 2 ran
        assert [h["epoch"] for h in hist] == [1, 2]
        assert np.isfinite([h["loss"] for h in hist]).all()
        with TrainCheckpointer(ckdir) as ck:
            assert ck.latest_step() == 2

    def test_fit_orbax_arch_mismatch(self, tmp_path):
        from dirjax.train import TrainConfig, fit
        from dirjax.datasets.synthetic import SyntheticLabels

        out = str(tmp_path / "run")
        cfg = TrainConfig(epochs=1, **{**CFG,
                                       "trfs": "Scale(64), CenterCrop(64)"})
        fit(SyntheticLabels(), cfg, out_dir=out, steps_per_epoch=1,
            ckpt_format="orbax")
        bad = TrainConfig(arch="resnet50_rmac", epochs=2,
                          **{k: v for k, v in CFG.items() if k != "arch"})
        with pytest.raises(AssertionError, match="resume arch"):
            fit(SyntheticLabels(), bad, resume=out + "/orbax")
