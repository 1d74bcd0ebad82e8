"""Launchable mesh training (VERDICT r2 item 3): ``fit(mesh=...)`` and the
``--mesh`` CLI flag run the SPMD train step end-to-end on the 8-virtual-
device CPU harness, and the sharded training LOOP matches the single-device
loop (the step itself was already proven equivalent in test_parallel.py —
this proves the loop wiring: arg sharding, ragged-batch truncation,
checkpointing with sharded params)."""

import json
import os

import jax
import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.parallel.mesh import make_mesh
from dirjax.train import TrainConfig, fit


@pytest.fixture(scope="module")
def labeled(tmp_path_factory):
    from PIL import Image

    root = str(tmp_path_factory.mktemp("meshtrain"))
    rng = np.random.default_rng(0)
    rows = []
    for i in range(16):
        cls = i % 4
        base = np.zeros((40, 40, 3), np.uint8)
        base[..., cls % 3] = 60 + 40 * (cls // 3)
        noise = rng.integers(0, 50, size=base.shape, dtype=np.uint8)
        Image.fromarray(base + noise).save(f"{root}/img{i}.jpg")
        rows.append(f"img{i}.jpg c{cls}")
    open(f"{root}/train.txt", "w").write("\n".join(rows))
    return D.ImageListLabels(f"{root}/train.txt", root=root)


# deterministic chain so the sharded and single-device runs see identical
# batches (same sampler seed, no random transform draws); SGD because Adam
# amplifies fp32 psum-ordering noise on near-zero grads (dev-notes rule:
# compare grads/params under SGD)
CFG = dict(arch="resnet18_rmac", out_dim=32, batch_size=8, nq=10,
           learning_rate=3e-4, image_size=32, threads=2,
           optimizer="sgd",
           trfs="Scale(36), CenterCrop(32)")


def test_mesh_fit_matches_single_device(labeled):
    cfg = TrainConfig(epochs=1, **CFG)
    _, params_ref, hist_ref = fit(labeled, cfg, steps_per_epoch=2)

    mesh = make_mesh(4, 2)
    _, params_mesh, hist_mesh = fit(labeled, cfg, steps_per_epoch=2,
                                    mesh=mesh)
    assert len(hist_mesh) == len(hist_ref) == 1
    np.testing.assert_allclose(hist_mesh[0]["loss"], hist_ref[0]["loss"],
                               rtol=1e-4, atol=1e-5)
    flat_ref = jax.tree.leaves(params_ref)
    flat_mesh = jax.tree.leaves(params_mesh)
    for a, b in zip(flat_ref, flat_mesh):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=2e-4, atol=2e-5)


def test_mesh_fit_with_microbatch(labeled):
    """Two-pass exact gradients compose with the mesh: the scan over
    microbatches keeps each row's "data" sharding."""
    cfg = TrainConfig(epochs=1, microbatch=4, **CFG)
    _, params_ref, hist_ref = fit(labeled, cfg, steps_per_epoch=1)
    mesh = make_mesh(4, 2)
    _, params_mesh, hist_mesh = fit(labeled, cfg, steps_per_epoch=1,
                                    mesh=mesh)
    np.testing.assert_allclose(hist_mesh[0]["loss"], hist_ref[0]["loss"],
                               rtol=1e-4, atol=1e-5)


def test_mesh_fit_checkpoints_sharded_params(labeled, tmp_path):
    """save/resume round-trips sharded params (np.asarray gathers)."""
    out = str(tmp_path / "run")
    mesh = make_mesh(8, 1)
    cfg = TrainConfig(epochs=1, **CFG)
    fit(labeled, cfg, out_dir=out, steps_per_epoch=1, mesh=mesh)
    assert os.path.exists(out + "/checkpoint.npz")
    cfg2 = TrainConfig(epochs=2, **CFG)
    _, _, hist = fit(labeled, cfg2, out_dir=out, steps_per_epoch=1,
                     mesh=mesh, resume=out + "/checkpoint.npz")
    assert [h["epoch"] for h in hist] == [1]


def test_mesh_batch_divisibility_asserted(labeled):
    cfg = TrainConfig(epochs=1, **dict(CFG, batch_size=6))
    with pytest.raises(AssertionError, match="data axis"):
        fit(labeled, cfg, steps_per_epoch=1, mesh=make_mesh(4, 2))


def test_cli_mesh_flag(labeled, tmp_path):
    from dirjax.cli.train import main

    out = str(tmp_path / "cli")
    list_path = os.path.join(labeled.root, "train.txt")
    hist = main([
        "--dataset", f"ImageListLabels('{list_path}', root='{labeled.root}')",
        "--arch", "resnet18_rmac", "--out-dim", "32",
        "--epochs", "1", "--batch-size", "8", "--steps-per-epoch", "1",
        "--trfs", "Scale(36), CenterCrop(32)", "--threads", "2",
        "--mesh", "4,2", "--gpu", "-1",
        "--out-dir", out,
    ])
    assert len(hist) == 1 and np.isfinite(hist[0]["loss"])
    assert os.path.exists(os.path.join(out, "checkpoint.npz"))
