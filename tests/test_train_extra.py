"""Training resume + validation tests on the synthetic labeled fixture."""

import os

import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.train import TrainConfig, evaluate_val_loss, fit


@pytest.fixture(scope="module")
def labeled(tmp_path_factory):
    from PIL import Image

    root = str(tmp_path_factory.mktemp("trainres"))
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
    return D.ImageListLabels(f"{root}/train.txt", root=root)


CFG = dict(arch="resnet18_rmac", out_dim=32, batch_size=6, nq=10,
           learning_rate=3e-4, image_size=64,
           trfs="RandomScale(64,72), RandomCrop(64), RandomFlip()")


def test_resume_continues(labeled, tmp_path):
    out = str(tmp_path / "run")
    cfg = TrainConfig(epochs=1, **CFG)
    _, params1, hist1 = fit(labeled, cfg, out_dir=out, steps_per_epoch=2)
    assert os.path.exists(out + "/checkpoint.npz.opt")

    cfg2 = TrainConfig(epochs=3, **CFG)
    _, params2, hist2 = fit(labeled, cfg2, out_dir=out, steps_per_epoch=2,
                            resume=out + "/checkpoint.npz")
    # resumed from epoch 1: exactly epochs 1 and 2 were run
    assert [h["epoch"] for h in hist2] == [1, 2]
    assert np.isfinite([h["loss"] for h in hist2]).all()


def test_val_loss_tracked(labeled, tmp_path):
    cfg = TrainConfig(epochs=2, **CFG)
    _, _, hist = fit(labeled, cfg, val_dataset=labeled,
                     out_dir=str(tmp_path / "v"), steps_per_epoch=2)
    assert all("val_loss" in h and np.isfinite(h["val_loss"]) for h in hist)


def test_resume_arch_mismatch(labeled, tmp_path):
    out = str(tmp_path / "mismatch")
    cfg = TrainConfig(epochs=1, **CFG)
    fit(labeled, cfg, out_dir=out, steps_per_epoch=1)
    bad = TrainConfig(arch="resnet50_rmac", epochs=2,
                      **{k: v for k, v in CFG.items() if k != "arch"})
    with pytest.raises(AssertionError, match="resume arch"):
        fit(labeled, bad, resume=out + "/checkpoint.npz")


def test_fit_with_eval_dataset_monitors_map(tmp_path):
    """--eval-dataset: per-epoch mAP lands in the history and drives the
    best-checkpoint monitor (model selection by retrieval metric)."""
    from dirjax.datasets.synthetic import Synthetic, SyntheticLabels
    from dirjax.train import TrainConfig, fit

    cfg = TrainConfig(arch="resnet18_rmac", out_dim=16, nq=5, epochs=2,
                      batch_size=4, threads=2,
                      trfs="Scale(32), CenterCrop(32)")
    model, params, history = fit(
        SyntheticLabels(), cfg, steps_per_epoch=2,
        out_dir=str(tmp_path), eval_dataset=Synthetic(),
        eval_trfs="Scale(48)")
    assert len(history) == 2
    assert all("mAP-medium" in h for h in history)
    assert all(0.0 <= h["mAP-medium"] <= 1.0 for h in history)
    import os

    from dirjax.utils.checkpoints import load_native

    best = load_native(os.path.join(str(tmp_path), "checkpoint.npz"))
    # monitor persisted as -mAP (minimized)
    assert -1.0 <= best.extra["best"] <= 0.0
