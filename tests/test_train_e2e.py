"""Training must demonstrably improve retrieval (VERDICT round-1 item 5):
fine-tune resnet18 on the confusable-hue synthetic benchmark's classes and
assert eval_model mAP rises materially over the random init. Plus unit
tests for the LR schedules and Siamese multi-crop batching."""

import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.train import TrainConfig, fit, make_lr_schedule


class TestLRSchedule:
    def test_constant(self):
        cfg = TrainConfig(learning_rate=1e-3)
        assert make_lr_schedule(cfg) == 1e-3

    def test_cosine_decays_to_zero(self):
        cfg = TrainConfig(learning_rate=1e-3, lr_schedule="cosine")
        sched = make_lr_schedule(cfg, total_steps=100)
        assert float(sched(0)) == pytest.approx(1e-3)
        assert float(sched(50)) == pytest.approx(5e-4, rel=1e-3)
        assert float(sched(100)) == pytest.approx(0.0, abs=1e-9)

    def test_cosine_requires_total_steps(self):
        cfg = TrainConfig(lr_schedule="cosine")
        with pytest.raises(AssertionError):
            make_lr_schedule(cfg)

    def test_step_decay(self):
        cfg = TrainConfig(learning_rate=1e-2, lr_schedule="step",
                          lr_decay=0.1, lr_decay_steps=10)
        sched = make_lr_schedule(cfg)
        assert float(sched(9)) == pytest.approx(1e-2)
        assert float(sched(10)) == pytest.approx(1e-3)
        assert float(sched(20)) == pytest.approx(1e-4)

    def test_warmup(self):
        cfg = TrainConfig(learning_rate=1e-3, lr_schedule="cosine",
                          warmup_steps=10)
        sched = make_lr_schedule(cfg, total_steps=110)
        assert float(sched(0)) == pytest.approx(0.0)
        assert float(sched(5)) == pytest.approx(5e-4)
        assert float(sched(10)) == pytest.approx(1e-3)

    def test_unknown_raises(self):
        with pytest.raises(ValueError, match="lr_schedule"):
            make_lr_schedule(TrainConfig(lr_schedule="poly"))


def test_multicrop_order_repeats_each_image(tmp_path):
    """crops_per_image expands the epoch order with adjacent repeats (one
    fresh random-transform draw each) so every batch holds multi-crop
    positives."""
    from PIL import Image

    root = str(tmp_path)
    rows = []
    for i in range(6):
        Image.fromarray(np.zeros((48, 48, 3), np.uint8)).save(f"{root}/i{i}.jpg")
        rows.append(f"i{i}.jpg c{i % 2}")
    open(f"{root}/t.txt", "w").write("\n".join(rows))
    ds = D.ImageListLabels(f"{root}/t.txt", root=root)

    from dirjax.data.loader import BalancedSampler

    sampler = BalancedSampler(ds, rng=np.random.default_rng(0))
    order = list(iter(sampler))
    expanded = [i for i in order for _ in range(3)]
    assert len(expanded) == 3 * len(order)
    assert expanded[0] == expanded[1] == expanded[2]


@pytest.mark.slow
def test_training_improves_retrieval(tmp_path):
    """The flagship end-to-end claim: fit -> eval_model mAP-medium rises
    materially vs the random init on the confusable-hue fixture (classes
    share background color and differ only in shape, so raw color
    statistics can't rank them — the net must learn)."""
    import jax

    from dirjax.extraction import FeatureExtractor, eval_model
    from dirjax.models import create_model

    root = str(tmp_path / "bench")
    kw = dict(n_classes=6, per_class=5, hue_period=3)
    bench = D.Synthetic(root, **kw)
    train_ds = D.SyntheticLabels(root, **kw)
    assert train_ds.nclass == 6 and len(train_ds) == 30

    np.random.seed(0)  # threads=1 + seeded global RNG: deterministic run
    cfg = TrainConfig(arch="resnet18_rmac", out_dim=32, batch_size=12, nq=12,
                      learning_rate=5e-4, lr_schedule="cosine",
                      crops_per_image=2, epochs=10, image_size=48,
                      freeze_bn=False, threads=1,
                      trfs="RandomScale(56,64), RandomCrop(48), RandomFlip()",
                      seed=0)
    model = create_model(cfg.arch, out_dim=cfg.out_dim)
    params0 = model.init(jax.random.PRNGKey(0))
    before = eval_model(bench, FeatureExtractor(model, params0))

    model, params, hist = fit(train_ds, cfg, params=params0)
    after = eval_model(bench, FeatureExtractor(model, params))

    losses = [h["loss"] for h in hist]
    assert losses[-1] < losses[0] - 0.2, f"loss did not fall: {losses}"
    gain = after["mAP-medium"] - before["mAP-medium"]
    assert gain > 0.03, (f"training did not improve retrieval: "
                         f"{before['mAP-medium']:.4f} -> "
                         f"{after['mAP-medium']:.4f}")
