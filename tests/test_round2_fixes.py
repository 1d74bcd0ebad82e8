"""Regression tests for the round-2 correctness fixes: whitening's sklearn
``whiten`` flag, mask downsampling at non-multiple-of-32 buckets, resume
best-monitor persistence, top-k pad sentinels, empty-query eval, loader
argument honoring, flip-TTA, and the ret_imgs debug path."""

import os
from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.data.loader import get_loader
from dirjax.extraction import FeatureExtractor, eval_model, extract_image_features
from dirjax.models import create_model
from dirjax.ops.whitening import PCAParams, apply_whitening, fit_pca, whitening_matrix


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    return D.Synthetic(str(tmp_path_factory.mktemp("synth_r2")), revisited=True)


@pytest.fixture(scope="module")
def extractor():
    model = create_model("resnet18_rmac", out_dim=32)
    params = model.init(jax.random.PRNGKey(0))
    return FeatureExtractor(model, params)


# --------------------------------------------------------------------------
# whitening: sklearn whiten flag
# --------------------------------------------------------------------------

class TestWhitenFlag:
    def test_unwhitened_pca_skips_variance_division(self, rng):
        X = rng.normal(size=(20, 8)).astype(np.float32)
        pca = fit_pca(X)
        off = PCAParams(pca.mean, pca.components, pca.variance, whiten=False)
        Y = rng.normal(size=(5, 8)).astype(np.float32)
        got = np.asarray(apply_whitening(Y, off, whitenp=0.25, l2norm=False))
        want = (Y - np.asarray(pca.mean)) @ np.asarray(pca.components).T
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
        # with the flag on, the results must differ
        on = np.asarray(apply_whitening(Y, pca, whitenp=0.25, l2norm=False))
        assert not np.allclose(got, on)

    def test_whitening_matrix_respects_flag(self, rng):
        X = rng.normal(size=(20, 8)).astype(np.float32)
        pca = fit_pca(X)
        off = PCAParams(pca.mean, pca.components, pca.variance, whiten=False)
        Y = rng.normal(size=(5, 8)).astype(np.float32)
        W, b = whitening_matrix(off, whitenp=0.25)
        got = Y @ W + b
        want = np.asarray(apply_whitening(Y, off, whitenp=0.25, l2norm=False))
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_from_sklearn_carries_flag(self, rng):
        fake = SimpleNamespace(mean_=np.zeros(4), components_=np.eye(4),
                               explained_variance_=np.ones(4), whiten=False)
        assert PCAParams.from_sklearn(fake).whiten is False
        fake.whiten = True
        assert PCAParams.from_sklearn(fake).whiten is True

    def test_native_roundtrip_preserves_flag(self, tmp_path, rng):
        from dirjax.utils.checkpoints import (Checkpoint, load_native,
                                              save_native)

        model = create_model("resnet18_rmac", out_dim=8)
        params = model.init(jax.random.PRNGKey(0))
        pca = fit_pca(rng.normal(size=(10, 8)))
        off = PCAParams(pca.mean, pca.components, pca.variance, whiten=False)
        path = str(tmp_path / "ck.npz")
        save_native(path, Checkpoint(model=model, params=params,
                                     preprocess=model.preprocess,
                                     pca={"on": pca, "off": off}))
        loaded = load_native(path)
        assert loaded.pca["on"].whiten is True
        assert loaded.pca["off"].whiten is False


# --------------------------------------------------------------------------
# mask downsampling at awkward shapes
# --------------------------------------------------------------------------

class TestMaskDownsampling:
    def test_ragged_edge_is_invalid_not_crash(self):
        from dirjax.models.rmac import _downsample_mask

        mask = jnp.ones((1, 48, 48), bool)  # not a multiple of 32
        # backbone emits ceil(48/32)=2 cells per axis
        valid = np.asarray(_downsample_mask(mask, 32, 2, 2))
        assert valid.shape == (1, 2, 2)
        assert valid[0, 0, 0]           # full 32x32 window
        assert not valid[0, 0, 1]       # partial (ragged) windows dropped
        assert not valid[0, 1, 1]

    def test_bucket_multiple_not_divisible_by_32(self, synth, extractor):
        # bucket_multiple=48 pads to 48/96/...; the mask must align with the
        # backbone's ceil-shaped feature map instead of crashing
        descs = extract_image_features(synth, "", extractor,
                                       batching="bucket", bucket_multiple=48)
        assert descs.shape == (len(synth), 32)
        assert np.all(np.isfinite(descs))


# --------------------------------------------------------------------------
# top-k pad sentinels and k bound
# --------------------------------------------------------------------------

class TestTopkBounds:
    def test_k_exceeding_rows_raises(self, rng):
        from dirjax.ops.topk_pallas import rank_topk_fused

        q = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
        db = jnp.asarray(rng.normal(size=(8, 16)), jnp.float32)
        with pytest.raises(ValueError, match="exceeds"):
            rank_topk_fused(q, db, 9)


# --------------------------------------------------------------------------
# eval_model: empty query set must not crash
# --------------------------------------------------------------------------

class TestEmptyQueries:
    def test_eval_model_no_queries(self, extractor, tmp_path):
        from dirjax.datasets.generic import ImageListRelevants, ImageListROIs

        class NoQueries(D.Synthetic):
            def get_query_db(self):
                return ImageListROIs(self.root, self.img_dir, [], [])

        ds = NoQueries(str(tmp_path / "nq"))
        res = eval_model(ds, extractor)
        assert "mAP" not in res and "mAP-medium" not in res  # and no crash


# --------------------------------------------------------------------------
# get_loader honors its batching arguments
# --------------------------------------------------------------------------

class TestLoaderArgs:
    def test_iteration_respects_batch_size(self, synth):
        loader = get_loader(synth, "", output=("img",), batch_size=4)
        sizes = [len(b.indices) for b in loader]
        assert sum(sizes) == len(synth)
        assert max(sizes) <= 4

    def test_shuffle_changes_order(self, synth):
        l1 = get_loader(synth, "", output=("img",), shuffle=True, seed=1)
        l2 = get_loader(synth, "", output=("img",), shuffle=True, seed=2)
        assert l1.default_order() != l2.default_order()
        assert sorted(l1.default_order()) == list(range(len(synth)))

    def test_unknown_kwarg_raises(self, synth):
        with pytest.raises(TypeError):
            get_loader(synth, "", pin_memory=True)

    def test_balanced_order(self, tmp_path):
        rows = [f"img{i}.jpg c{i % 2}" for i in range(6)]
        lst = tmp_path / "l.txt"
        lst.write_text("\n".join(rows))
        db = D.ImageListLabels(str(lst), root=str(tmp_path))
        loader = get_loader(db, "", output=("img",), balanced=1.0, seed=0)
        order = loader.default_order()
        labels = [db.get_label(i, toint=True) for i in order]
        assert abs(labels.count(0) - labels.count(1)) <= 1


# --------------------------------------------------------------------------
# flip TTA + ret_imgs
# --------------------------------------------------------------------------

class _Mirrored:
    """Wraps a dataset, mirroring every image horizontally at load time."""

    def __init__(self, ds):
        self._ds = ds

    def __len__(self):
        return len(self._ds)

    def __getattr__(self, name):
        return getattr(self._ds, name)

    def get_image(self, i, resize=None):
        from PIL import Image

        return self._ds.get_image(i, resize).transpose(Image.FLIP_LEFT_RIGHT)


class TestFlipTTA:
    def test_flip_matches_mirrored_dataset(self, synth, extractor):
        flipped = extract_image_features(synth, "", extractor,
                                         flip=[1] * len(synth))
        mirrored = extract_image_features(_Mirrored(synth), "", extractor)
        np.testing.assert_allclose(flipped, mirrored, rtol=1e-4, atol=1e-5)

    def test_eval_model_tta_flip_runs_and_differs(self, synth, extractor):
        plain = eval_model(synth, extractor)
        tta = eval_model(synth, extractor, tta="flip")
        assert set(tta) == set(plain)  # same metrics reported
        with pytest.raises(ValueError, match="tta"):
            eval_model(synth, extractor, tta="rot90")

    def test_ret_imgs(self, synth, extractor):
        imgs, descs = extract_image_features(synth, "", extractor,
                                             ret_imgs=True)
        assert len(imgs) == len(synth) == descs.shape[0]
        assert all(im is not None and im.ndim == 3 for im in imgs)
        base = extract_image_features(synth, "", extractor)
        np.testing.assert_allclose(descs, base, rtol=1e-5, atol=1e-6)


# --------------------------------------------------------------------------
# resume keeps the best monitor
# --------------------------------------------------------------------------

def test_resume_keeps_best(tmp_path):
    from PIL import Image

    from dirjax.train import TrainConfig, fit
    from dirjax.utils.checkpoints import load_native, save_native

    root = str(tmp_path / "data")
    os.makedirs(root)
    rng = np.random.default_rng(0)
    rows = []
    for i in range(8):
        cls = i % 2
        arr = np.zeros((48, 48, 3), np.uint8)
        arr[..., cls] = 140
        Image.fromarray(arr + rng.integers(0, 40, arr.shape).astype(np.uint8)
                        ).save(f"{root}/i{i}.jpg")
        rows.append(f"i{i}.jpg c{cls}")
    open(f"{root}/t.txt", "w").write("\n".join(rows))
    ds = D.ImageListLabels(f"{root}/t.txt", root=root)

    cfg = TrainConfig(arch="resnet18_rmac", out_dim=16, batch_size=4, nq=5,
                      epochs=1, image_size=48, trfs="Scale(48)")
    out = str(tmp_path / "run")
    fit(ds, cfg, out_dir=out, steps_per_epoch=1)
    path = out + "/checkpoint.npz"
    ck = load_native(path)
    assert "best" in ck.extra

    # forge an unbeatable best, then resume: the .best copy must survive
    ck.extra["best"] = -1e9
    save_native(path, ck)
    best_bytes = open(path + ".best", "rb").read()
    cfg2 = TrainConfig(arch="resnet18_rmac", out_dim=16, batch_size=4, nq=5,
                       epochs=2, image_size=48, trfs="Scale(48)")
    fit(ds, cfg2, out_dir=out, steps_per_epoch=1, resume=path)
    assert open(path + ".best", "rb").read() == best_bytes


class TestAdaptiveOOM:
    """Device-OOM resilience: extraction splits batches instead of dying."""

    def test_call_adaptive_splits_on_oom(self, monkeypatch):
        from dirjax.extraction import FeatureExtractor
        from dirjax.models import create_model

        model = create_model("resnet18_rmac", out_dim=16)
        ex = FeatureExtractor(model, model.init(jax.random.PRNGKey(0)))
        real = FeatureExtractor.__call__
        calls = []

        def flaky(self_, images, mask=None):
            calls.append(len(images))
            if len(images) in (8, 4):
                raise RuntimeError("RESOURCE_EXHAUSTED: out of memory "
                                   "allocating 9999999 bytes")
            return real(self_, images, mask)

        monkeypatch.setattr(FeatureExtractor, "__call__", flaky)
        imgs = np.random.default_rng(0).normal(
            size=(8, 32, 32, 3)).astype(np.float32)
        descs = ex.call_adaptive(imgs)
        assert descs.shape == (8, 16)
        # split path: 8 fails, each 4 fails, four 2s succeed
        assert calls == [8, 4, 2, 2, 4, 2, 2]
        monkeypatch.setattr(FeatureExtractor, "__call__", real)
        whole = np.concatenate([ex.call_adaptive(imgs[i:i + 2])
                                for i in range(0, 8, 2)])
        np.testing.assert_allclose(descs, whole, rtol=1e-5, atol=1e-5)

    def test_non_oom_errors_propagate(self):
        from dirjax.extraction import FeatureExtractor
        from dirjax.models import create_model

        model = create_model("resnet18_rmac", out_dim=16)
        ex = FeatureExtractor(model, model.init(jax.random.PRNGKey(0)))
        with pytest.raises(Exception):
            ex.call_adaptive(np.zeros((2, 3), np.float32))  # bad rank


class TestLoaderErrorPolicy:
    def _broken_dataset(self, tmp_path, n=6, broken=(2, 4)):
        from PIL import Image

        from dirjax.datasets.generic import ImageList

        names = []
        for i in range(n):
            p = tmp_path / f"im{i}.jpg"
            if i in broken:
                p.write_bytes(b"not a jpeg at all")
            else:
                Image.new("RGB", (40, 40), (i * 30, 10, 10)).save(p)
            names.append(p.name)
        lst = tmp_path / "list.txt"
        lst.write_text("\n".join(names) + "\n")
        return ImageList(str(lst), root=str(tmp_path))

    def test_skip_drops_corrupt_samples(self, tmp_path):
        import warnings

        from dirjax.data.loader import iterate_batches

        ds = self._broken_dataset(tmp_path)
        loader = get_loader(ds, "Scale(32)", output=("img",),
                            on_error="skip", threads=2)
        with warnings.catch_warnings(record=True) as w:
            warnings.simplefilter("always")
            got = [i for b in iterate_batches(loader, range(len(ds)),
                                              batch_size=2, threads=2)
                   for i in b.indices]
        assert sorted(got) == [0, 1, 3, 5]
        assert sum("skipping sample" in str(x.message) for x in w) == 2

    def test_raise_is_default(self, tmp_path):
        from dirjax.data.loader import iterate_batches

        ds = self._broken_dataset(tmp_path)
        loader = get_loader(ds, "Scale(32)", output=("img",))
        with pytest.raises(Exception):
            list(iterate_batches(loader, range(len(ds)), batch_size=2))

    def test_extraction_refuses_short_results(self, tmp_path):
        """extract_image_features keeps the every-image contract even on a
        skip-policy loader: it must fail loudly, not return zero rows."""
        ds = self._broken_dataset(tmp_path)
        model = create_model("resnet18_rmac", out_dim=8)
        ex = FeatureExtractor(model, model.init(jax.random.PRNGKey(0)))
        with pytest.raises(Exception):
            extract_image_features(ds, "Scale(32)", ex)


class TestReviewRound2B:
    """Second self-review pass fixes (round-1 legacy code)."""

    def test_checkpoint_preprocess_drives_normalization(self):
        """A checkpoint's own mean/std must reach the device-normalize path
        (reference reads checkpoint['preprocess'], test_dir.py:183-191)."""
        model = create_model("resnet18_rmac", out_dim=8)
        params = model.init(jax.random.PRNGKey(0))
        custom = {"mean": [0.0, 0.0, 0.0], "std": [1.0, 1.0, 1.0]}
        ex_custom = FeatureExtractor(model, params, preprocess=custom)
        ex_default = FeatureExtractor(model, params)
        assert ex_custom.preprocess["mean"] == [0.0, 0.0, 0.0]
        img = np.random.default_rng(0).integers(
            0, 256, (1, 32, 32, 3), np.uint8)
        d1 = np.asarray(ex_custom(img))
        d2 = np.asarray(ex_default(img))
        assert not np.allclose(d1, d2), \
            "custom preprocess must change uint8 normalization"

    def test_scale_gate_skip_keeps_identity_affine(self):
        from dirjax.data import transforms as T

        t = T.Scale(64, can_upscale=False)
        from PIL import Image

        sample = {"img": Image.new("RGB", (32, 40)),
                  "bbox": (0, 0, 32, 40), "aff": (1, 0, 0, 0, 1, 0)}
        out = t(sample)
        assert out["img"].size == (32, 40)          # resize gated off
        assert tuple(out["aff"]) == (1, 0, 0, 0, 1, 0)

    def test_native_checkpoint_numeric_pca_name_roundtrip(self, tmp_path):
        from dirjax.ops.whitening import PCAParams
        from dirjax.utils.checkpoints import (Checkpoint, load_native,
                                              save_native)

        model = create_model("resnet18_rmac", out_dim=8)
        pca = PCAParams(mean=np.zeros(8, np.float32),
                        components=np.eye(8, dtype=np.float32),
                        variance=np.ones(8, np.float32))
        ck = Checkpoint(model=model, params=model.init(jax.random.PRNGKey(0)),
                        preprocess=model.preprocess,
                        pca={"123": pca, "0": pca})
        p = str(tmp_path / "ck.npz")
        save_native(p, ck)
        back = load_native(p)
        assert set(back.pca) == {"123", "0"}
        assert back.pca["123"].components.shape == (8, 8)

    def test_query_db_memoized(self):
        from dirjax.datasets.generic import LabeledImages

        ds = LabeledImages(["a.jpg", "b.jpg"], ["x", "y"],
                           qimgs=["q.jpg"], qlabels=["x"])
        assert ds.get_query_db() is ds.get_query_db()


class TestReviewRound2C:
    """Third self-review pass fixes."""

    def test_query_class_missing_from_db_yields_negative_ap(self):
        from dirjax.datasets.generic import LabeledImages

        ds = LabeledImages(["a.jpg", "b.jpg"], ["cat", "cat"],
                           qimgs=["q.jpg"], qlabels=["dog"])
        gt = ds.get_query_groundtruth(0, "AP")       # no KeyError
        assert (gt == -1).all()
        assert ds.eval_query_AP(0, np.asarray([0.9, 0.1])) == -1.0

    def test_s2d_stem_grad_safe(self):
        from dirjax.models.resnet import apply_resnet

        model = create_model("resnet18_rmac", out_dim=8)
        params = model.init(jax.random.PRNGKey(0))
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(1, 32, 32, 3)).astype(np.float32))

        def loss(p):
            out = apply_resnet(p, x, model.config.backbone,
                               dtype=jnp.bfloat16, grad_safe=True,
                               stem_s2d=True)
            return jnp.sum(out.astype(jnp.float32) ** 2)

        g = jax.grad(loss)(params["backbone"])        # must not TypeError
        assert np.isfinite(float(jnp.sum(g["stem"]["conv"].astype(jnp.float32))))

    def test_fpn_ignores_center_bias_like_reference(self):
        from dirjax.models.rmac import apply_descriptor

        x = jnp.asarray(np.random.default_rng(1).normal(
            size=(1, 64, 64, 3)).astype(np.float32))
        m0 = create_model("resnet18_fpn_rmac", out_dim=16)
        params = m0.init(jax.random.PRNGKey(0))
        mb = create_model("resnet18_fpn_rmac", out_dim=16, center_bias=0.8)
        d0 = np.asarray(apply_descriptor(params, x, m0.config))
        db = np.asarray(apply_descriptor(params, x, mb.config))
        np.testing.assert_array_equal(d0, db)

    def test_persp_mul_composition_normalized(self):
        from dirjax.data import geometry as G

        h1 = (1.0, 0.1, 2.0, 0.05, 1.1, -1.0, 1e-3, 2e-3)
        h2 = (0.9, -0.05, 1.0, 0.02, 1.0, 0.5, -1e-3, 5e-4)
        comp = G.persp_mul(h1, h2)
        for pt in [(3.0, 4.0), (10.0, -2.0)]:
            step = G.persp_mul(h2, G.persp_mul(h1, pt))
            both = G.persp_mul(comp, pt)
            np.testing.assert_allclose(both, step, rtol=1e-9)
