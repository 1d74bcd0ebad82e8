"""End-to-end extraction + evaluation tests on the synthetic benchmark with
a real (randomly initialized) descriptor model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dirjax.datasets as D
from dirjax.data.loader import BalancedSampler, SampleLoader, get_loader, iterate_batches
from dirjax.extraction import FeatureExtractor, eval_model, extract_image_features
from dirjax.models import create_model


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    return D.Synthetic(str(tmp_path_factory.mktemp("synth_e2e")), revisited=True)


@pytest.fixture(scope="module")
def extractor():
    model = create_model("resnet18_rmac", out_dim=64)
    params = model.init(jax.random.PRNGKey(0))
    return FeatureExtractor(model, params)


class TestLoader:
    def test_sample_loader_fields(self, synth):
        loader = get_loader(synth, "", output=("img", "img_key"))
        s = loader[0]
        assert s["img"].shape == (48, 64, 3)
        assert s["img_key"].startswith("img_")

    def test_group_batching_covers_all(self, synth):
        loader = get_loader(synth, "", output=("img",))
        seen = []
        for batch in iterate_batches(loader, range(len(synth)), batch_size=4):
            assert batch.mask is None  # all same shape -> exact
            seen += list(batch.indices)
        assert sorted(seen) == list(range(len(synth)))

    def test_bucket_batching_masks(self, synth):
        loader = get_loader(synth, "", output=("img",))
        for batch in iterate_batches(loader, range(4), batch_size=4,
                                     batching="bucket", bucket_multiple=64):
            assert batch.images.shape[1] % 64 == 0
            assert batch.mask is not None
            assert batch.mask[:, :48, :64].all()
            assert not batch.mask[:, 48:, :].any()

    def test_balanced_sampler(self, tmp_path):
        rows = [f"img{i}.jpg cls{0 if i < 12 else 1}" for i in range(15)]
        lst = tmp_path / "t.txt"
        lst.write_text("\n".join(rows))
        db = D.ImageListLabels(str(lst))
        sampler = BalancedSampler(db, rng=np.random.default_rng(0))
        idx = list(iter(sampler))
        labels = [db.get_label(i) for i in idx]
        # roughly balanced between the 12-image and 3-image classes
        assert 0.3 < labels.count("cls1") / len(labels) < 0.7


class TestExtraction:
    def test_extract_shapes(self, synth, extractor):
        feats = extract_image_features(synth, "", extractor, batch_size=4)
        assert feats.shape == (len(synth), 64)
        np.testing.assert_allclose(np.linalg.norm(feats, axis=1), 1.0, rtol=1e-4)

    def test_batched_equals_single(self, synth, extractor):
        """Group-batched extraction must be bit-comparable to one-by-one."""
        grouped = extract_image_features(synth, "", extractor, batch_size=4,
                                         batching="group")
        single = extract_image_features(synth, "", extractor, batching="single")
        np.testing.assert_allclose(grouped, single, atol=1e-5)

    def test_flip_tta(self, synth, extractor):
        flip_all = [1] * len(synth)
        flipped = extract_image_features(synth, "", extractor, flip=flip_all)
        plain = extract_image_features(synth, "", extractor)
        assert not np.allclose(flipped, plain, atol=1e-4)

    def test_query_roi_extraction(self, synth, extractor):
        qdb = synth.get_query_db()
        feats = extract_image_features(qdb, "", extractor)
        assert feats.shape == (synth.nquery, 64)


class TestEvalModel:
    def test_eval_returns_modes(self, synth, extractor):
        res = eval_model(synth, extractor, "")
        assert set(res) >= {"mAP-easy", "mAP-medium", "mAP-hard"}
        for v in res.values():
            assert 0.0 <= v <= 1.0

    def test_trained_color_model_beats_random(self, synth):
        """The synthetic classes are color-separable: a model whose first
        conv averages colors should beat chance decisively in medium mode."""
        res = {}
        for seed in range(2):
            model = create_model("resnet18_rmac", out_dim=32)
            params = model.init(jax.random.PRNGKey(seed))
            ex = FeatureExtractor(model, params)
            res[seed] = eval_model(synth, ex, "")["mAP-medium"]
        # random-feature descriptors on color-coded classes: should be
        # clearly above the ~0.3 chance level for 4-of-12 relevants
        assert max(res.values()) > 0.5

    def test_multiscale_pooling(self, synth, extractor):
        res1 = eval_model(synth, extractor, "")
        res2 = eval_model(synth, extractor, ["", "Scale(32)"], pooling="gem")
        assert set(res2) == set(res1)

    def test_whiten_and_qe_paths(self, synth, extractor):
        from dirjax.ops import fit_pca

        feats = extract_image_features(synth, "", extractor)
        pca = fit_pca(feats)
        res = eval_model(
            synth, extractor, "",
            whiten={"pca": pca, "whitenp": 0.25},
            aqe={"k": 2, "alpha": 3}, adba={"k": 2, "alpha": 3})
        assert "mAP-medium" in res

    def test_save_load_feats(self, synth, extractor, tmp_path):
        p = str(tmp_path / "feats")
        res1 = eval_model(synth, extractor, "", save_feats=p)
        res2 = eval_model(synth, extractor, "", load_feats=p)
        assert res1["mAP-medium"] == pytest.approx(res2["mAP-medium"])


class TestFlipWithBuckets:
    def test_flip_stays_mask_aligned(self, synth, extractor):
        """Flip TTA on padded bucket batches must flip only the valid
        region; flipping the full canvas would shift content into the
        padding and out of the mask."""
        kw = dict(batching="bucket", bucket_multiple=128, batch_size=4)
        flip_all = [1] * len(synth)
        flip_b = extract_image_features(synth, "", extractor, flip=flip_all, **kw)
        flip_s = extract_image_features(synth, "", extractor, flip=flip_all,
                                        batching="single")
        cos_flip = (flip_b * flip_s).sum(axis=1)
        # baseline bucket drift without flip (pure conv halo on these tiny
        # images); a canvas-wide flip bug would send cos_flip toward 0
        plain_b = extract_image_features(synth, "", extractor, **kw)
        plain_s = extract_image_features(synth, "", extractor,
                                         batching="single")
        cos_plain = (plain_b * plain_s).sum(axis=1)
        assert cos_flip.min() > cos_plain.min() - 0.05, \
            f"flip/mask misalignment: {cos_flip.min()} vs {cos_plain.min()}"


class TestBucketDriftMixedSizes:
    """r5 gross-regression guard for the bucket throughput mode on a
    MIXED-size benchmark (the regime where bucket batching actually pads).

    Bucket-vs-group drift is INHERENT and scale-dependent: padded-canvas
    activations past the image edge pick up BatchNorm bias (not zeros), so
    conv halo colors the border ring of feature cells — at this fixture's
    ~3x3-cell maps that ring is every cell (measured mean descriptor
    cosine 0.95, mAP delta ~0.08); at benchmark resolution (32x24 cells)
    the ring is ~11% of cells and the measured drift is small (on-chip
    measurement: PERF_NOTES 'Bucket-mode mAP drift'). The thresholds here
    bound a GROSS regression (e.g. a mask-alignment bug), not the halo."""

    def test_group_vs_bucket_map(self, tmp_path, extractor):
        from dirjax.extraction import extract_image_features

        sizes = [(96, 64), (64, 96), (80, 80), (112, 64), (96, 96)]
        db = D.Synthetic(str(tmp_path / "mixed"), revisited=True,
                         image_size=sizes, n_classes=4, per_class=4,
                         n_junk=2, seed=3)
        # the fixture must actually exercise padding: >1 distinct size
        from PIL import Image

        szs = {Image.open(db.get_filename(i)).size for i in range(len(db))}
        assert len(szs) > 1
        g = np.asarray(extract_image_features(
            db, "", extractor, batching="group", batch_size=4, threads=2))
        b = np.asarray(extract_image_features(
            db, "", extractor, batching="bucket", batch_size=4, threads=2))
        cos = (g * b).sum(1) / (np.linalg.norm(g, axis=1)
                                * np.linalg.norm(b, axis=1))
        assert cos.mean() > 0.90 and cos.min() > 0.80, \
            (cos.mean(), cos.min())
        res_g = eval_model(db, extractor, "", batching="group",
                           batch_size=4, threads=2)
        res_b = eval_model(db, extractor, "", batching="bucket",
                           batch_size=4, threads=2)
        # per-mode mAP at 4 classes is ranking noise (hard sets have 2
        # members); guard the cross-mode mean, cosine above is the real
        # structural check
        keys = ("mAP-easy", "mAP-medium", "mAP-hard")
        mg = np.mean([res_g[key] for key in keys])
        mb = np.mean([res_b[key] for key in keys])
        assert abs(mg - mb) < 0.15, (mg, mb)
