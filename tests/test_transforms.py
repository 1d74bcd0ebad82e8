"""Tests for the transform library and chain parser, cross-checked against
the reference implementation where it is importable without torchvision."""

import numpy as np
import pytest
from PIL import Image

from dirjax.data import geometry as G
from dirjax.data import transforms as T


@pytest.fixture
def img():
    rng = np.random.default_rng(0)
    return Image.fromarray(rng.integers(0, 255, size=(48, 64, 3), dtype=np.uint8))


class TestScale:
    def test_short_side(self, img):
        out = T.Scale(24)(img)
        assert out.size == (32, 24)  # 64x48 -> short side 24

    def test_largest(self, img):
        out = T.Scale(32, largest=True)(img)
        assert out.size == (32, 24)

    def test_float_scale(self, img):
        out = T.Scale(0.5)(img)
        assert out.size == (32, 24)

    def test_tuple(self, img):
        out = T.Scale((20, 30))(img)
        assert out.size == (20, 30)

    def test_no_upscale(self, img):
        out = T.Scale(100, can_upscale=False)(img)
        assert out.size == (64, 48)

    def test_rounding_matches_reference(self):
        # int(0.5 + size*h/w) rounding, e.g. 1050 short side on 1024x768
        t = T.Scale(1050)
        assert t.get_params((1024, 768)) == (1400, 1050)
        assert t.get_params((768, 1024)) == (1050, 1400)

    def test_bbox_propagation(self, img):
        sample = {"img": img, "bbox": (10, 10, 20, 20)}
        out = T.Scale(24)(sample)
        assert out["bbox"] == (5, 5, 10, 10)


class TestPad:
    def test_pad_shortest(self, img):
        out = T.Pad(60)(img)  # 64x48 -> pad h to 60
        assert out.size == (64, 60)

    def test_pad_noop_when_large(self, img):
        assert T.Pad(10)(img).size == (64, 48)

    def test_pad_square(self, img):
        out = T.PadSquare()(img)
        assert out.size == (64, 64)
        out2 = T.PadSquare(80)(img)
        assert out2.size == (80, 80)


class TestCrops:
    def test_center_crop(self, img):
        out = T.CenterCrop(32)(img)
        assert out.size == (32, 32)

    def test_random_crop(self, img):
        out = T.RandomCrop((16, 24))(img)  # (h, w)
        assert out.size == (24, 16)

    def test_crop_to_bbox(self, img):
        sample = {"img": img, "bbox": (20, 10, 40, 30)}
        out = T.CropToBbox(margin=0.0)(sample)
        assert out["img"].size == (20, 20)
        assert out["bbox"] == (0, 0, 20, 20)


class TestFlipsAndRotation:
    def test_flip_deterministic(self, img):
        np.random.seed(0)
        outs = {T.RandomFlip()(img).tobytes() for _ in range(20)}
        assert len(outs) == 2  # both flipped and unflipped occur

    def test_rotation_runs(self, img):
        out = T.RandomRotation(10)(img)
        assert out.size == img.size

    def test_tilting_runs(self, img):
        out = T.RandomTilting(0.3)(img)
        assert out.size == img.size


class TestPhotometric:
    def test_color_jitter(self, img):
        np.random.seed(0)
        out = T.ColorJitter(0.5, 0.5, 0.5, 0.2)(img)
        assert out.size == img.size
        assert out.tobytes() != img.tobytes()

    def test_random_erasing(self, img):
        np.random.seed(0)
        out = T.RandomErasing(0.5)(img)
        assert out.size == img.size
        assert out.tobytes() != img.tobytes()

    def test_hue_matches_reference_math(self, img):
        out = G.adjust_hue(img, 0.25)
        # full-cycle shift: applying -0.25 after +0.25 isn't exactly identity
        # due to uint8 rounding, but mean should be close
        back = G.adjust_hue(out, -0.25)
        assert abs(np.asarray(back).mean() - np.asarray(img).mean()) < 3


class TestToArrayNormalize:
    def test_pipeline(self, img):
        chain = T.Compose([T.ToArray(), T.Normalize([0.5, 0.5, 0.5], [0.5, 0.5, 0.5])])
        out = chain(img)
        assert out.shape == (48, 64, 3)
        assert out.dtype == np.float32
        assert -1.0 <= out.min() and out.max() <= 1.0


class TestDummyImg:
    def test_geometry_replay_without_pixels(self):
        sample = {"imsize": (64, 48), "bbox": (10, 10, 30, 30)}
        out = T.Scale(24)(sample)
        assert isinstance(out["img"], G.DummyImg)
        assert out["img"].size == (32, 24)
        assert out["bbox"] == (5, 5, 15, 15)


class TestChainParser:
    def test_create_reference_style(self, img):
        chain = T.create("Scale(24), RandomFlip()", to_array=True,
                         mean=[0.5] * 3, std=[0.5] * 3)
        out = chain(img)
        assert out.shape == (24, 32, 3)

    def test_empty_chain_appends_normalize(self, img):
        chain = T.create("", to_array=True, mean=[0.0] * 3, std=[1.0] * 3)
        out = chain(img)
        assert out.shape == (48, 64, 3)
        np.testing.assert_allclose(out, np.asarray(img) / 255.0, atol=1e-6)

    def test_totensor_alias(self, img):
        chain = T.create("Scale(24), ToTensor(), Normalize(mean=mean, std=std)",
                         mean=[0.5] * 3, std=[0.5] * 3)
        assert chain(img).shape == (24, 32, 3)

    def test_interpolation_constant(self, img):
        chain = T.create("Scale(24, interpolation=BICUBIC)")
        assert chain(img).size == (32, 24)

    def test_rejects_arbitrary_code(self):
        with pytest.raises(SyntaxError):
            T.create("__import__('os').system('true')")

    def test_unknown_transform(self):
        with pytest.raises(SyntaxError):
            T.create("NoSuchTransform(3)")


class TestAffineTools:
    def test_aff_roundtrip(self):
        aff = G.aff_mul(G.aff_translate(2, 3), G.aff_rotate(0.5))
        pt = G.aff_mul(aff, (1.0, 1.0))
        # manual: rotate(translate(pt))
        import math

        tx, ty = 3.0, 4.0
        expected = (math.cos(0.5) * tx - math.sin(0.5) * ty,
                    math.sin(0.5) * tx + math.cos(0.5) * ty)
        np.testing.assert_allclose(pt, expected, atol=1e-9)

    def test_persp_identity(self):
        ident = (1, 0, 0, 0, 1, 0, 0, 0)
        assert G.persp_mul(ident, (3.0, 4.0)) == (3.0, 4.0)


class TestBBoxToPixelLabel:
    def _sample(self, mode):
        img = Image.new("RGB", (32, 16))
        return {"img": img, "bbox": (8, 4, 24, 12), "label": 2}, mode

    def test_dense_map(self):
        sample, _ = self._sample("regr")
        out = T.BBoxToPixelLabel(nclass=5, downsize=8, mode="regr")(sample)
        dense = out["pix_label"]
        assert dense.shape == (2, 4)
        assert dense[0, 1] == 2       # inside bbox
        assert dense[0, 0] == 5       # null class outside
        np.testing.assert_array_equal(out["bbox_downscaled"], [1, 0, 3, 2])

    def test_hough_bins_clipped(self):
        sample, _ = self._sample("hough")
        out = T.BBoxToPixelLabel(nclass=5, downsize=8, mode="hough")(sample)
        h = out["pix_bbox_hough"]
        assert h.shape == (4, 2, 4)
        assert h.min() >= 0 and h.max() <= 4

    def test_unknown_mode(self):
        sample, _ = self._sample("nope")
        with pytest.raises(NotImplementedError):
            T.BBoxToPixelLabel(nclass=5, downsize=8, mode="nope")(sample)


class TestHomographyPropagation:
    def test_tilting_bbox_follows_pixels(self):
        """Track a bright square through RandomTilting via the persp tuple:
        the reported bbox must cover where the pixels actually landed."""
        np.random.seed(3)
        import random as _r
        _r.seed(3)
        arr = np.zeros((64, 64, 3), np.uint8)
        arr[24:40, 24:40] = 255
        sample = {"img": Image.fromarray(arr), "bbox": (24, 24, 40, 40)}
        out = T.RandomTilting(0.4)(sample)
        bright = np.asarray(out["img"]).sum(axis=2) > 300
        ys, xs = np.where(bright)
        l, t, r, b = out["bbox"]
        # the propagated bbox center must sit within the bright region's span
        assert xs.min() - 6 <= (l + r) / 2 <= xs.max() + 6
        assert ys.min() - 6 <= (t + b) / 2 <= ys.max() + 6
