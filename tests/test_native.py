"""Native decode/resize pipeline: bit-exact parity with the PIL path.

The contract (dirjax/data/_native/native.cpp docstring): decode matches
``Image.open().convert("RGB")`` and resize matches
``Image.resize(size, Image.BILINEAR)`` bit-for-bit, so the loader fast path
can swap in transparently. CMYK JPEG / 16-bit PNG raise Unsupported and the
loader falls back to PIL.
"""

import io
import os

import numpy as np
import pytest
from PIL import Image

from dirjax.data import native
from dirjax.data import transforms as T
from dirjax.data.loader import SampleLoader, get_loader

pytestmark = pytest.mark.skipif(not native.available(),
                                reason="native pipeline did not build")

rng = np.random.default_rng(7)


def _rand_img(h, w):
    # low-frequency content so JPEG artifacts are realistic, plus noise
    base = np.add.outer(np.linspace(0, 255, h), np.linspace(0, 127, w))
    arr = (base[..., None] + rng.integers(0, 64, (h, w, 3))) % 256
    return arr.astype(np.uint8)


def _jpeg_bytes(arr, **kw):
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, "JPEG", **kw)
    return buf.getvalue()


# --------------------------------------------------------------------------
# decode parity
# --------------------------------------------------------------------------

@pytest.mark.parametrize("maker", [
    lambda a: _jpeg_bytes(a, quality=90),
    lambda a: _jpeg_bytes(a, quality=60, progressive=True),
    lambda a: _png(Image.fromarray(a)),
    lambda a: _png(Image.fromarray(a).convert("P")),
    lambda a: _png(Image.fromarray(a).convert("L")),
    lambda a: _png(Image.fromarray(np.dstack([a, a[:, :, 0]]))),  # RGBA
])
def test_decode_bit_exact(maker):
    data = maker(_rand_img(93, 131))
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    nat = native.decode(data)
    assert np.array_equal(pil, nat)


def _png(im):
    buf = io.BytesIO()
    im.save(buf, "PNG")
    return buf.getvalue()


def test_gray_jpeg_decode():
    data = io.BytesIO()
    Image.fromarray(_rand_img(50, 70)).convert("L").save(data, "JPEG")
    data = data.getvalue()
    pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
    assert np.array_equal(pil, native.decode(data))


def test_unsupported_inputs_raise():
    cmyk = io.BytesIO()
    Image.fromarray(_rand_img(20, 20)).convert("CMYK").save(cmyk, "JPEG")
    with pytest.raises(native.Unsupported):
        native.decode(cmyk.getvalue())
    with pytest.raises(native.Unsupported):
        native.decode(b"not an image at all")


def test_probe():
    data = _jpeg_bytes(_rand_img(37, 81))
    assert native.probe(data) == (81, 37)


# --------------------------------------------------------------------------
# resize parity (the load-bearing half: Scale() feeds descriptor extraction)
# --------------------------------------------------------------------------

@pytest.mark.parametrize("in_hw,out_wh", [
    ((123, 217), (100, 57)),     # downscale
    ((123, 217), (301, 190)),    # upscale
    ((123, 217), (217, 123)),    # transpose-ish
    ((64, 64), (1050, 1050)),    # big upscale
    ((480, 640), (1050, 788)),   # benchmark-like short-side 1050
    ((31, 1), (7, 5)),           # degenerate widths
    ((1, 31), (5, 7)),
])
def test_resize_bit_exact(in_hw, out_wh):
    arr = _rand_img(*in_hw)
    pil = np.asarray(Image.fromarray(arr).resize(out_wh, Image.BILINEAR))
    nat = native.resize_bilinear(arr, out_wh)
    assert np.array_equal(pil, nat), \
        f"maxdiff={np.abs(pil.astype(int) - nat.astype(int)).max()}"


def test_fused_decode_resize_matches_two_step():
    data = _jpeg_bytes(_rand_img(240, 320), quality=90)
    pil = Image.open(io.BytesIO(data)).convert("RGB")
    want = np.asarray(pil.resize((213, 160), Image.BILINEAR))
    assert np.array_equal(native.decode(data, size=(213, 160)), want)


# --------------------------------------------------------------------------
# loader fast-path: plan eligibility + end-to-end equality with the PIL path
# --------------------------------------------------------------------------

def test_plan_eligibility():
    ok = T.create("Scale(224)", to_array=True,
                  mean=[0.5, 0.5, 0.5], std=[0.5, 0.5, 0.5])
    assert native.plan_fast_path(ok) is not None
    # uint8 device-normalize chain
    u8 = T.Compose([T.Scale(224), T.ToArray(dtype="uint8")])
    assert native.plan_fast_path(u8) is not None
    # bare ToArray (no scale)
    assert native.plan_fast_path(T.Compose([T.ToArray()])) is not None
    # augmentations / non-bilinear filters are NOT fast-pathable
    assert native.plan_fast_path(
        T.Compose([T.Scale(224, interpolation=Image.BICUBIC), T.ToArray()])) \
        is None
    assert native.plan_fast_path(
        T.Compose([T.RandomScale(100, 200), T.ToArray()])) is None
    assert native.plan_fast_path(
        T.Compose([T.Scale(224), T.RandomFlip(), T.ToArray()])) is None


@pytest.fixture(scope="module")
def synthetic_benchmark():
    from dirjax.datasets.synthetic import Synthetic

    return Synthetic()


@pytest.mark.parametrize("chain,device_normalize", [
    ("Scale(96)", False),
    ("Scale(96)", True),
    ("", False),
])
def test_loader_fast_path_equals_pil_path(synthetic_benchmark,
                                          chain, device_normalize):
    ds = synthetic_benchmark
    kw = dict(trf_chain=chain, output=("img", "img_key"),
              device_normalize=device_normalize)
    fast = get_loader(ds, native_decode=True, **kw)
    slow = get_loader(ds, native_decode=False, **kw)
    assert fast._native_fast_path() is not None
    assert slow._native_fast_path() is None
    for i in range(min(4, len(ds))):
        a, b = fast[i], slow[i]
        assert a["img_key"] == b["img_key"]
        assert a["img"].dtype == b["img"].dtype
        assert np.array_equal(a["img"], b["img"])


def test_fast_path_disabled_for_roi_datasets(synthetic_benchmark):
    qdb = synthetic_benchmark.get_query_db()
    if type(qdb).get_image is type(synthetic_benchmark).get_image:
        pytest.skip("synthetic queries are not ROI-cropped")
    loader = get_loader(qdb, trf_chain="Scale(96)")
    assert loader._native_fast_path() is None


def test_fast_path_falls_back_on_exotic_file(tmp_path):
    # one CMYK jpeg in a tiny dataset: fast path must silently take PIL
    from dirjax.datasets.generic import ImageList

    p = tmp_path / "a.jpg"
    Image.fromarray(_rand_img(40, 60)).convert("CMYK").save(p)
    lst = tmp_path / "list.txt"
    lst.write_text("a.jpg\n")
    ds = ImageList(str(lst), root=str(tmp_path))
    loader = get_loader(ds, trf_chain="Scale(32)", output=("img",))
    img = loader[0]["img"]
    pil = np.asarray(
        Image.open(p).convert("RGB").resize(
            T.Scale(32).get_params(Image.open(p).size), Image.BILINEAR),
        dtype=np.float32) / 255.0
    mean = np.float32([0.485, 0.456, 0.406])
    std = np.float32([0.229, 0.224, 0.225])
    assert np.allclose(img, (pil - mean) / std, atol=1e-6)


def test_corrupt_inputs_fail_cleanly():
    """Malformed bytes must raise (Unsupported/ValueError), never crash —
    the loader's fallback chain depends on clean failure."""
    r = np.random.default_rng(0)
    for payload in [
        b"",
        b"\xff\xd8\xff" + bytes(r.integers(0, 256, 64, np.uint8)),  # jpeg magic + garbage
        b"\x89PNG\r\n\x1a\n" + bytes(r.integers(0, 256, 64, np.uint8)),
        bytes(r.integers(0, 256, 256, np.uint8)),
    ]:
        with pytest.raises((native.Unsupported, ValueError)):
            native.decode(payload)


def test_truncated_jpeg_fails_cleanly():
    data = _jpeg_bytes(_rand_img(60, 80), quality=85)
    for cut in (len(data) // 4, len(data) // 2):
        try:
            out = native.decode(data[:cut])
            # libjpeg may "recover" a truncated scan with a warning; if it
            # returns, the shape contract must still hold
            assert out.shape == (60, 80, 3)
        except (native.Unsupported, ValueError):
            pass


def test_resize_parity_randomized_sweep():
    r = np.random.default_rng(42)
    for _ in range(20):
        ih, iw = int(r.integers(1, 300)), int(r.integers(1, 300))
        ow, oh = int(r.integers(1, 300)), int(r.integers(1, 300))
        arr = r.integers(0, 256, (ih, iw, 3), np.uint8)
        pil = np.asarray(Image.fromarray(arr).resize((ow, oh),
                                                     Image.BILINEAR))
        nat = native.resize_bilinear(arr, (ow, oh))
        assert np.array_equal(pil, nat), (ih, iw, ow, oh)
