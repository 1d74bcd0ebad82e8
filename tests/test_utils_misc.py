"""Misc util + torch export tests."""

import importlib.util

import numpy as np
import pytest

from dirjax.utils import misc


def _load_ref_funcs():
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_funcs", "/root/reference/dirtorch/utils/funcs.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    except Exception:
        return None


REF = _load_ref_funcs()


def test_sigmoid_range_endpoints():
    assert misc.sigmoid_range(2.0, 2.0, 10.0) == pytest.approx(0.0474, abs=1e-3)
    assert misc.sigmoid_range(10.0, 2.0, 10.0) == pytest.approx(0.9526, abs=1e-3)


@pytest.mark.skipif(REF is None, reason="reference funcs not importable")
def test_sigmoid_matches_reference():
    x = np.linspace(-5, 15, 30)
    np.testing.assert_allclose(misc.sigmoid_range(x, 2.0, 10.0),
                               REF.sigmoid_range(x, 2.0, 10.0), rtol=1e-12)


def test_mkdir_touch_assert(tmp_path):
    p = str(tmp_path / "a" / "b" / "f.txt")
    misc.touch(p)
    import os
    assert os.path.isfile(p)
    misc.assert_outpath(str(tmp_path / "out.npy"), ".npy")
    with pytest.raises(AssertionError):
        misc.assert_outpath(str(tmp_path / "out.txt"), ".npy")


def test_torch_export_roundtrip(tmp_path):
    torch = pytest.importorskip("torch")
    import jax

    from dirjax.models import create_model
    from dirjax.ops import fit_pca
    from dirjax.utils.checkpoints import (Checkpoint, load_checkpoint,
                                          save_torch_checkpoint)

    model = create_model("resnet18_rmac", out_dim=64)
    params = model.init(jax.random.PRNGKey(0))
    pca = fit_pca(np.random.default_rng(0).normal(size=(32, 64)))
    ckpt = Checkpoint(model=model, params=params, preprocess=model.preprocess,
                      pca={"Landmarks_clean": pca}, extra={"epoch": 5})
    path = str(tmp_path / "export.pt")
    save_torch_checkpoint(path, ckpt)

    # our loader round-trips it
    back = load_checkpoint(path)
    assert back.model.arch == "resnet18_rmac"
    np.testing.assert_allclose(back.pca["Landmarks_clean"].mean, pca.mean)
    import jax.numpy as jnp

    x = np.random.default_rng(1).normal(size=(1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(model.apply(params, jnp.asarray(x))),
        np.asarray(back.model.apply(back.params, jnp.asarray(x))), atol=1e-6)

    # and the reference's own torch model can load the state dict
    import sys
    sys.path.insert(0, "/root/reference")
    try:
        import dirtorch.nets as ref_nets
    except Exception:
        pytest.skip("reference nets not importable")
    loaded = torch.load(path, map_location="cpu", weights_only=False)
    opts = dict(loaded["model_options"])
    net = ref_nets.create_model(opts.pop("arch"), pretrained="",
                                **{k: v for k, v in opts.items()
                                   if k in ("out_dim", "pooling", "gemp",
                                            "norm_features", "without_fc")})
    net.load_state_dict(loaded["state_dict"])
    net.eval()
    with torch.no_grad():
        ref_out = net(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    ours = np.asarray(model.apply(params, jnp.asarray(x),
                                  precision=jax.lax.Precision.HIGHEST))
    cos = (ref_out.reshape(1, -1) * ours).sum()
    assert cos > 0.9999
