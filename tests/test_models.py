"""Model tests: shapes, masked pooling, registry, checkpoint round-trip, and
golden descriptor parity against the reference PyTorch implementation
(imported from /root/reference with random weights — never copied)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dirjax.models as M
from dirjax.utils import checkpoints as C


def _ref_nets():
    """Import the reference nets package (namespace package, needs torch)."""
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    try:
        import dirtorch.nets as ref_nets  # type: ignore
        return ref_nets
    except Exception:
        return None


class TestRegistry:
    def test_model_names(self):
        names = M.model_names()
        for n in ["resnet50_rmac", "resnet101_rmac", "resnet101_fpn_rmac",
                  "resnet101_fpn0_rmac", "resnet152_fpn_rmac"]:
            assert n in names

    def test_unknown_arch(self):
        with pytest.raises(NameError, match="unknown model architecture"):
            M.create_model("resnet999_rmac")

    def test_kwargs_plumbing(self):
        m = M.create_model("resnet50_rmac", out_dim=512, pooling="max")
        assert m.config.out_dim == 512
        assert m.config.pooling == "max"
        assert m.preprocess["mean"] == [0.485, 0.456, 0.406]

    def test_fpn_default_out_dim(self):
        m = M.create_model("resnet50_fpn_rmac")
        assert m.config.out_dim == 1024 + 2048


class TestForward:
    @pytest.fixture(scope="class")
    def small(self):
        model = M.create_model("resnet18_rmac", out_dim=128)
        params = model.init(jax.random.PRNGKey(0))
        return model, params

    def test_output_shape_and_norm(self, small, rng):
        model, params = small
        x = rng.normal(size=(2, 64, 96, 3)).astype(np.float32)
        out = np.asarray(model.apply(params, jnp.asarray(x)))
        assert out.shape == (2, 128)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    def test_variable_input_sizes(self, small, rng):
        model, params = small
        for h, w in [(32, 32), (65, 97)]:
            x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
            out = model.apply(params, jnp.asarray(x))
            assert out.shape == (1, 128)

    def test_masked_batch_close_to_exact(self, small, rng):
        """Padding an image into a larger canvas + mask must give nearly the
        descriptor of the exact-shape forward. Residual drift is conv halo
        into the zero padding, worst-case here (random weights, noise input,
        tiny spatial extent); real images/checkpoints behave better and the
        parity benchmark path uses exact shapes."""
        model, params = small
        h, w = 128, 128
        x = rng.normal(size=(1, h, w, 3)).astype(np.float32)
        exact = np.asarray(model.apply(params, jnp.asarray(x)))
        canvas = np.zeros((1, 160, 160, 3), dtype=np.float32)
        canvas[:, :h, :w] = x
        mask = np.zeros((1, 160, 160), dtype=bool)
        mask[:, :h, :w] = True
        padded = np.asarray(model.apply(params, jnp.asarray(canvas),
                                        mask=jnp.asarray(mask)))
        cos = float((exact * padded).sum())
        assert cos > 0.97, f"masked-pad descriptor drifted: cos={cos}"
        # and masking must never be worse than the mask-free padded forward
        # by a large margin
        unmasked = np.asarray(model.apply(params, jnp.asarray(canvas)))
        assert cos > float((exact * unmasked).sum()) - 0.02

    def test_bf16_close_to_fp32(self, small, rng):
        model, params = small
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        f32 = np.asarray(model.apply(params, jnp.asarray(x)))
        bf16 = np.asarray(model.apply(params, jnp.asarray(x), dtype=jnp.bfloat16))
        cos = float((f32 * bf16).sum())
        assert cos > 0.995, f"bf16 descriptor drifted: cos={cos}"

    def test_fpn_forward(self, rng):
        model = M.create_model("resnet18_fpn_rmac", out_dim=96)
        params = model.init(jax.random.PRNGKey(1))
        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        out = np.asarray(model.apply(params, jnp.asarray(x)))
        assert out.shape == (2, 96)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


class TestCheckpointNative:
    def test_roundtrip(self, tmp_path, rng):
        model = M.create_model("resnet18_rmac", out_dim=64)
        params = model.init(jax.random.PRNGKey(0))
        from dirjax.ops import fit_pca
        pca = fit_pca(rng.normal(size=(32, 64)))
        ckpt = C.Checkpoint(model=model, params=params,
                            preprocess=model.preprocess,
                            pca={"Landmarks_clean": pca}, extra={"epoch": 3})
        path = str(tmp_path / "ckpt.npz")
        C.save_native(path, ckpt)
        loaded = C.load_checkpoint(path)
        assert loaded.model.arch == "resnet18_rmac"
        assert loaded.model.config.out_dim == 64
        assert loaded.extra["epoch"] == 3
        np.testing.assert_allclose(loaded.pca["Landmarks_clean"].mean, pca.mean)
        x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
        out1 = np.asarray(model.apply(params, jnp.asarray(x)))
        out2 = np.asarray(loaded.model.apply(loaded.params, jnp.asarray(x)))
        np.testing.assert_allclose(out1, out2, atol=1e-6)


REF_NETS = _ref_nets()


@pytest.mark.skipif(REF_NETS is None, reason="reference torch model not importable")
class TestTorchParity:
    """Golden-descriptor parity: same (random) weights, same input ->
    cosine > 0.9999 between torch reference and our JAX forward."""

    def _parity(self, ref_arch, our_arch, imgsize=(64, 80), **options):
        import torch

        torch.manual_seed(0)
        ref = REF_NETS.create_model(ref_arch, pretrained="", **options)
        ref.eval()

        model = M.create_model(our_arch, **options)
        params = C.convert_state_dict(ref.state_dict(), model)

        rng = np.random.default_rng(0)
        x = rng.normal(size=(2, imgsize[0], imgsize[1], 3)).astype(np.float32)
        with torch.no_grad():
            ref_out = ref(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
        ours = np.asarray(model.apply(
            params, jnp.asarray(x), precision=jax.lax.Precision.HIGHEST))
        cos = (ref_out * ours).sum(axis=1)
        assert np.all(cos > 0.9999), f"parity cosines: {cos}"
        np.testing.assert_allclose(ours, ref_out, atol=2e-3)

    def test_resnet18_gem(self):
        self._parity("resnet18_rmac", "resnet18_rmac", out_dim=128)

    def test_resnet50_gem(self):
        self._parity("resnet50_rmac", "resnet50_rmac", out_dim=256)

    def test_resnet50_mac(self):
        self._parity("resnet50_rmac", "resnet50_rmac", out_dim=128, pooling="max")

    def test_resnet18_fpn(self):
        self._parity("resnet18_fpn_rmac", "resnet18_fpn_rmac", out_dim=96)

    def test_odd_input_size(self):
        self._parity("resnet18_rmac", "resnet18_rmac", imgsize=(67, 93),
                     out_dim=64)

    def test_state_dict_roundtrip(self):
        """ours -> torch names -> ours must be the identity."""
        import torch

        torch.manual_seed(1)
        ref = REF_NETS.create_model("resnet18_rmac", pretrained="", out_dim=64)
        model = M.create_model("resnet18_rmac", out_dim=64)
        params = C.convert_state_dict(ref.state_dict(), model)
        sd = C.params_to_state_dict(params, model)
        params2 = C.convert_state_dict(sd, model)
        flat1 = C._flatten(params)
        flat2 = C._flatten(params2)
        assert set(flat1) == set(flat2)
        for k in flat1:
            np.testing.assert_allclose(flat1[k], flat2[k], err_msg=k)


class TestResNeXt:
    def test_forward_shapes(self, rng):
        m = M.create_model("resnext101_32x4d_rmac", out_dim=64)
        # config sanity: grouped bottleneck widths
        assert m.config.backbone.groups == 32
        assert m.config.backbone.mid_width(64) == 128
        params = m.init(jax.random.PRNGKey(0))
        assert params["backbone"]["layer1"][0]["conv2"].shape == (3, 3, 4, 128)
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        out = np.asarray(m.apply(params, jnp.asarray(x)))
        assert out.shape == (1, 64)
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)

    def test_grouped_conv_matches_torch(self, rng):
        torch = pytest.importorskip("torch")
        from dirjax.models.resnet import _conv

        x = rng.normal(size=(2, 8, 8, 64)).astype(np.float32)
        w = rng.normal(size=(3, 3, 2, 64)).astype(np.float32)  # HWIO, groups=32
        ours = np.asarray(_conv(jnp.asarray(x), jnp.asarray(w), 1, 1, 32,
                                dtype=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        wt = torch.from_numpy(w.transpose(3, 2, 0, 1))  # OIHW
        theirs = torch.nn.functional.conv2d(xt, wt, padding=1, groups=32)
        np.testing.assert_allclose(ours, theirs.numpy().transpose(0, 2, 3, 1),
                                   rtol=1e-4, atol=1e-5)


class TestTolerantLoading:
    def test_overlay_missing_and_mismatched(self, rng):
        model = M.create_model("resnet18_rmac", out_dim=64)
        init = model.init(jax.random.PRNGKey(0))
        donor = model.init(jax.random.PRNGKey(1))
        sd = C.params_to_state_dict(donor, model)
        del sd["layer1.0.conv1.weight"]               # missing layer
        sd["fc.weight"] = np.zeros((7, 7), np.float32)  # bad shape
        merged = C.load_tolerant(init, model, sd, verbose=False)
        # matched layer came from donor
        np.testing.assert_allclose(
            merged["backbone"]["stem"]["conv"],
            np.asarray(donor["backbone"]["stem"]["conv"]))
        # missing layer kept init
        np.testing.assert_allclose(
            merged["backbone"]["layer1"][0]["conv1"],
            np.asarray(init["backbone"]["layer1"][0]["conv1"]))
        # bad-shape fc kept init
        np.testing.assert_allclose(merged["fc"]["kernel"],
                                   np.asarray(init["fc"]["kernel"]))

    def test_delete_fc(self):
        model = M.create_model("resnet18_rmac", out_dim=64)
        init = model.init(jax.random.PRNGKey(0))
        donor = model.init(jax.random.PRNGKey(1))
        sd = C.params_to_state_dict(donor, model)
        merged = C.load_tolerant(init, model, sd, delete_fc=True, verbose=False)
        np.testing.assert_allclose(merged["fc"]["kernel"],
                                   np.asarray(init["fc"]["kernel"]))
        np.testing.assert_allclose(merged["backbone"]["stem"]["conv"],
                                   np.asarray(donor["backbone"]["stem"]["conv"]))


class TestFoldedBN:
    def test_folded_matches_unfolded(self, rng):
        from dirjax.models import fold_batchnorm

        model = M.create_model("resnet18_rmac", out_dim=64)
        params = model.init(jax.random.PRNGKey(2))
        # random BN statistics so the fold actually does something
        params = jax.tree.map(lambda x: x, params)
        def perturb(node):
            if isinstance(node, dict):
                if "mean" in node and "var" in node:
                    node["mean"] = jnp.asarray(
                        np.random.default_rng(0).normal(size=node["mean"].shape),
                        jnp.float32)
                    node["var"] = jnp.asarray(
                        np.random.default_rng(1).random(node["var"].shape) + 0.5,
                        jnp.float32)
                for v in node.values():
                    perturb(v)
            elif isinstance(node, list):
                for v in node:
                    perturb(v)
        perturb(params)

        folded = dict(params)
        folded["backbone"] = fold_batchnorm(params["backbone"])
        assert "bn" not in folded["backbone"]["stem"]
        assert "bias1" in folded["backbone"]["layer1"][0]

        x = rng.normal(size=(2, 64, 64, 3)).astype(np.float32)
        ref = np.asarray(model.apply(params, jnp.asarray(x)))
        out = np.asarray(model.apply(folded, jnp.asarray(x)))
        cos = (ref * out).sum(axis=1)
        assert np.all(cos > 0.9999), f"folded drifted: {cos}"

    def test_folded_bf16(self, rng):
        from dirjax.models import fold_batchnorm

        model = M.create_model("resnet18_rmac", out_dim=64)
        params = model.init(jax.random.PRNGKey(2))
        folded = dict(params)
        folded["backbone"] = fold_batchnorm(params["backbone"])
        x = rng.normal(size=(1, 64, 64, 3)).astype(np.float32)
        f32 = np.asarray(model.apply(params, jnp.asarray(x)))
        bf = np.asarray(model.apply(folded, jnp.asarray(x), dtype=jnp.bfloat16))
        assert float((f32 * bf).sum()) > 0.99


class TestModelSize:
    @pytest.mark.skipif(REF_NETS is None, reason="reference not importable")
    def test_matches_torch_param_count(self):
        import torch

        ref = REF_NETS.create_model("resnet18_rmac", pretrained="", out_dim=64)
        ref_size = sum(v.numel() for k, v in ref.state_dict().items()
                       if not k.endswith("num_batches_tracked"))
        model = M.create_model("resnet18_rmac", out_dim=64)
        params = model.init(jax.random.PRNGKey(0))
        assert M.model_size(params) == ref_size


class TestFPNMasked:
    def test_fpn_masked_close_to_exact(self, rng):
        model = M.create_model("resnet18_fpn_rmac", out_dim=96)
        params = model.init(jax.random.PRNGKey(1))
        x = rng.normal(size=(1, 128, 128, 3)).astype(np.float32)
        exact = np.asarray(model.apply(params, jnp.asarray(x)))
        canvas = np.zeros((1, 160, 160, 3), np.float32)
        canvas[:, :128, :128] = x
        mask = np.zeros((1, 160, 160), bool)
        mask[:, :128, :128] = True
        masked = np.asarray(model.apply(params, jnp.asarray(canvas),
                                        mask=jnp.asarray(mask)))
        cos = float((exact * masked).sum())
        assert cos > 0.95, f"FPN masked-pad drifted: {cos}"
