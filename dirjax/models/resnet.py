"""Functional NHWC ResNet backbone.

TPU-first re-design of the reference backbone
(``dirtorch/nets/backbones/resnet.py:15-199``): pure functions over explicit
parameter pytrees instead of nn.Module state.

* NHWC activations / HWIO weights — the TPU-native convolution layout.
* BatchNorm is evaluated as a fused affine (inference statistics); the
  fine-tuning recipe of the reference freezes BN anyway
  (``utils/common.py:187-202``), so the same pure function serves training.
* Compute dtype is a parameter: bf16 feeds the MXU at full rate with fp32
  accumulation (``preferred_element_type``); fp32 + HIGHEST precision gives
  bit-comparable parity with the PyTorch reference.

Stage/block structure, strides, and He initialization match the reference
(BasicBlock resnet.py:15-44, Bottleneck :46-87, stem+4 stages :102-123,
reset_weights :92-99) so released checkpoints convert weight-for-weight.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

__all__ = ["ResNetConfig", "init_resnet", "apply_resnet", "BN_EPS",
           "RGB_MEANS", "RGB_STDS", "fold_batchnorm", "is_folded"]

BN_EPS = 1e-5  # torch BatchNorm2d default

# ImageNet preprocessing constants (reference resnet.py:110-112)
RGB_MEANS = (0.485, 0.456, 0.406)
RGB_STDS = (0.229, 0.224, 0.225)

_BLOCK_EXPANSION = {"basic": 1, "bottleneck": 4}
_STAGE_PLANES = (64, 128, 256, 512)


@dataclass(frozen=True)
class ResNetConfig:
    """Static architecture description (hashable, usable as a jit static arg).

    ``groups``/``base_width`` generalize the bottleneck to ResNeXt
    (Xie et al.): the 3x3 conv becomes a grouped conv of width
    ``planes * base_width/64 * groups`` — a working replacement for the
    reference's dead Torch7-converted ResNeXt-101 32x4d
    (``nets/backbones/resnext101_features.py``, ``rmac_resnext.py``, which
    is unimported and broken upstream, SURVEY.md §2)."""

    block: str                  # 'basic' | 'bottleneck'
    layers: Tuple[int, ...]     # blocks per stage, e.g. (3, 4, 23, 3)
    name: str = "resnet"
    groups: int = 1
    base_width: int = 64

    @property
    def expansion(self) -> int:
        return _BLOCK_EXPANSION[self.block]

    def mid_width(self, planes: int) -> int:
        """Bottleneck middle width (ResNeXt generalization)."""
        return int(planes * self.base_width / 64.0) * self.groups

    @property
    def out_channels(self) -> int:
        return 512 * self.expansion

    @property
    def c4_channels(self) -> int:
        return 256 * self.expansion


RESNET_CONFIGS = {
    "resnet18": ResNetConfig("basic", (2, 2, 2, 2), "resnet18"),
    "resnet50": ResNetConfig("bottleneck", (3, 4, 6, 3), "resnet50"),
    "resnet101": ResNetConfig("bottleneck", (3, 4, 23, 3), "resnet101"),
    "resnet152": ResNetConfig("bottleneck", (3, 8, 36, 3), "resnet152"),
    "resnext101_32x4d": ResNetConfig("bottleneck", (3, 4, 23, 3),
                                     "resnext101_32x4d", groups=32,
                                     base_width=4),
}


# --------------------------------------------------------------------------
# initialization
# --------------------------------------------------------------------------

def _he_conv(key, kh, kw, cin, cout) -> jnp.ndarray:
    """He-normal init with fan = kh*kw*cout, matching the reference's
    reset_weights (resnet.py:92-99)."""
    std = jnp.sqrt(2.0 / (kh * kw * cout))
    return jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * std


def _init_bn(c) -> Dict[str, jnp.ndarray]:
    return {
        "scale": jnp.ones((c,), jnp.float32),
        "bias": jnp.zeros((c,), jnp.float32),
        "mean": jnp.zeros((c,), jnp.float32),
        "var": jnp.ones((c,), jnp.float32),
    }


def _init_block(key, cfg: ResNetConfig, cin: int, planes: int,
                stride: int) -> Dict[str, Any]:
    keys = jax.random.split(key, 4)
    cout = planes * cfg.expansion
    if cfg.block == "basic":
        block = {
            "conv1": _he_conv(keys[0], 3, 3, cin, planes),
            "bn1": _init_bn(planes),
            "conv2": _he_conv(keys[1], 3, 3, planes, planes),
            "bn2": _init_bn(planes),
        }
    else:
        mid = cfg.mid_width(planes)
        block = {
            "conv1": _he_conv(keys[0], 1, 1, cin, mid),
            "bn1": _init_bn(mid),
            # grouped 3x3: HWIO weight with I = mid/groups
            "conv2": _he_conv(keys[1], 3, 3, mid // cfg.groups, mid),
            "bn2": _init_bn(mid),
            "conv3": _he_conv(keys[2], 1, 1, mid, cout),
            "bn3": _init_bn(cout),
        }
    if stride != 1 or cin != cout:
        block["downsample"] = {
            "conv": _he_conv(keys[3], 1, 1, cin, cout),
            "bn": _init_bn(cout),
        }
    return block


def init_resnet(key, cfg: ResNetConfig) -> Dict[str, Any]:
    """Random parameter pytree for the backbone."""
    k_stem, *k_stages = jax.random.split(key, 5)
    params: Dict[str, Any] = {
        "stem": {"conv": _he_conv(k_stem, 7, 7, 3, 64), "bn": _init_bn(64)},
    }
    cin = 64
    for s, (planes, nblocks) in enumerate(zip(_STAGE_PLANES, cfg.layers)):
        stride = 1 if s == 0 else 2
        keys = jax.random.split(k_stages[s], nblocks)
        blocks = []
        for b in range(nblocks):
            blocks.append(
                _init_block(keys[b], cfg, cin, planes, stride if b == 0 else 1))
            cin = planes * cfg.expansion
        params[f"layer{s + 1}"] = blocks
    return params


# --------------------------------------------------------------------------
# forward
# --------------------------------------------------------------------------

def _conv(x, w, stride=1, padding=0, groups=1, *, dtype, precision,
          out_dtype=jnp.float32, grad_safe=False):
    """NHWC conv. ``out_dtype``: fp32 for the BN-affine path (accumulation
    stays fp32 across the elementwise chain); the folded inference path
    emits ``dtype`` directly so activations stay bf16 in HBM (the MXU still
    accumulates fp32 internally either way).

    ``grad_safe``: under autodiff, a conv whose preferred output dtype
    differs from its input dtype produces a mixed-dtype transpose call
    (f32 cotangent vs bf16 weights) that jax rejects; emit the input dtype
    and convert explicitly instead (measured ~6% slower — training only)."""
    pad = ((padding, padding), (padding, padding))
    if grad_safe and dtype != out_dtype:
        out = jax.lax.conv_general_dilated(
            x.astype(dtype), w.astype(dtype),
            window_strides=(stride, stride), padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups, precision=precision)
        return out.astype(out_dtype)
    out = jax.lax.conv_general_dilated(
        x.astype(dtype), w.astype(dtype),
        window_strides=(stride, stride), padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
        precision=precision, preferred_element_type=out_dtype)
    return out


def _bn(x, p):
    """Inference batch-norm as a fused affine in fp32."""
    inv = jax.lax.rsqrt(p["var"] + BN_EPS)
    return x * (p["scale"] * inv) + (p["bias"] - p["mean"] * p["scale"] * inv)


def _max_pool_3x3s2(x):
    """torch MaxPool2d(kernel=3, stride=2, padding=1) equivalent."""
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)])


def _stem_conv_s2d(x, w, *, dtype, precision, grad_safe=False):
    """The 7x7/stride-2 stem conv via space-to-depth — mathematically exact.

    A 3-channel conv runs at ~3/128 MXU lane utilization and dominated the
    measured forward (~34% of R101@1024x768). Rearranging 2x2 pixel patches
    into channels turns it into a 4x4/stride-1 conv over 12 channels:
    y[i,j] = sum_{a,b} x[2i+a-3, 2j+b-3] w[a,b]  with  x[u,v] =
    xs[u//2, v//2, (u%2, v%2)] gives kernel taps alpha = (a-3+2*2)//2 in
    0..3 and parity slot a%2... concretely a = 2*alpha + pu - 1, b = 2*beta
    + pv - 1, with out-of-range (a,b) entries zero.

    NOTE: measured SLOWER than the direct 7x7 conv on this XLA version
    (4.7ms vs 1.2ms at 4x1024x768 bf16) — XLA's own stem lowering is already
    strong; kept as an option for other toolchains. Off by default.
    """
    B, H, W, C = x.shape
    cout = w.shape[-1]
    pad_h, pad_w = H % 2, W % 2
    if pad_h or pad_w:
        # zero rows/cols beyond the image behave exactly like the original
        # conv's implicit zero padding
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        H, W = H + pad_h, W + pad_w
    xs = x.reshape(B, H // 2, 2, W // 2, 2, C)
    xs = xs.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)

    ws = jnp.zeros((4, 4, 4 * C, cout), w.dtype)
    for alpha in range(4):
        for pu in (0, 1):
            a = 2 * alpha + pu - 1
            if not 0 <= a <= 6:
                continue
            for beta in range(4):
                for pv in (0, 1):
                    b = 2 * beta + pv - 1
                    if not 0 <= b <= 6:
                        continue
                    slot = (pu * 2 + pv) * C
                    ws = ws.at[alpha, beta, slot:slot + C, :].set(w[a, b])

    if grad_safe and dtype != jnp.float32:
        # same mixed-dtype transpose hazard as _conv's grad_safe branch:
        # emit the compute dtype and widen explicitly under autodiff
        out = jax.lax.conv_general_dilated(
            xs.astype(dtype), ws.astype(dtype), (1, 1), ((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"), precision=precision)
        return out.astype(jnp.float32)
    out = jax.lax.conv_general_dilated(
        xs.astype(dtype), ws.astype(dtype), (1, 1), ((2, 1), (2, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=precision, preferred_element_type=jnp.float32)
    return out


def _apply_block(x, p, cfg: ResNetConfig, stride: int, *, dtype, precision,
                 grad_safe=False):
    residual = x
    ckw = dict(dtype=dtype, precision=precision, grad_safe=grad_safe)
    if cfg.block == "basic":
        out = _bn(_conv(x, p["conv1"], stride, 1, **ckw), p["bn1"])
        out = jax.nn.relu(out)
        out = _bn(_conv(out, p["conv2"], 1, 1, **ckw), p["bn2"])
    else:
        out = _bn(_conv(x, p["conv1"], 1, 0, **ckw), p["bn1"])
        out = jax.nn.relu(out)
        out = _bn(_conv(out, p["conv2"], stride, 1, cfg.groups, **ckw), p["bn2"])
        out = jax.nn.relu(out)
        out = _bn(_conv(out, p["conv3"], 1, 0, **ckw), p["bn3"])
    if "downsample" in p:
        residual = _bn(
            _conv(x, p["downsample"]["conv"], stride, 0, **ckw),
            p["downsample"]["bn"])
    # cast the block OUTPUT to the compute dtype: the conv+affine+relu chain
    # still runs fp32 inside the fused epilogue, but the activation written
    # to HBM is bf16 — halves inter-block traffic (measured +12% img/s at
    # batch 4, and removes the batch-8 cliff: 290 -> 428 img/s, R101
    # @1024x768). The next conv casts to `dtype` anyway, so nothing
    # downstream sees more precision if we keep fp32 here.
    return jax.nn.relu(out + residual.astype(out.dtype)).astype(dtype)


# --------------------------------------------------------------------------
# folded-BN inference fast path
# --------------------------------------------------------------------------

def fold_batchnorm(params):
    """Fold every (conv, bn) pair into (conv', bias): w' = w * s/sqrt(v+eps)
    per output channel, b' = b - m*s/sqrt(v+eps). Inference-only transform.

    NOTE: on TPU the default BN-affine path is the fast one — XLA fuses the
    affine+relu into the conv epilogue, and measured folded variants were
    slower (bf16-output conv lowerings ran ~8x slower on v5e). Folding is
    still useful for weight export and non-XLA backends."""
    import numpy as np

    def fold_pair(w, bn):
        inv = np.asarray(bn["scale"]) / np.sqrt(np.asarray(bn["var"]) + BN_EPS)
        w2 = np.asarray(w) * inv[None, None, None, :]
        b2 = np.asarray(bn["bias"]) - np.asarray(bn["mean"]) * inv
        return w2.astype(np.float32), b2.astype(np.float32)

    def walk(node):
        if isinstance(node, list):
            return [walk(v) for v in node]
        if not isinstance(node, dict):
            return node
        out = {}
        for key, val in node.items():
            if key == "bn" or key.startswith("bn"):
                continue  # consumed with its conv below
            if key == "conv" and "bn" in node:
                w2, b2 = fold_pair(val, node["bn"])
                out["conv"], out["bias"] = w2, b2
            elif key.startswith("conv") and ("bn" + key[4:]) in node:
                w2, b2 = fold_pair(val, node["bn" + key[4:]])
                out[key], out["bias" + key[4:]] = w2, b2
            else:
                out[key] = walk(val)
        return out

    return walk(params)


def is_folded(params) -> bool:
    return "bn" not in params["stem"]


def _apply_block_folded(x, p, cfg: ResNetConfig, stride: int, *, dtype,
                        precision, grad_safe=False):
    def cb(x_, w, b, stride_, pad_, groups=1):
        # f32 conv output: bf16-out conv lowerings measured ~8x slower on
        # v5e; the epilogue (bias+relu+cast) fuses into the conv either way
        out = _conv(x_, w, stride_, pad_, groups, dtype=dtype,
                    precision=precision)
        return out + b

    residual = x
    if cfg.block == "basic":
        out = jax.nn.relu(cb(x, p["conv1"], p["bias1"], stride, 1))
        out = cb(out, p["conv2"], p["bias2"], 1, 1)
    else:
        out = jax.nn.relu(cb(x, p["conv1"], p["bias1"], 1, 0))
        out = jax.nn.relu(cb(out, p["conv2"], p["bias2"], stride, 1, cfg.groups))
        out = cb(out, p["conv3"], p["bias3"], 1, 0)
    if "downsample" in p:
        residual = cb(x, p["downsample"]["conv"], p["downsample"]["bias"],
                      stride, 0)
    return jax.nn.relu(out + residual.astype(out.dtype)).astype(dtype)


def apply_resnet(params, x, cfg: ResNetConfig, *, out_layer: int = 0,
                 dtype=jnp.float32,
                 precision=None, stem_s2d: bool = False, grad_safe: bool = False):
    """Backbone forward on NHWC input (B, H, W, 3).

    ``out_layer=0`` returns the C5 feature map (B, H/32, W/32, 512*exp);
    ``out_layer=-1`` returns the (C4, C5) pair for FPN heads
    (reference resnet.py:157-168).
    ``dtype`` is the conv compute dtype (bf16 for speed). Convs accumulate
    and run their affine+relu epilogues in fp32 (XLA fuses the elementwise
    chain into the conv), but activations WRITTEN between blocks are cast to
    ``dtype`` — halving inter-block HBM traffic, the measured bottleneck at
    bf16 (fp32 writes cost ~12% img/s at batch 4 and 2x at batch 8).
    """
    kw = dict(dtype=dtype, precision=precision, grad_safe=grad_safe)
    folded = "bn" not in params["stem"]
    stem_conv = (
        (lambda x_, w_, **k: _stem_conv_s2d(x_, w_, **k))
        if stem_s2d else (lambda x_, w_, **k: _conv(x_, w_, 2, 3, **k)))
    if folded:
        kw.pop("grad_safe", None)  # folded path is inference-only
        x = stem_conv(x, params["stem"]["conv"], **kw)
        x = x + params["stem"]["bias"]
        block_fn = _apply_block_folded
    else:
        x = _bn(stem_conv(x, params["stem"]["conv"], **kw),
                params["stem"]["bn"])
        block_fn = _apply_block
    x = jax.nn.relu(x)
    # bf16 through the maxpool halves the largest activation's HBM traffic
    # (the blocks cast to the compute dtype at their first conv anyway)
    x = _max_pool_3x3s2(x.astype(dtype))

    for s in range(4):
        stride = 1 if s == 0 else 2
        for b, block in enumerate(params[f"layer{s + 1}"]):
            x = block_fn(x, block, cfg, stride if b == 0 else 1, **kw)
        if s == 2 and out_layer == -1:
            c4 = x
    if out_layer == -1:
        return c4, x
    return x
