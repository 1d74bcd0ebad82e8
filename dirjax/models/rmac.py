"""Global-descriptor heads: R-MAC family (plain + FPN).

Parity with reference ``dirtorch/nets/rmac_resnet.py:12-88`` and
``rmac_resnet_fpn.py:11-113``: backbone -> (dropout) -> (center bias) ->
global pooling (GeM with learnable p / MAC / avg) -> (feature L2) ->
FC projection -> L2-norm, yielding an (B, out_dim) unit descriptor.

TPU-first differences:
* pure ``init``/``apply`` functions over parameter pytrees,
* a validity-mask argument so padded bucket batches pool correctly
  (enables static shapes; reference runs batch=1 instead, test_dir.py:52-55),
* compute dtype is a parameter (bf16 fast path, fp32 parity path),
* the GeM -> FC -> L2 tail can be dispatched to the fused Pallas kernel
  (:mod:`dirjax.ops.gem_head`) on TPU.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.normalize import l2_normalize
from ..ops.pooling import center_bias_mask, global_pool
from .resnet import RGB_MEANS, RGB_STDS, ResNetConfig, apply_resnet, init_resnet

__all__ = ["DescriptorConfig", "init_descriptor", "apply_descriptor"]


@dataclass(frozen=True)
class DescriptorConfig:
    backbone: ResNetConfig
    out_dim: int = 2048
    pooling: str = "gem"          # 'gem' | 'max' (MAC) | 'avg'
    gemp: float = 3.0
    center_bias: float = 0.0
    norm_features: bool = False
    without_fc: bool = False
    dropout_p: Optional[float] = None
    fpn_mode: Optional[int] = None  # None = plain head; 1 = merge C5 into C4; 0 = no merge

    @property
    def feat_dim(self) -> int:
        return self.out_dim

    @property
    def fc_in_dim(self) -> int:
        if self.fpn_mode is None:
            return self.backbone.out_channels
        return self.backbone.c4_channels + self.backbone.out_channels

    @property
    def preprocess(self) -> dict:
        return {"mean": list(RGB_MEANS), "std": list(RGB_STDS), "input_size": 224}


def init_descriptor(key, cfg: DescriptorConfig) -> Dict[str, Any]:
    kb, kf, k5, k4 = jax.random.split(key, 4)
    params: Dict[str, Any] = {"backbone": init_resnet(kb, cfg.backbone)}

    if cfg.fpn_mode is not None:
        dim1 = cfg.backbone.c4_channels
        dim2 = cfg.backbone.out_channels
        if cfg.fpn_mode == 1:
            std5 = jnp.sqrt(2.0 / dim1)
            std4 = jnp.sqrt(2.0 / (9 * dim1))
            params["conv1x5"] = jax.random.normal(k5, (1, 1, dim2, dim1)) * std5
            params["conv3c4"] = jax.random.normal(k4, (3, 3, dim1, dim1)) * std4
        if cfg.pooling == "gem":
            params["pool_p_c4"] = jnp.asarray(cfg.gemp, jnp.float32)
            params["pool_p_x5"] = jnp.asarray(cfg.gemp, jnp.float32)
    elif cfg.pooling.startswith("gem"):
        # learnable p, initialized from gemp (GeneralizedMeanPoolingP)
        params["pool_p"] = jnp.asarray(cfg.gemp, jnp.float32)

    if not cfg.without_fc:
        fan_in = cfg.fc_in_dim
        bound = 1.0 / jnp.sqrt(fan_in)
        params["fc"] = {
            "kernel": jax.random.uniform(kf, (fan_in, cfg.out_dim),
                                         minval=-bound, maxval=bound),
            "bias": jnp.zeros((cfg.out_dim,), jnp.float32),
        }
    return params


def _dropout(x, rate, rng):
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


def _pool(cfg: DescriptorConfig, params, x, mask, p_name="pool_p",
          center_bias=True):
    if center_bias and cfg.center_bias > 0:
        bias = center_bias_mask(x.shape[1], x.shape[2], cfg.center_bias,
                                dtype=x.dtype)
        x = x * bias[None, :, :, None]
    p = params.get(p_name, cfg.gemp)
    return global_pool(x, cfg.pooling, p=p, mask=mask)


def _downsample_mask(mask: jnp.ndarray, stride: int, fh: int, fw: int):
    """Min-pool an input-resolution (B, H, W) validity mask by ``stride`` and
    align it to the backbone's (B, fh, fw) feature shape.

    Min-pool semantics: a feature cell counts as valid only when its FULL
    stride window is valid — cells whose window mixes canvas padding would
    pool polluted activations, so they are dropped. The backbone emits
    ceil(H/stride) cells while the stride-window reduction yields
    floor(H/stride); the ragged edge (a partial window, invalid by the same
    rule) is padded with False, and any excess is sliced.
    """
    m = mask[..., None].astype(jnp.float32)
    pooled = -jax.lax.reduce_window(
        -m, -jnp.inf, jax.lax.max, (1, stride, stride, 1),
        (1, stride, stride, 1), [(0, 0), (0, 0), (0, 0), (0, 0)])
    valid = pooled[..., 0] > 0.5
    valid = valid[:, :fh, :fw]
    pad_h, pad_w = fh - valid.shape[1], fw - valid.shape[2]
    if pad_h > 0 or pad_w > 0:
        valid = jnp.pad(valid, ((0, 0), (0, max(pad_h, 0)), (0, max(pad_w, 0))),
                        constant_values=False)
    return valid


def apply_descriptor(params, images, cfg: DescriptorConfig, *,
                     mask: Optional[jnp.ndarray] = None,
                     train: bool = False, rng=None,
                     dtype=jnp.float32, precision=None,
                     fused_head: bool = False) -> jnp.ndarray:
    """Compute (B, out_dim) L2-normalized global descriptors.

    ``images``: NHWC float input, already preprocessed (mean/std-normalized).
    ``mask``: optional (B, H, W) bool validity map at *input* resolution for
    padded bucket batches; it is min-pooled down to feature resolution so a
    feature cell counts as valid only when its full stride window is valid
    (see :func:`_downsample_mask`).
    """
    feat_mask = None
    c4_mask = None

    if cfg.fpn_mode is None:
        x = apply_resnet(params["backbone"], images, cfg.backbone,
                         dtype=dtype, precision=precision, grad_safe=train)
        if cfg.dropout_p is not None and train:
            x = _dropout(x, cfg.dropout_p, rng)
        if mask is not None:
            feat_mask = _downsample_mask(mask, 32, x.shape[1], x.shape[2])
        if (fused_head and not train and cfg.pooling.startswith("gem")
                and cfg.center_bias == 0 and not cfg.norm_features
                and not cfg.without_fc):
            # single Pallas kernel: masked GeM -> FC -> L2 (ops/gem_head.py)
            from ..ops.gem_head import fused_gem_head

            return fused_gem_head(
                x.astype(jnp.float32), params.get("pool_p", cfg.gemp),
                params["fc"]["kernel"], params["fc"]["bias"],
                mask=feat_mask)
        desc = _pool(cfg, params, x, feat_mask)
    else:
        c4, c5 = apply_resnet(params["backbone"], images, cfg.backbone,
                              out_layer=-1, dtype=dtype, precision=precision,
                              grad_safe=train)
        if cfg.fpn_mode == 1:
            # nearest-neighbor upsample C5 to C4 resolution, 1x1 conv, merge
            up = jnp.repeat(jnp.repeat(c5, 2, axis=1), 2, axis=2)
            up = up[:, :c4.shape[1], :c4.shape[2], :]
            merged = jax.lax.conv_general_dilated(
                up.astype(dtype), params["conv1x5"].astype(dtype), (1, 1),
                [(0, 0), (0, 0)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision, preferred_element_type=jnp.float32)
            c4 = c4 + jax.nn.relu(merged)
            c4 = jax.lax.conv_general_dilated(
                c4.astype(dtype), params["conv3c4"].astype(dtype), (1, 1),
                [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
                precision=precision, preferred_element_type=jnp.float32)
            c4 = jax.nn.relu(c4)
        if cfg.dropout_p is not None and train:
            r4, r5 = jax.random.split(rng)
            c4 = _dropout(c4, cfg.dropout_p, r4)
            c5 = _dropout(c5, cfg.dropout_p, r5)
        if mask is not None:
            c4_mask = _downsample_mask(mask, 16, c4.shape[1], c4.shape[2])
            feat_mask = _downsample_mask(mask, 32, c5.shape[1], c5.shape[2])
        # the reference's FPN head accepts center_bias but never applies it
        # (rmac_resnet_fpn.py forward) — match that for checkpoint parity
        d5 = _pool(cfg, params, c5, feat_mask, "pool_p_x5", center_bias=False)
        d4 = _pool(cfg, params, c4, c4_mask, "pool_p_c4", center_bias=False)
        desc = jnp.concatenate([d4, d5], axis=1)

    if cfg.norm_features:
        desc = l2_normalize(desc, axis=1)
    if not cfg.without_fc:
        desc = jnp.matmul(desc.astype(jnp.float32), params["fc"]["kernel"],
                          precision=precision,
                          preferred_element_type=jnp.float32)
        desc = desc + params["fc"]["bias"]
    return l2_normalize(desc, axis=-1)
