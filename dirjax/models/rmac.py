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


def _pool(cfg: DescriptorConfig, params, x, mask, p_name="pool_p"):
    if cfg.center_bias > 0:
        bias = center_bias_mask(x.shape[1], x.shape[2], cfg.center_bias,
                                dtype=x.dtype)
        x = x * bias[None, :, :, None]
    p = params.get(p_name, cfg.gemp)
    return global_pool(x, cfg.pooling, p=p, mask=mask)


def apply_descriptor(params, images, cfg: DescriptorConfig, *,
                     mask: Optional[jnp.ndarray] = None,
                     train: bool = False, rng=None,
                     dtype=jnp.float32, precision=None,
                     fused_head: bool = False) -> jnp.ndarray:
    """Compute (B, out_dim) L2-normalized global descriptors.

    ``images``: NHWC float input, already preprocessed (mean/std-normalized).
    ``mask``: optional (B, H, W) bool validity map at *input* resolution for
    padded bucket batches; it is max-pooled down to feature resolution so a
    feature cell counts as valid if any of its receptive stride window is.
    """
    feat_mask = None
    c4_mask = None
    if mask is not None:
        m = mask[..., None].astype(jnp.float32)
        m32 = -jax.lax.reduce_window(
            -m, -jnp.inf, jax.lax.max, (1, 32, 32, 1), (1, 32, 32, 1),
            [(0, 0), (0, 0), (0, 0), (0, 0)])  # min-pool: fully-valid cells
        feat_mask = m32[..., 0] > 0.5

    if cfg.fpn_mode is None:
        x = apply_resnet(params["backbone"], images, cfg.backbone,
                         dtype=dtype, precision=precision, grad_safe=train)
        if cfg.dropout_p is not None and train:
            x = _dropout(x, cfg.dropout_p, rng)
        if feat_mask is not None and feat_mask.shape[1:] != x.shape[1:3]:
            feat_mask = feat_mask[:, :x.shape[1], :x.shape[2]]
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
        if feat_mask is not None:
            c4_mask = feat_mask  # C4 is stride 16: recompute from input mask
            m = mask[..., None].astype(jnp.float32)
            m16 = -jax.lax.reduce_window(
                -m, -jnp.inf, jax.lax.max, (1, 16, 16, 1), (1, 16, 16, 1),
                [(0, 0), (0, 0), (0, 0), (0, 0)])
            c4_mask = (m16[..., 0] > 0.5)[:, :c4.shape[1], :c4.shape[2]]
            feat_mask = feat_mask[:, :c5.shape[1], :c5.shape[2]]
        d5 = _pool(cfg, params, c5, feat_mask, "pool_p_x5")
        d4 = _pool(cfg, params, c4, c4_mask, "pool_p_c4")
        desc = jnp.concatenate([d4, d5], axis=1)

    if cfg.norm_features:
        desc = l2_normalize(desc, axis=1)
    if not cfg.without_fc:
        desc = jnp.matmul(desc.astype(jnp.float32), params["fc"]["kernel"],
                          precision=precision,
                          preferred_element_type=jnp.float32)
        desc = desc + params["fc"]["bias"]
    return l2_normalize(desc, axis=-1)
