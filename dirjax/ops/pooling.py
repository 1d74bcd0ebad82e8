"""Global spatial pooling and multi-transform descriptor pooling.

TPU-first formulation of the reference's pooling stack:

* :func:`gem_pool` — Generalized-Mean pooling
  ``f(X) = (mean(clamp(X, eps)^p))^(1/p)`` over the spatial axes
  (reference ``nets/layers/pooling.py:12-45``; learnable p per
  ``GeneralizedMeanPoolingP``, :49-55). Operates on NHWC feature maps and
  supports a validity mask so padded batch entries pool only over their
  real extent — the key enabler for static-shape bucketed batching on TPU
  (the reference falls back to batch=1 for variable sizes,
  ``test_dir.py:52-55``).
* :func:`mac_pool` / :func:`avg_pool` — max / average global pooling
  (reference ``rmac_resnet.py:24-27``).
* :func:`sympow_pool` — signed-power "gem" pooling across multiple
  transform chains (multi-scale TTA), reference ``utils/common.py:41-55``.

All functions are jit-compatible pure functions in fp32; the fused Pallas
descriptor head in :mod:`dirjax.ops.gem_head` composes gem_pool + FC +
L2-norm into one kernel for the hot path.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from .normalize import l2_normalize

__all__ = [
    "gem_pool", "mac_pool", "avg_pool", "global_pool",
    "sympow", "sympow_pool", "pool_descriptors", "center_bias_mask",
]


def _spatial_mean(x: jnp.ndarray, mask: Optional[jnp.ndarray]) -> jnp.ndarray:
    """Mean over H,W of an NHWC tensor, restricted to mask==True cells."""
    if mask is None:
        return jnp.mean(x, axis=(1, 2))
    m = mask.astype(x.dtype)[..., None]  # (B,H,W,1)
    total = jnp.sum(x * m, axis=(1, 2))
    count = jnp.maximum(jnp.sum(m, axis=(1, 2)), 1.0)
    return total / count


def gem_pool(x: jnp.ndarray, p, eps: float = 1e-6,
             mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Generalized-mean pool an NHWC feature map to (B, C).

    ``p`` may be a scalar or a 0-d/1-d array (the checkpoint's learnable p).
    Accumulates in fp32 regardless of input dtype: pow/root chains lose too
    much precision in bf16.
    """
    p = jnp.asarray(p, dtype=jnp.float32).reshape(())
    x32 = x.astype(jnp.float32)
    powed = jnp.power(jnp.clip(x32, min=eps), p)
    pooled = _spatial_mean(powed, mask)
    return jnp.power(pooled, 1.0 / p).astype(x.dtype)


def mac_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Global max pool (MAC descriptor) over H,W of NHWC -> (B, C)."""
    if mask is not None:
        neg = jnp.finfo(x.dtype).min
        x = jnp.where(mask[..., None], x, neg)
    return jnp.max(x, axis=(1, 2))


def avg_pool(x: jnp.ndarray, mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Global average pool over H,W of NHWC -> (B, C)."""
    return _spatial_mean(x, mask)


def global_pool(x: jnp.ndarray, pooling: str, p=3.0,
                mask: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Dispatch on the reference's pooling names: 'gem*', 'max' (MAC), 'avg'."""
    if pooling.startswith("gem"):
        return gem_pool(x, p, mask=mask)
    if pooling == "max":
        return mac_pool(x, mask=mask)
    if pooling == "avg":
        return avg_pool(x, mask=mask)
    raise ValueError(f"unknown pooling: {pooling}")


def sympow(x: jnp.ndarray, p, eps: float = 1e-6) -> jnp.ndarray:
    """Signed power: sign(x) * clamp(|x|, eps)^p (reference common.py:48-50)."""
    s = jnp.sign(x)
    return jnp.power(jnp.clip(x * s, min=eps), p) * s


def sympow_pool(descs: jnp.ndarray, p) -> jnp.ndarray:
    """Signed-power mean over axis 0: the 'gem' combination of descriptors
    from several transform chains (reference common.py:47-53)."""
    return sympow(jnp.mean(sympow(descs, p), axis=0), 1.0 / jnp.asarray(p, descs.dtype))


def pool_descriptors(descs, pooling: str = "mean", gemp: float = 3.0,
                     l2norm: bool = True) -> jnp.ndarray:
    """Combine a list/stack of per-chain descriptor matrices (S, N, D) into
    one (N, D), then optionally L2-normalize (reference common.py:41-55 +
    test_dir.py:121-122)."""
    if isinstance(descs, (list, tuple)):
        if len(descs) == 1:
            out = descs[0]
            return l2_normalize(out) if l2norm else out
        descs = jnp.stack(descs, axis=0)
    if pooling == "mean":
        out = jnp.mean(descs, axis=0)
    elif pooling == "gem":
        out = sympow_pool(descs, gemp)
    else:
        raise ValueError(f"Bad pooling mode: {pooling}")
    return l2_normalize(out) if l2norm else out


def center_bias_mask(h: int, w: int, bias: float, dtype=jnp.float32) -> jnp.ndarray:
    """The reference's center-bias multiplier: a 4x4 map with (1+b) in the
    center 2x2, bilinearly upsampled to (h, w) with align_corners=True
    (reference rmac_resnet.py:52-56)."""
    base = jnp.ones((4, 4), dtype=jnp.float32)
    base = base.at[1:3, 1:3].add(bias)
    # align_corners=True bilinear interpolation from 4x4 to (h, w)
    ys = jnp.linspace(0.0, 3.0, h)
    xs = jnp.linspace(0.0, 3.0, w)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, 2)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, 2)
    wy = (ys - y0)[:, None]
    wx = (xs - x0)[None, :]
    tl = base[y0][:, x0]
    tr = base[y0][:, x0 + 1]
    bl = base[y0 + 1][:, x0]
    br = base[y0 + 1][:, x0 + 1]
    out = (tl * (1 - wy) * (1 - wx) + tr * (1 - wy) * wx
           + bl * wy * (1 - wx) + br * wy * wx)
    return out.astype(dtype)
