"""L2 normalization helpers (reference ``rmac_resnet.py:7-9`` semantics:
torch F.normalize with p=2, i.e. division by max(norm, eps))."""

from __future__ import annotations

import jax.numpy as jnp


def l2_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """x / max(||x||_2, eps) along ``axis`` — matches torch.nn.functional.normalize."""
    norm = jnp.linalg.norm(x, axis=axis, keepdims=True)
    return x / jnp.maximum(norm, eps)
