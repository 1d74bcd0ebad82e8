"""Batch-sharded descriptor extraction (the DataParallel replacement).

The reference scatters each batch across GPUs with ``nn.DataParallel``
(``common.py:150-175``). Here the jitted forward runs SPMD: the batch axis
is sharded over the mesh's "data" axis, parameters are replicated, and XLA
partitions the convs with zero cross-device traffic (global pooling is
per-image, so no halo exchange is ever needed).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import Model
from ..models.rmac import apply_descriptor

__all__ = ["ShardedExtractor"]


class ShardedExtractor:
    """Like :class:`dirjax.extraction.FeatureExtractor` but SPMD over a
    mesh: pads the batch up to the "data"-axis size, shards it, and returns
    per-image descriptors. Drop-in for the extraction pipeline."""

    def __init__(self, model: Model, params, mesh: Mesh,
                 dtype=jnp.float32, precision=None, axis: str = "data",
                 preprocess=None):
        self.model = model
        self.mesh = mesh
        self.axis = axis
        self.n_shards = mesh.shape[axis]
        cfg = model.config

        batch_sharding = NamedSharding(mesh, P(axis))
        self.params = jax.device_put(params, NamedSharding(mesh, P()))

        self.preprocess = dict(model.preprocess)
        if preprocess:
            self.preprocess.update(preprocess)
        pre = self.preprocess
        scale = tuple(1.0 / (255.0 * s) for s in pre["std"])
        offset = tuple(m / s for m, s in zip(pre["mean"], pre["std"]))

        @functools.partial(jax.jit, static_argnames=("with_mask",),
                           in_shardings=(NamedSharding(mesh, P()),
                                         batch_sharding, batch_sharding),
                           out_shardings=batch_sharding)
        def _forward(params, images, mask, with_mask):
            if images.dtype == jnp.uint8:
                images = (images.astype(jnp.float32)
                          * jnp.asarray(scale, jnp.float32)
                          - jnp.asarray(offset, jnp.float32))
            return apply_descriptor(params, images, cfg,
                                    mask=mask if with_mask else None,
                                    dtype=dtype, precision=precision)

        self._forward = _forward

    def __call__(self, images, mask: Optional[jnp.ndarray] = None):
        import numpy as np

        n = images.shape[0]
        pad = (-n) % self.n_shards
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad,) + images.shape[1:], images.dtype)])
            if mask is not None:
                mask = np.concatenate(
                    [mask, np.zeros((pad,) + mask.shape[1:], mask.dtype)])
        mask_arr = (jnp.asarray(mask) if mask is not None
                    else jnp.zeros(images.shape[:3], bool))
        out = self._forward(self.params, jnp.asarray(images), mask_arr,
                            mask is not None)
        return out[:n]

    def call_adaptive(self, images, mask: Optional[jnp.ndarray] = None):
        """OOM-surviving ``__call__`` (halving recursion; ``__call__``
        re-pads each half up to the shard count, so the sharding contract
        holds at every recursion depth)."""
        from ..extraction import adaptive_call

        return adaptive_call(self, images, mask)
