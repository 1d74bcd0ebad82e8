"""Fused Pallas descriptor head: masked GeM-pool -> FC -> L2-norm.

One kernel per batch row replaces the reference's adpool + fc + normalize
module chain (``rmac_resnet.py:58-68``): the C5 feature map is streamed
through VMEM in H-tiles (double-buffered by the Pallas pipeline), the
GeM accumulator never leaves VMEM, the FC weights are DMA'd in D-tiles from
HBM at the final grid step, and the L2 normalization happens on the (1, D)
result in VMEM — so the only HBM traffic is one read of the features + one
read of the weights + one (B, D) write. XLA's unfused lowering would
materialize the pooled (B, C) and projected (B, D) intermediates in HBM and
launch separate fusions.

Accumulation is fp32 throughout (pow/root chains are precision-critical,
SURVEY.md §7 hard parts). Falls back to the XLA composition off-TPU or for
head variants the kernel doesn't cover (MAC/avg, norm_features, no-FC).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .normalize import l2_normalize
from .pooling import gem_pool

__all__ = ["fused_gem_head", "gem_head_reference"]

_EPS = 1e-6


def gem_head_reference(x, mask, p, w, b, eps: float = _EPS):
    """XLA composition (also the numerical oracle for the kernel)."""
    pooled = gem_pool(x, p, eps=eps, mask=mask)
    out = jnp.matmul(pooled.astype(jnp.float32), w,
                     preferred_element_type=jnp.float32) + b
    return l2_normalize(out, axis=-1)


def _kernel(p_ref, x_ref, mask_ref, w_hbm, b_ref, out_ref,
            acc_ref, cnt_ref, dvec_ref, *, h_tiles, eps, d_tile):
    """Grid = (B, h_tiles). Accumulate masked sum(clamp(x, eps)^p) over the
    H dimension; on the last H step, finish the mean/root, stream FC weight
    D-tiles from HBM, project, and L2-normalize."""
    h = pl.program_id(1)

    @pl.when(h == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        cnt_ref[0, 0] = 0.0

    p = p_ref[0, 0]
    x = x_ref[0].astype(jnp.float32)              # (Ht, W, C)
    m = mask_ref[0].astype(jnp.float32)           # (Ht, W)
    powed = jnp.exp(p * jnp.log(jnp.maximum(x, eps)))  # clamp + pow
    powed = powed * m[..., None]
    acc_ref[...] += jnp.sum(powed, axis=(0, 1))[None, :]  # (1, C)
    cnt_ref[0, 0] += jnp.sum(m)

    @pl.when(h == h_tiles - 1)
    def _finish():
        count = jnp.maximum(cnt_ref[0, 0], 1.0)
        pooled = jnp.exp(jnp.log(acc_ref[...] / count) / p)  # (1, C)

        d_out = dvec_ref.shape[1]
        n_tiles = d_out // d_tile

        def body(w_tile, sem):
            def project(t, _):
                dma = pltpu.make_async_copy(
                    w_hbm.at[:, pl.ds(t * d_tile, d_tile)], w_tile, sem)
                dma.start()
                dma.wait()
                dvec_ref[:, pl.ds(t * d_tile, d_tile)] = jax.lax.dot_general(
                    pooled, w_tile[...],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, n_tiles, project, 0)

        pl.run_scoped(
            body,
            pltpu.VMEM((acc_ref.shape[1], d_tile), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        )
        vec = dvec_ref[...] + b_ref[...]
        inv = jax.lax.rsqrt(jnp.maximum(jnp.sum(vec * vec), 1e-24))
        out_ref[...] = (vec * inv)[None]


def _pick_h_tile(h: int, w: int, c: int, budget_bytes: int = 4 * 2 ** 20) -> int:
    """H-tile: multiple of 8 (Mosaic sublane tiling on the (Ht, W) mask
    block) within the VMEM budget."""
    per_row = w * c * 4
    ht = max(8, (budget_bytes // max(per_row, 1)) // 8 * 8)
    return min(((h + 7) // 8) * 8, ht)


def _pick_d_tile(d: int):
    """Weight-DMA tile: full width when it fits VMEM, else a 128-aligned
    divisor (Mosaic lane slices must be 128-aligned, and so must the weight
    array's lane dim itself). None = not tileable -> XLA fallback."""
    if d % 128 != 0:
        return None
    if d <= 512:
        return d
    for cand in (512, 384, 256, 128):
        if d % cand == 0:
            return cand
    return None


@functools.partial(jax.jit, static_argnames=("eps", "interpret"))
def _fused_call(x, mask, p, w, b, eps: float = _EPS, interpret: bool = False):
    B, H, W, C = x.shape
    D = w.shape[1]
    d_tile = _pick_d_tile(D)
    assert d_tile is not None and D % d_tile == 0

    ht = _pick_h_tile(H, W, C)
    h_tiles = pl.cdiv(H, ht)
    pad_h = h_tiles * ht - H
    if pad_h:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
        mask = jnp.pad(mask, ((0, 0), (0, pad_h), (0, 0)))

    p_arr = jnp.asarray(p, jnp.float32).reshape(1, 1)

    kernel = functools.partial(_kernel, h_tiles=h_tiles, eps=eps, d_tile=d_tile)
    out = pl.pallas_call(
        kernel,
        grid=(B, h_tiles),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),           # p
            pl.BlockSpec((1, ht, W, C), lambda b_, h_: (b_, h_, 0, 0),
                         memory_space=pltpu.VMEM),           # x tile
            pl.BlockSpec((1, ht, W), lambda b_, h_: (b_, h_, 0),
                         memory_space=pltpu.VMEM),           # mask tile
            pl.BlockSpec(memory_space=pl.ANY),               # fc weights (HBM)
            pl.BlockSpec((1, D), lambda b_, h_: (0, 0),
                         memory_space=pltpu.VMEM),           # fc bias
        ],
        # (B, 1, D) keeps the block's trailing dims tiling-legal on Mosaic
        out_specs=pl.BlockSpec((1, 1, D), lambda b_, h_: (b_, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 1, D), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((1, C), jnp.float32),   # gem accumulator
            pltpu.SMEM((1, 1), jnp.float32),   # valid-cell count
            pltpu.VMEM((1, D), jnp.float32),   # projected vector
        ],
        interpret=interpret,
    )(p_arr, x, mask, w, b.reshape(1, D))
    return out[:, 0, :]


def fused_gem_head(x, p, w, b, mask: Optional[jnp.ndarray] = None,
                   eps: float = _EPS, use_pallas: Optional[bool] = None):
    """GeM-pool an NHWC feature map, project with (C, D) weights + bias,
    L2-normalize. ``use_pallas=None`` auto-selects: the kernel on TPU,
    the XLA composition elsewhere."""
    x = jnp.asarray(x)
    if mask is None:
        mask_arr = jnp.ones(x.shape[:3], jnp.float32)
    else:
        mask_arr = jnp.asarray(mask, jnp.float32)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas and _pick_d_tile(int(w.shape[1])) is None:
        use_pallas = False  # out_dim not 128-tileable for the weight DMA
    if not use_pallas:
        m = None if mask is None else jnp.asarray(mask)
        return gem_head_reference(x, m, p, w, b, eps)
    return _fused_call(x, mask_arr, p, jnp.asarray(w, jnp.float32),
                       jnp.asarray(b, jnp.float32), eps=eps)
