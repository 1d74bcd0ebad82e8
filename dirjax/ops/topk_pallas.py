"""Fused similarity + top-k Pallas kernel for the serving path.

Replaces the reference's rank-then-sort on a materialized score matrix
(``common.py:30-38`` + numpy argsort): the database streams through VMEM in
row tiles, each tile's scores are produced on the MXU and immediately
reduced to a per-tile top-k in VMEM — the (Nq, Nd) score matrix never
touches HBM. For a 1M x 2048 database that saves ~4 GB of HBM traffic per
100-query batch; the final merge of per-tile candidates is a tiny XLA
``top_k`` over (Nq, tiles*k).

Exact-mAP evaluation still uses :func:`dirjax.ops.compute_scores` (the
protocols need full score rows for junk removal, SURVEY.md §7).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rank_topk_fused", "quantize_db", "topk_select"]


def _select_kernel(x_ref, vals_ref, idxs_ref, scratch, *, k):
    """Iterative exact top-k of a VMEM-resident row block: k rounds of
    (row-max -> first-winner index -> knock out winner). XLA's lax.top_k
    lowers to a full sort (~3.5 ms at (256, 12800) on v5e); this selection
    touches only VMEM and costs O(k * rows * n) VPU ops (~0.3 ms there)."""
    scratch[...] = x_ref[...]
    rows, n = scratch.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (rows, n), 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
    big = jnp.int32(2 ** 30)
    neg = jnp.float32(-jnp.inf)
    vals_ref[...] = jnp.full_like(vals_ref, neg)
    idxs_ref[...] = jnp.full_like(idxs_ref, -1)

    def body(i, _):
        s = scratch[...]
        best = jnp.max(s, axis=1)
        # first-winner via min-index-where (argmax along lanes miscompiles
        # on this Mosaic toolchain)
        winner = s >= best[:, None]
        arg = jnp.min(jnp.where(winner, col, big), axis=1).astype(jnp.int32)
        write = lane == i                       # dynamic single-lane stores
        vals_ref[...] = jnp.where(write, best[:, None], vals_ref[...])
        idx_val = jnp.where(best > neg, arg, -1)
        idxs_ref[...] = jnp.where(write, idx_val[:, None], idxs_ref[...])
        scratch[...] = jnp.where(col == arg[:, None], neg, s)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "row_block", "interpret"))
def topk_select(x, k: int, row_block: Optional[int] = None,
                interpret: Optional[bool] = None
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact ``lax.top_k`` replacement for moderate widths (n up to ~100k).

    Returns (values, indices) sorted descending, like ``lax.top_k``; ties
    resolve to the lowest index (same as XLA's stable sort). Rows beyond the
    k-th finite entry get value -inf / index -1. Grid-parallel over row
    blocks; each block's columns live wholly in VMEM.

    .. warning:: EXPERIMENTAL — exact in interpret mode (tested), but on
       the current axon/Mosaic toolchain compiling this kernel WEDGES the
       TPU (PERF_NOTES.md hazard log; reproduces even at tiny aligned
       shapes, so it is not a tiling-rule violation). Do not call it on
       the real chip until the toolchain moves; the ranking phase 2
       deliberately still uses ``lax.top_k``.
    """
    nq, n = x.shape
    if interpret is None:
        if jax.default_backend() == "tpu":
            # compiling this kernel wedges the chip on the current
            # toolchain (see the warning above / PERF_NOTES.md); make the
            # hazard an explicit opt-in instead of the default
            raise RuntimeError(
                "topk_select is interpret-only on this TPU toolchain "
                "(compiling it wedges the chip — PERF_NOTES.md hazard "
                "log). Pass interpret=False explicitly to try anyway, or "
                "use jax.lax.top_k.")
        interpret = True
    if k > n:
        raise ValueError(f"k={k} > n={n}")
    x = x.astype(jnp.float32)
    if n % 128:
        # keep every kernel shape lane-aligned (a ragged scratch lane dim
        # HUNG the chip on this toolchain); -inf pad lanes never win
        x = jnp.pad(x, ((0, 0), (0, 128 - n % 128)),
                    constant_values=-jnp.inf)
        n = x.shape[1]
    k_pad = ((k + 127) // 128) * 128
    if row_block is None:
        # ~2MB input window (+ same-size scratch) per grid step
        row_block = max(8, min(nq, (2 * 2 ** 20 // max(1, n * 4)) // 8 * 8))
    grid = (pl.cdiv(nq, row_block),)
    vals, idxs = pl.pallas_call(
        functools.partial(_select_kernel, k=k),
        grid=grid,
        in_specs=[pl.BlockSpec((row_block, n), lambda r: (r, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec((row_block, k_pad), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((row_block, k_pad), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((nq, k_pad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((row_block, n), jnp.float32)],
        interpret=interpret,
    )(x)
    return vals[:, :k], idxs[:, :k]


def _kernel(q_ref, db_ref, vals_ref, idxs_ref, scores_ref, *, k, n_total,
            tile_rows):
    t = pl.program_id(0)
    # k is padded to the 128-lane tile; fill the pad with -inf candidates
    # whose index is -1 so impossible selections are detectable by callers
    vals_ref[...] = jnp.full_like(vals_ref, -jnp.inf)
    idxs_ref[...] = jnp.full_like(idxs_ref, -1)
    scores = jax.lax.dot_general(
        q_ref[...], db_ref[...],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)          # (Nq, Nt)
    nq, nt = scores.shape
    # mask out padding rows of the last tile
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, nt), 1)
    global_col = col + t * tile_rows
    neg = jnp.float32(-jnp.inf)
    scores = jnp.where(global_col < n_total, scores, neg)
    scores_ref[...] = scores

    lane = jax.lax.broadcasted_iota(jnp.int32, vals_ref.shape, 1)
    big = jnp.int32(2 ** 30)

    def body(i, _):
        s = scores_ref[...]
        best = jnp.max(s, axis=1)                     # (Nq,)
        # first-winner index via a min-reduction (argmax miscompiles in
        # some Mosaic versions; max/min reductions are solid)
        winner = s >= best[:, None]
        arg = jnp.min(jnp.where(winner, col, big), axis=1).astype(jnp.int32)
        # lane-i select (dynamic single-lane stores aren't Mosaic-legal);
        # a fully-masked tile (best == -inf) keeps the -1 sentinel index
        write = lane == i
        vals_ref[...] = jnp.where(write, best[:, None], vals_ref[...])
        idx_val = jnp.where(best > neg, arg + t * tile_rows, -1)
        idxs_ref[...] = jnp.where(write, idx_val[:, None], idxs_ref[...])
        # knock out the winner
        scores_ref[...] = jnp.where(col == arg[:, None], neg, s)
        return 0

    jax.lax.fori_loop(0, k, body, 0)


@functools.partial(jax.jit, static_argnames=("k", "tile_rows", "interpret"))
def _fused(q, db, k: int, tile_rows: int, interpret: bool):
    nq, d = q.shape
    nd = db.shape[0]
    tiles = pl.cdiv(nd, tile_rows)
    # ragged last tile handled by Pallas + the in-kernel n_total mask
    # (an explicit jnp.pad would copy the full database every call)
    # per-tile candidate block padded to the 128-lane tile (Mosaic tiling)
    k_pad = ((k + 127) // 128) * 128

    kernel = functools.partial(_kernel, k=k, n_total=nd, tile_rows=tile_rows)
    vals, idxs = pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, d), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((nq, k_pad), lambda t: (0, t), memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, k_pad), lambda t: (0, t), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, tiles * k_pad), jnp.float32),
            jax.ShapeDtypeStruct((nq, tiles * k_pad), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((nq, tile_rows), jnp.float32)],
        interpret=interpret,
    )(q, db)

    # merge the per-tile candidates (tiny: tiles*k per query)
    merged_vals, merge_pos = jax.lax.top_k(vals, k)
    merged_idxs = jnp.take_along_axis(idxs, merge_pos, axis=1)
    return merged_vals, merged_idxs


def _blockmax_kernel(q_ref, db_ref, scores_ref, bmax_ref, *, n_total,
                     tile_rows, scale_ref=None):
    t = pl.program_id(0)
    db = db_ref[...]
    if db.dtype == jnp.int8:
        # int8 DB rows: widen on the VPU (exact in bf16: |x| <= 127), dot on
        # the MXU, then undo the per-row quantization scale on the score tile
        db = db.astype(jnp.bfloat16)
    scores = jax.lax.dot_general(
        q_ref[...], db,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)           # (Nq, Nt)
    if scale_ref is not None:
        scores = scores * scale_ref[...]              # (1, Nt) broadcast
    nq, nt = scores.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (nq, nt), 1) + t * tile_rows
    scores = jnp.where(col < n_total, scores, -jnp.inf)
    scores_ref[...] = scores
    # per-tile block maxima, padded to the 128-lane tile (Mosaic alignment);
    # pad lanes are -inf so phase 2 never selects them
    bm = jnp.max(scores.reshape(nq, nt // 128, 128), axis=-1)
    bmax_ref[...] = jnp.pad(bm, ((0, 0), (0, 128 - nt // 128)),
                            constant_values=-jnp.inf)


def _scaled_kernel(q_ref, db_ref, scale_ref, scores_ref, bmax_ref, *,
                   n_total, tile_rows):
    _blockmax_kernel(q_ref, db_ref, scores_ref, bmax_ref, n_total=n_total,
                     tile_rows=tile_rows, scale_ref=scale_ref)


@functools.partial(jax.jit, static_argnames=("n_valid", "tile_rows"))
def _blockmax_phase1(q, db, n_valid: int, tile_rows: int, scales=None):
    """Pallas pass: stream DB tiles, emit fp32 scores + per-128-column block
    maxima (padded to the 128-lane tile). ``scales`` (1, Nd) rescales the
    score columns of an int8-quantized DB."""
    nq, d = q.shape
    tiles = pl.cdiv(db.shape[0], tile_rows)
    nd_pad = tiles * tile_rows
    in_specs = [
        pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_rows, d), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (q, db)
    if scales is None:
        kernel = functools.partial(_blockmax_kernel, n_total=n_valid,
                                   tile_rows=tile_rows)
    else:
        kernel = functools.partial(_scaled_kernel, n_total=n_valid,
                                   tile_rows=tile_rows)
        in_specs.append(pl.BlockSpec((1, tile_rows), lambda t: (0, t),
                                     memory_space=pltpu.VMEM))
        args = (q, db, scales)
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((nq, tile_rows), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((nq, 128), lambda t: (0, t),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((nq, nd_pad), jnp.float32),
            jax.ShapeDtypeStruct((nq, tiles * 128), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(*args)


@functools.partial(jax.jit, static_argnames=("k", "tile_rows"))
def _blockmax_phase2(scores, bmax, k: int, tile_rows: int):
    """Select top-k blocks from the maxima, gather their candidates, finish."""
    nq, nd_pad = scores.shape
    tiles = nd_pad // tile_rows
    blocks_per_tile = tile_rows // 128
    kb = min(k, nd_pad // 128)
    # drop the per-tile lane padding before the (host-sized) top-k
    bm = bmax.reshape(nq, tiles, 128)[:, :, :blocks_per_tile]
    bm = bm.reshape(nq, tiles * blocks_per_tile)
    _, block_idx = jax.lax.top_k(bm, kb)                        # (Nq, kb)
    # gather whole 128-wide blocks through the 3D view: lowers to contiguous
    # 512B block copies (take_along_axis over flattened columns measured
    # ~55x slower here)
    scores3 = scores.reshape(nq, nd_pad // 128, 128)
    cand = jax.vmap(lambda s, i: jnp.take(s, i, axis=0))(scores3, block_idx)
    cand = cand.reshape(nq, kb * 128)
    vals, sel = jax.lax.top_k(cand, k)
    cols = (block_idx[:, :, None] * 128
            + jnp.arange(128, dtype=jnp.int32)[None, None, :]).reshape(nq, -1)
    idxs = jnp.take_along_axis(cols, sel, axis=1)
    return vals, idxs


def _blockmax(q, db, k: int, tile_rows: int, scales=None):
    """Two-phase exact top-k.

    Phase 1 (Pallas): stream DB tiles, write fp32 scores + per-128-column
    block maxima. Phase 2 (XLA): top-k over block maxima — any element of
    the true top-k has value >= the k-th best element, so its block max
    does too, and every block whose max clears that bar contains a top-k
    element; hence at most k blocks can, and the top-k blocks provably
    contain the full answer — then gather those k*128 candidates and finish
    with a tiny top-k. Replaces the O(k*Nq*Nd) in-kernel selection loop
    with O(Nq*Nd/128) reduction work.

    The phases are SEPARATE jits on purpose: fused into one computation,
    XLA schedules the gather pathologically (measured 2x slower end-to-end).
    Calling this under an outer jit re-fuses them — prefer the eager path
    for serving.
    """
    nd = db.shape[0]
    assert tile_rows % 128 == 0 and tile_rows <= 128 * 128
    # NB: no jnp.pad of the database — that would copy the full (multi-GB)
    # matrix on every call. Pallas handles the ragged last tile; rows past
    # n_valid are masked to -inf inside the kernel.
    scores, bmax = _blockmax_phase1(q, db, nd, tile_rows, scales)
    return _blockmax_phase2(scores, bmax, k, tile_rows)


@jax.jit
def _quantize_block(block):
    b32 = block.astype(jnp.float32)
    m = jnp.max(jnp.abs(b32), axis=1, keepdims=True)
    scale = jnp.maximum(m, 1e-12) / 127.0
    q = jnp.clip(jnp.round(b32 / scale), -127, 127).astype(jnp.int8)
    return q, scale.reshape(-1)


def quantize_db(db_descs, *, block_rows: int = 65536
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8 quantization of a descriptor database.

    Returns ``(db_i8 (N, D) int8, scales (1, N) float32)`` with
    ``db ≈ db_i8 * scales.T``. Per-row max-abs scaling matters: L2-normalized
    descriptor components sit around 1/sqrt(D), so a global /127 scale would
    waste nearly all of the 8-bit range. Halves HBM bytes per ranking sweep
    vs bf16 (2x the streaming-QPS ceiling) and doubles the corpus per chip.

    Processes ``block_rows`` rows at a time: a 1M x 2048 bf16 database
    quantizes within ~2.5 GB of temporaries instead of an 8 GB fp32 copy.
    """
    db = jnp.asarray(db_descs)
    n = db.shape[0]
    if n <= block_rows:
        q, s = _quantize_block(db)
        return q, s.reshape(1, -1)
    qs, ss = [], []
    for start in range(0, n, block_rows):
        q, s = _quantize_block(db[start: start + block_rows])
        qs.append(q)
        ss.append(s)
    return jnp.concatenate(qs, axis=0), jnp.concatenate(ss).reshape(1, -1)


def rank_topk_fused(qdescs, db_descs, k: int, *, tile_rows: Optional[int] = None,
                    use_pallas: Optional[bool] = None, db_scales=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k (values, db indices) per query without materializing scores.

    ``db_descs`` may be bf16 (recommended for serving); scores accumulate
    in fp32 on the MXU either way. ``tile_rows`` defaults to a ~4 MB DB tile
    (double-buffered 8 MB of the 16 MB VMEM): bigger tiles amortize per-grid-
    step overhead — measured +60% QPS at 1M x 2048 going 512 -> 1024 rows.

    ``db_descs`` may also be int8 from :func:`quantize_db` with
    ``db_scales`` its (1, N) scale row: the kernel widens rows on the VPU,
    dots in bf16/fp32 and rescales score columns — half the HBM stream of
    bf16, with ~8-bit quantization noise on the ranking only (queries stay
    bf16).
    """
    q = jnp.asarray(qdescs)
    db = jnp.asarray(db_descs)
    quantized = db.dtype == jnp.int8
    if quantized and db_scales is None:
        raise ValueError("int8 database requires db_scales from quantize_db")
    if k > db.shape[0]:
        raise ValueError(f"k={k} exceeds the {db.shape[0]} database rows")
    if tile_rows is None:
        bytes_per_row = db.shape[1] * db.dtype.itemsize
        tile_rows = max(256, (4 * 2 ** 20 // bytes_per_row) // 256 * 256)
        if quantized:
            # int8 rows are so small that the 4MB-tile rule doubles
            # tile_rows — and with it the (nq, tile_rows) fp32 score
            # window, which at nq=256 blows the 16MB VMEM. Fit the whole
            # working set (double-buffered db tile + score window + q)
            # into a ~12MB budget instead.
            q_bytes = q.shape[0] * db.shape[1] * 2
            budget = 12 * 2 ** 20 - q_bytes
            fit = budget // (2 * bytes_per_row + 8 * q.shape[0])
            tile_rows = max(256, min(tile_rows, fit // 256 * 256))
    if quantized:
        q = q.astype(jnp.bfloat16)
        scales = jnp.asarray(db_scales, jnp.float32).reshape(1, -1)
    elif q.dtype != db.dtype:
        q = q.astype(db.dtype)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if not use_pallas:
        dbf = db.astype(jnp.float32)
        if quantized:
            dbf = dbf * scales.T
        scores = jnp.matmul(q.astype(jnp.float32), dbf.T,
                            preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, k)
    tile_rows = min(tile_rows, max(256, db.shape[0] // 256 * 256) or 256)
    # blockmax trades an (Nq, Nd) fp32 score buffer for O(Nd/128) selection
    # work — measured 2x faster at k=100; the in-kernel iterative selection
    # wins for small k and avoids the buffer
    if db.shape[0] >= tile_rows and tile_rows % 128 == 0 and \
            (k > 16 or quantized):
        return _blockmax(q, db, k, tile_rows,
                         scales if quantized else None)
    if quantized:
        # small quantized DB: eager fallback (the iterative kernel has no
        # scaled variant; at this size the dense path is already cheap)
        dbf = db.astype(jnp.float32) * scales.T
        scores = jnp.matmul(q.astype(jnp.float32), dbf.T,
                            preferred_element_type=jnp.float32)
        return jax.lax.top_k(scores, k)
    return _fused(q, db, k, min(tile_rows, db.shape[0]), False)
