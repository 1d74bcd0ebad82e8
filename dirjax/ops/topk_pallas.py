"""Fused similarity + top-k Pallas kernels for the serving path.

Replaces the reference's rank-then-sort on a materialized score matrix
(``common.py:30-38`` + numpy argsort). Two designs, picked by ``k``:

* ``_fused`` (small k): the database streams through VMEM in row tiles,
  each tile's scores are produced on the MXU and immediately reduced to a
  per-tile top-k by an in-kernel iterative selection — nothing but the
  (Nq, tiles*k) candidates ever reaches HBM.
* ``_hierarchical`` (large k / int8): phase 1 streams the database once
  and emits ONLY per-8-row fine-block score maxima (Nd/8 values per
  query; 128 MB fp32 at nq=256 over 1M rows, where the earlier design
  wrote the full 1 GB (nq, Nd) fp32 score matrix). Phase 2 descends the
  maxima hierarchy (tile -> 16-block chunk -> fine block) with three
  NARROW ``lax.top_k`` calls (widths #tiles / k·8 / k·16 — all sub-ms,
  vs 2-4 ms for the k·128-wide sorts of the score-matrix design), then a
  Pallas gather kernel DMAs each query's k winning fine blocks (one
  contiguous 32 KB copy per block) straight into VMEM and rescores them
  on the MXU — the candidate rows never round-trip through HBM (the XLA
  gather + batched-matvec formulation of the same recompute measured
  ~13 ms at nq=256; see PERF_NOTES.md). A ragged tail (< 8 rows) is
  scored densely and merged in the finish step.

Exactness: an element of the true top-k scores >= the k-th best, so the
max of any group containing it does too; at most k disjoint groups can
clear that bar, hence the top-k groups by max provably contain the full
answer — applied at every level of the hierarchy. Phase 2 recomputes
candidate scores with the same bf16-input/fp32-accumulate contraction the
phase-1 kernel uses, so the maxima and the recomputed scores agree.

Exact-mAP evaluation still uses :func:`dirjax.ops.compute_scores` (the
protocols need full score rows for junk removal, SURVEY.md §7).

A note on what is NOT here: an earlier round carried ``topk_select``, an
in-VMEM iterative k-round selection kernel meant to replace ``lax.top_k``
in phase 2. Compiling it wedged the chip for ~40 min on the current
axon/Mosaic toolchain (PERF_NOTES.md hazard log) even at tiny aligned
shapes, so it stayed interpret-only dead weight. The hierarchy above is
the redesign that makes the selection cheap with plain ``lax.top_k`` —
no new kernel pattern, no wedge exposure.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["rank_topk_fused", "quantize_db"]


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


# ---------------------------------------------------------------------------
# hierarchical fine-max path (large k / quantized databases)
# ---------------------------------------------------------------------------

#: rows per fine block. 8 keeps the in-kernel reshape free (one (8, nq)
#: hardware tile per fine block) and the per-block DMA contiguous at 32 KB
#: (bf16, D=2048) in the gather kernel.
_RPB = 8


def _score_dot(db_block, q_block):
    """The one contraction both phases share: DB rows x queries with fp32
    accumulation. int8 DB rows feed the dot DIRECTLY — bit-identical to
    an explicit VPU widen and ~0.7 ms faster at 1M x 2048, because it
    avoids a SEPARATE widen pass; Mosaic still stages a widened bf16
    copy of the tile in VMEM (it is why the int8 tile-fit budget
    reserves 2x the int8 bytes, and why this mode is convert-bound
    rather than stream-bound — PERF_NOTES.md r4 phase-1 study).
    Full-int8 (int8 x int8) contracts on the int8 MXU into exact int32,
    then converts — both phases convert identically, so the containment
    argument still sees one consistent score per row."""
    both_int = db_block.dtype == jnp.int8 and q_block.dtype == jnp.int8
    out = jax.lax.dot_general(
        db_block, q_block,
        dimension_numbers=(((1,), (1,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST
                   if db_block.dtype == jnp.float32 else None),
        preferred_element_type=jnp.int32 if both_int else jnp.float32)
    return out.astype(jnp.float32) if both_int else out


def _finemax_kernel(q_ref, db_ref, fmax_ref, *, n_total, tile_rows,
                    scale_ref=None):
    """One DB tile: MXU scores (transposed layout) + reduction to per-fine-
    block maxima.

    Fine block ``b`` is the CONSECUTIVE row range ``[b*8, b*8+8)`` — the
    scores are computed with DB rows on sublanes, so the per-8-row maxima
    reduce is a free sublane-dim reshape ((tile, nq) -> (tile/8, 8, nq))
    plus an intra-tile reduce, and phase 2 can fetch each candidate block
    with one contiguous 32 KB DMA.

    NB: full-int8 mode needs no per-QUERY scale here — a positive
    per-query constant cannot change any within-query comparison, so
    selection runs on unscaled-by-qs scores and only the returned values
    are rescaled (in the finish step)."""
    t = pl.program_id(0)
    scores = _score_dot(db_ref[...], q_ref[...])      # (tile, nq)
    if scale_ref is not None:
        scores = scores * scale_ref[...]              # (tile, 1) broadcast
    nt, nq = scores.shape
    row = jax.lax.broadcasted_iota(jnp.int32, (nt, nq), 0) + t * tile_rows
    scores = jnp.where(row < n_total, scores, -jnp.inf)
    fmax_ref[...] = scores.reshape(nt // _RPB, _RPB, nq).max(axis=1)


def _scaled_finemax_kernel(q_ref, db_ref, scale_ref, fmax_ref, *, n_total,
                           tile_rows):
    _finemax_kernel(q_ref, db_ref, fmax_ref, n_total=n_total,
                    tile_rows=tile_rows, scale_ref=scale_ref)


@functools.partial(jax.jit, static_argnames=("n_valid", "tile_rows"))
def _finemax_phase1(q, db, n_valid: int, tile_rows: int, scales=None):
    """Pallas pass: stream DB tiles, emit ONLY the (tiles*tile/8, nq) fp32
    fine-block maxima — the (Nq, Nd) score matrix never touches HBM.

    One DB tile per grid step: MXU scores in transposed layout (DB rows
    on sublanes), so the per-8-CONSECUTIVE-row maxima reduce is a free
    sublane-dim reshape ((tile, nq) -> (tile/8, 8, nq)) and phase 2 can
    fetch each candidate block with one contiguous 32 KB DMA.

    ``scales`` (1, Nd) rescales the score rows of an int8 DB (fed to the
    kernel as an (Nd, 1) column so it broadcasts over the transposed
    score tile). In full-int8 mode ``q`` is int8 (per-query scales are
    applied to the returned values downstream, never to the selection)."""
    nq, d = q.shape
    tiles = pl.cdiv(db.shape[0], tile_rows)
    fpt = tile_rows // _RPB                 # fine blocks per tile
    in_specs = [
        pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_rows, d), lambda t: (t, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = (q, db)
    if scales is None:
        kernel = functools.partial(_finemax_kernel, n_total=n_valid,
                                   tile_rows=tile_rows)
    else:
        kernel = functools.partial(_scaled_finemax_kernel, n_total=n_valid,
                                   tile_rows=tile_rows)
        in_specs.append(pl.BlockSpec((tile_rows, 1), lambda t: (t, 0),
                                     memory_space=pltpu.VMEM))
        args = (q, db, scales.reshape(-1, 1))
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((fpt, nq), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * fpt, nq), jnp.float32),
        interpret=jax.default_backend() != "tpu",
    )(*args)


def _kf_pad(kf: int) -> int:
    """Pad the fine-block candidate count so kf_pad * 8 rows is a 128-lane
    multiple (16 blocks = 128 rows)."""
    return ((kf + 15) // 16) * 16


@functools.partial(jax.jit, static_argnames=("k", "tile_rows", "n_valid"))
def _hier_select(fmax, k: int, tile_rows: int, n_valid: int):
    """Descend the maxima hierarchy to the winning fine-block ids.

    Selection levels (each provably containing the full top-k, see module
    docstring): tile maxima (width = #tiles) -> 16-fine-block chunks of
    the k winning tiles -> fine blocks of the k winning chunks. Returns
    ``(bids, vmask)``: ``bids (nq, kf_pad) int32`` global fine-block ids
    (block b = DB rows [b*8, b*8+8)), zero-padded past ``kf``, and
    ``vmask (nq, kf_pad) bool`` marking genuine candidates (pads and
    -inf selections False) — every id is gather-safe either way."""
    fpt = tile_rows // _RPB
    tiles = fmax.shape[0] // fpt
    nq = fmax.shape[1]
    nb_main = n_valid // _RPB     # fine blocks fully inside the database
    F = fmax.T.reshape(nq, tiles, fpt)            # one 128MB transpose
    # blocks straddling the ragged tail are scored densely by the finish
    # stage instead (their 32KB gather would read past the database)
    bid = jax.lax.broadcasted_iota(jnp.int32, (1, tiles, fpt), 1) * fpt + \
        jax.lax.broadcasted_iota(jnp.int32, (1, tiles, fpt), 2)
    F = jnp.where(bid < nb_main, F, -jnp.inf)
    # level 0: whole tiles
    kc = min(k, tiles)
    _, c_idx = jax.lax.top_k(F.max(axis=2), kc)             # (nq, kc)
    G = jnp.take_along_axis(F, c_idx[:, :, None], axis=1)   # (nq, kc, fpt)
    # level 1: 16-fine-block chunks within the winning tiles
    G16 = G.reshape(nq, kc * (fpt // 16), 16)
    ks = min(k, kc * (fpt // 16))
    _, s_idx = jax.lax.top_k(G16.max(axis=2), ks)
    H = jnp.take_along_axis(G16, s_idx[:, :, None], axis=1)  # (nq, ks, 16)
    # level 2: fine blocks within the winning chunks
    kf = min(k, ks * 16)
    h_val, h_sel = jax.lax.top_k(H.reshape(nq, ks * 16), kf)  # (nq, kf)
    sc = jnp.take_along_axis(s_idx, h_sel // 16, axis=1)    # chunk id
    f = (sc % (fpt // 16)) * 16 + h_sel % 16                # fine-in-tile
    t_sel = jnp.take_along_axis(c_idx, sc // (fpt // 16), axis=1)
    bids = t_sel * fpt + f                                  # global blocks
    # a -inf selection means k exceeded the finite blocks (tiny database):
    # its id is arbitrary — clip for DMA safety, mask out of the answer
    vmask = h_val > -jnp.inf
    bids = jnp.clip(bids, 0, max(nb_main - 1, 0))
    pad = _kf_pad(kf) - kf
    if pad:
        bids = jnp.pad(bids, ((0, 0), (0, pad)))            # 0 = DMA-safe
        vmask = jnp.pad(vmask, ((0, 0), (0, pad)))          # False = masked
    return bids, vmask


#: candidate fine blocks fetched per pipeline step (one 16-block level-1
#: chunk: C*8 = 128 rows = a 128-lane-aligned slice of the output row)
_GC = 16


def _gather_score_kernel(bids_ref, q_ref, *rest, qb):
    """Grid (nq/qb, kf_pad/16, qb): step (g, jc, i) scores candidate chunk
    ``jc`` (16 fine blocks = 128 rows) of query ``g*qb+i``.

    The 16 (8, D) candidate blocks arrive as pipelined INPUT BLOCKS whose
    index maps read the scalar-prefetched ``bids`` — Pallas's own
    double-buffered pipeline keeps the 16 copies of step s+1 in flight
    while step s computes (a manual make_async_copy/semaphore version of
    this kernel measured 122 ms for the same 840 MB at nq=256: the
    hand-rolled DMA chain serialized; the pipeline does not). One
    (qb, D) x (128, D)^T MXU dot per step; row ``i`` is kept via sublane
    select (dynamic single-row stores don't lower on this toolchain).
    The candidate rows never round-trip through HBM — the XLA gather +
    batched-matvec formulation measured ~13 ms at nq=256."""
    cand_refs, out_ref = rest[:_GC], rest[_GC]
    i = pl.program_id(2)
    c = jnp.concatenate([r[...] for r in cand_refs], axis=0)  # (128, D)
    q = q_ref[...]
    both_int = c.dtype == jnp.int8 and q.dtype == jnp.int8
    # all qb queries against query i's candidates (trivial extra MXU work);
    # same contraction dtypes as phase 1 so maxima and rescored values
    # agree (int32 accumulation is exact, so operand order is free)
    s = jax.lax.dot_general(
        q, c, dimension_numbers=(((1,), (1,)), ((), ())),
        precision=(jax.lax.Precision.HIGHEST
                   if c.dtype == jnp.float32 else None),
        preferred_element_type=jnp.int32 if both_int else jnp.float32)
    s = s.astype(jnp.float32) if both_int else s              # (qb, 128)
    rowidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)

    @pl.when(i == 0)
    def _():
        out_ref[...] = s

    @pl.when(i > 0)
    def _():
        out_ref[...] = jnp.where(rowidx == i, s, out_ref[...])


@functools.partial(jax.jit, static_argnames=("qb",))
def _ids_by_step(bids, qb: int):
    """(ng, kf_pad/16, qb, 16) block-id array, one scalar per (grid step,
    candidate input): the pipeline index maps become pure loads with no
    arithmetic (arithmetic-bearing scalar index maps hung the Mosaic
    compile on this toolchain — hazard log)."""
    nq, kf_pad = bids.shape
    ng = -(-nq // qb)
    pad = ng * qb - nq
    if pad:   # ragged last group: repeat the final query (rows masked)
        bids = jnp.concatenate(
            [bids, jnp.tile(bids[-1:], (pad, 1))], axis=0)
    return bids.reshape(ng, qb, kf_pad // _GC, _GC).transpose(0, 2, 1, 3)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _gather_scores(q, db, bids, interpret: bool):
    """Pallas gather+score: raw (nq, kf_pad*8) fp32 candidate scores.

    Jitted so the _GC aliased ``db`` operands of the pallas_call collapse
    into ONE parameter — called eagerly, PJRT's compile-time HBM
    accounting charges the database once per operand (61 GB at 1M x 2048
    bf16) and refuses to compile."""
    nq, d = q.shape
    kf_pad = bids.shape[1]
    qb = 8 if nq >= 8 else nq
    ng = pl.cdiv(nq, qb)
    ids4 = _ids_by_step(bids, qb)

    def cand_spec(c):
        return pl.BlockSpec((_RPB, d),
                            lambda g, jc, i, ids_, c=c: (ids_[g, jc, i, c], 0),
                            memory_space=pltpu.VMEM)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ng, kf_pad // _GC, qb),
        in_specs=[
            pl.BlockSpec((qb, d), lambda g, jc, i, ids_: (g, 0),
                         memory_space=pltpu.VMEM),
        ] + [cand_spec(c) for c in range(_GC)],
        out_specs=pl.BlockSpec((qb, _GC * _RPB),
                               lambda g, jc, i, ids_: (g, jc),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_gather_score_kernel, qb=qb),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nq, kf_pad * _RPB), jnp.float32),
        interpret=interpret,
    )(ids4, q, *([db] * _GC))


@functools.partial(jax.jit, static_argnames=("k", "n_valid"))
def _recompute_xla(q, db, bids, vmask, k: int, n_valid: int, scales=None,
                   qscales=None):
    """XLA fallback for the gather+score+finish stages (CPU / interpret):
    same candidate blocks, same contraction, same tail handling."""
    nq, kf_pad = bids.shape
    rows = (bids[:, :, None] * _RPB
            + jnp.arange(_RPB, dtype=jnp.int32)[None, None, :]
            ).reshape(nq, kf_pad * _RPB)
    safe = jnp.clip(rows, 0, db.shape[0] - 1)
    cand = jnp.take(db, safe.reshape(-1), axis=0).reshape(
        nq, kf_pad * _RPB, -1)
    both_int = cand.dtype == jnp.int8 and q.dtype == jnp.int8
    if cand.dtype == jnp.int8 and not both_int:
        cand = cand.astype(jnp.bfloat16)
    prec = (jax.lax.Precision.HIGHEST
            if cand.dtype == jnp.float32 else None)
    raw = jax.lax.dot_general(
        cand, q if both_int else q.astype(cand.dtype),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=prec,
        preferred_element_type=jnp.int32 if both_int else jnp.float32)
    raw = raw.astype(jnp.float32) if both_int else raw
    return _finish_from_raw(q, db, bids, vmask, raw, k, n_valid, scales,
                            qscales)


def _finish_from_raw(q, db, bids, vmask, raw, k: int, n_valid: int,
                     scales=None, qscales=None):
    """Mask non-candidates, rescale int8, score the ragged tail densely,
    final top-k.

    ``vmask`` marks genuine candidate blocks — pad/-inf lanes repeat some
    real block's rows (their ids were clipped for DMA safety), so they
    must be masked by POSITION or that block could appear twice.

    ``qscales`` (full-int8 mode): per-query positive scales applied to
    the returned VALUES only — they cannot change any within-query
    ranking, so selection and top-k run on unscaled-by-qs scores."""
    nq, kf_pad = bids.shape
    nb_main = n_valid // _RPB
    rows = (bids[:, :, None] * _RPB
            + jnp.arange(_RPB, dtype=jnp.int32)[None, None, :]
            ).reshape(nq, kf_pad * _RPB)
    if scales is not None:
        # gather scales per BLOCK (32B chunks), not per element — the
        # flat element gather of (nq, kf_pad*8) scales measured ~3ms at
        # nq=256 and made int8 slower than bf16 end-to-end
        s = scales.reshape(-1)
        nb_pad = -(-s.shape[0] // _RPB) * _RPB
        if nb_pad != s.shape[0]:
            s = jnp.pad(s, (0, nb_pad - s.shape[0]))
        s8 = s.reshape(-1, _RPB)
        picked = jnp.take(s8, jnp.clip(bids, 0, s8.shape[0] - 1), axis=0)
        raw = raw * picked.reshape(nq, kf_pad * _RPB)
    valid = jnp.repeat(vmask, _RPB, axis=1)
    scores = jnp.where(valid, raw, -jnp.inf)
    tail = n_valid - nb_main * _RPB
    if tail:
        # tail rows (< 8) scored densely in fp32 (for int8, products of
        # |x| <= 127 ints are exact in fp32; accumulation rounding vs the
        # candidates' int32 path is ~1e-7 relative on <= 7 rows)
        trows = db[nb_main * _RPB: n_valid].astype(jnp.float32)
        if scales is not None:
            tscales = scales.reshape(-1)[nb_main * _RPB: n_valid]
            trows = trows * tscales[:, None]
        prec = (jax.lax.Precision.HIGHEST
                if db.dtype == jnp.float32 else None)
        tscore = jnp.matmul(q.astype(jnp.float32), trows.T, precision=prec,
                            preferred_element_type=jnp.float32)
        scores = jnp.concatenate([scores, tscore], axis=1)
        rows = jnp.concatenate(
            [rows, jnp.tile(jnp.arange(nb_main * _RPB, n_valid,
                                       dtype=jnp.int32)[None, :], (nq, 1))],
            axis=1)
    vals, pos = jax.lax.top_k(scores, k)
    idxs = jnp.take_along_axis(rows, pos, axis=1)
    if qscales is not None:
        vals = vals * qscales.reshape(-1, 1)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("k", "n_valid"))
def _hier_finish(q, db, bids, vmask, raw, k: int, n_valid: int,
                 scales=None, qscales=None):
    return _finish_from_raw(q, db, bids, vmask, raw, k, n_valid, scales,
                            qscales)


def _hierarchical(q, db, k: int, tile_rows: int, scales=None, qscales=None):
    """Exact top-k: fine-max stream + hierarchical select + fused
    gather/rescore.

    The stages are SEPARATE jits on purpose: fused into one computation,
    XLA schedules the candidate gather pathologically (measured 2x slower
    end-to-end with the earlier score-matrix design). Calling this under
    an outer jit re-fuses them — prefer the eager path for serving.
    """
    nd = db.shape[0]
    assert tile_rows % 128 == 0 and tile_rows <= 128 * 128
    # NB: no jnp.pad of the database — that would copy the full (multi-GB)
    # matrix on every call. Pallas handles the ragged last tile; rows past
    # n_valid are masked to -inf inside the kernel.
    fmax = _finemax_phase1(q, db, nd, tile_rows, scales)
    bids, vmask = _hier_select(fmax, k, tile_rows, nd)
    if jax.default_backend() == "tpu":
        raw = _gather_scores(q, db, bids, interpret=False)
        return _hier_finish(q, db, bids, vmask, raw, k, nd, scales, qscales)
    return _recompute_xla(q, db, bids, vmask, k, nd, scales, qscales)


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
                    use_pallas: Optional[bool] = None, db_scales=None,
                    quantize_queries: bool = False
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-k (values, db indices) per query without materializing scores.

    ``db_descs`` may be bf16 (recommended for serving); scores accumulate
    in fp32 on the MXU either way. ``tile_rows`` defaults to a ~4 MB DB tile
    (double-buffered 8 MB of the 16 MB VMEM): bigger tiles amortize per-grid-
    step overhead — measured +60% QPS at 1M x 2048 going 512 -> 1024 rows.

    ``db_descs`` may also be int8 from :func:`quantize_db` with
    ``db_scales`` its (1, N) scale row: the kernel feeds the int8 rows to
    the MXU directly (the convert fuses into the dot) and rescales score
    rows — half the HBM stream of bf16, with ~8-bit quantization noise on
    the DB side of the ranking only (queries stay bf16 by default).

    ``quantize_queries=True`` (int8 databases only) additionally per-row
    int8-quantizes the queries: the contraction runs on the int8 MXU (2x
    the bf16 rate) with exact int32 accumulation — the fastest serving
    mode, adding ~8-bit noise on the query side too. Returned values are
    rescaled by the query scales, so they approximate the same dot
    products as every other mode.
    """
    q = jnp.asarray(qdescs)
    db = jnp.asarray(db_descs)
    quantized = db.dtype == jnp.int8
    if quantized and db_scales is None:
        raise ValueError("int8 database requires db_scales from quantize_db")
    if quantize_queries and not quantized:
        raise ValueError("quantize_queries requires an int8 database "
                         "(build one with quantize_db)")
    if k > db.shape[0]:
        raise ValueError(f"k={k} exceeds the {db.shape[0]} database rows")
    if tile_rows is None:
        bytes_per_row = db.shape[1] * db.dtype.itemsize
        tile_rows = max(256, (4 * 2 ** 20 // bytes_per_row) // 256 * 256)
        if quantized and not quantize_queries:
            # int8 rows with bf16 queries: Mosaic STAGES a widened bf16
            # copy of the tile in VMEM before the dot (feeding int8
            # directly still avoids a separate VPU pass, but the staging
            # is why this mode is convert-bound, not stream-bound — the
            # r4 phase-1 sweep in PERF_NOTES.md). Measured optima at
            # 1M x 2048: nq>=128 -> 512 rows (6.80 ms vs 7.28 at 1024;
            # 1280 exceeds scoped VMEM and WEDGES the compile helper),
            # small nq -> 1280 (3.81 ms vs 5.06 at 1024 at nq=64).
            q_bytes = q.shape[0] * db.shape[1] * 2
            budget = 12 * 2 ** 20 - q_bytes
            fit = budget // (4 * bytes_per_row + 4 * q.shape[0])
            cap = 512 if q.shape[0] >= 128 else 1280
            tile_rows = max(256, min(tile_rows, cap, fit // 256 * 256))
        elif quantized:
            # full-int8: no widened copy (the dot runs on the int8 MXU),
            # but tile 1024 is the only setting measured safe — larger
            # tiles are untested and an over-VMEM compile wedges the
            # chip (CLAUDE.md), so keep the proven budget formula
            q_bytes = q.shape[0] * db.shape[1] * 2
            budget = 12 * 2 ** 20 - q_bytes
            fit = budget // (4 * bytes_per_row + 4 * q.shape[0])
            tile_rows = max(256, min(tile_rows, fit // 256 * 256))
    qscales = None
    if quantized:
        scales = jnp.asarray(db_scales, jnp.float32).reshape(1, -1)
        if quantize_queries:
            # full-int8: queries per-row int8-quantized too — the dot runs
            # on the int8 MXU (2x the bf16 rate) with exact int32
            # accumulation; extra ~8-bit noise on the QUERY side of the
            # ranking, returned values rescaled by the query scales
            q, qs = _quantize_block(q)
            qscales = qs.reshape(1, -1)
        else:
            q = q.astype(jnp.bfloat16)
    elif q.dtype != db.dtype:
        q = q.astype(db.dtype)
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if quantized and tile_rows % 128:
        # a quantized DB must never reach _fused (it has no scale inputs:
        # unscaled int8 dots rank rows WRONG) — unaligned tiles go dense
        use_pallas = False
    if not use_pallas or (quantized and db.shape[0] < tile_rows):
        # dense fallback (CPU path, or a small quantized DB where the
        # streaming kernel has nothing to stream)
        if quantized and qscales is not None:
            raw = jnp.matmul(q.astype(jnp.int32), db.astype(jnp.int32).T,
                             preferred_element_type=jnp.int32)
            scores = raw.astype(jnp.float32) * scales * qscales.reshape(-1, 1)
        else:
            dbf = db.astype(jnp.float32)
            if quantized:
                dbf = dbf * scales.T
            # both operands are fp32 casts here: HIGHEST or the TPU MXU
            # silently truncates them back to bf16 (CLAUDE.md)
            scores = jnp.matmul(q.astype(jnp.float32), dbf.T,
                                preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
        return jax.lax.top_k(scores, k)
    # _hierarchical asserts tile_rows <= 128*128: small-D databases can
    # auto-derive past it (4 MiB / bytes_per_row), so clamp here
    tile_rows = min(tile_rows, 128 * 128,
                    max(256, db.shape[0] // 256 * 256) or 256)
    # Mosaic miscompiles the phase-1 dot below 8 query rows ('vector.
    # broadcast' bf16->f32 verification error — found when the server
    # warmup first exercised the nq=1 bucket on chip, r4). Pad queries
    # to a full sublane tile and slice the answer: 8/N extra MXU work.
    nq = q.shape[0]
    if nq < 8:
        q = jnp.concatenate(
            [q, jnp.zeros((8 - nq, q.shape[1]), q.dtype)])
        if qscales is not None:
            qscales = jnp.concatenate(
                [qscales.reshape(1, -1),
                 jnp.ones((1, 8 - nq), jnp.float32)], axis=1)
    # the hierarchical path trades the in-kernel O(k*Nq*tile) selection loop
    # for O(Nq*tile/128) reduction work + a tiny recompute; the in-kernel
    # iterative selection wins for small k (no second pass at all)
    if db.shape[0] >= tile_rows and tile_rows % 128 == 0 and \
            (k > 16 or quantized):
        vals, idxs = _hierarchical(q, db, k, tile_rows,
                                   scales if quantized else None, qscales)
    else:
        vals, idxs = _fused(q, db, k, min(tile_rows, db.shape[0]),
                            jax.default_backend() != "tpu")
    return vals[:nq], idxs[:nq]
