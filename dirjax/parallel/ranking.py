"""ICI-sharded ranking: the million-image database path.

The database descriptor matrix lives row-sharded across the mesh's "db"
axis; queries are replicated. Each device scores its shard on its MXU and
reduces to a local top-k; one small all-gather over ICI merges candidates.
Exact-mAP evaluation gathers full score rows instead (junk-aware protocols
need them, reference ``generic.py:204-208``).

Replaces the reference's single-CPU numpy matmul ranking
(``common.py:30-38``, ``test_dir.py:145``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_database", "shard_database_quantized", "sharded_topk",
           "sharded_scores", "sharded_aqe", "shard_codes", "sharded_pq_topk",
           "shard_ivf", "sharded_ivf_topk", "shard_codes_binary",
           "sharded_hamming_topk"]


def shard_database(db, mesh: Mesh, axis: str = "db"):
    """Place a (Nd, D) descriptor matrix row-sharded over ``axis``.
    Pads Nd up to a multiple of the axis size. Pad rows are all-zero but
    a zero score still beats negative cosines — consumers MUST mask
    columns >= n_valid to -inf (finish_local / _local_chunked_topk do)."""
    n = db.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        db = jnp.concatenate([jnp.asarray(db),
                              jnp.zeros((pad, db.shape[1]), db.dtype)])
    return jax.device_put(db, NamedSharding(mesh, P(axis, None))), n


def shard_database_quantized(db, mesh: Mesh, axis: str = "db"):
    """int8-quantize a descriptor matrix (:func:`dirjax.ops.quantize_db`)
    and place rows + per-row scales sharded over ``axis``: an 8-chip mesh
    holds 8x the corpus at a quarter the bf16 bytes per chip.

    Returns ``(db_i8_sharded, scales_sharded (1, Nd_pad), n_valid)``; pad
    rows carry scale 0, so they dequantize to 0 and never win."""
    from ..ops.topk_pallas import quantize_db

    db_i8, scales = quantize_db(db)
    n = db_i8.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        db_i8 = jnp.concatenate(
            [db_i8, jnp.zeros((pad, db_i8.shape[1]), jnp.int8)])
        scales = jnp.concatenate(
            [scales, jnp.zeros((1, pad), jnp.float32)], axis=1)
    db_i8 = jax.device_put(db_i8, NamedSharding(mesh, P(axis, None)))
    scales = jax.device_put(scales, NamedSharding(mesh, P(None, axis)))
    return db_i8, scales, n


#: per-shard rows scored per streaming step once a shard's dense score
#: matrix would exceed ~256 MB fp32 (the memory lesson of the single-chip
#: redesign applied to the SPMD path: never materialize (nq, Nd_shard))
_STREAM_CHUNK = 131072


def _local_chunked_topk(q_rep, db_local, scales_local, k, n_valid, axis):
    """Per-shard top-k streamed in row chunks inside shard_map: peak shard
    memory is O(nq * chunk) scores + the running (nq, k) candidates.
    Shard shapes are static, so chunk boundaries are plain Python slices
    (a dynamic-slice formulation would clamp the ragged last chunk and
    duplicate rows)."""
    rows = db_local.shape[0]
    offset = jax.lax.axis_index(axis) * rows
    kk = min(k, rows)
    prec = (jax.lax.Precision.HIGHEST
            if db_local.dtype == jnp.float32 else None)

    both_int = db_local.dtype == jnp.int8 and q_rep.dtype == jnp.int8
    best_v = best_i = None
    for start in range(0, rows, _STREAM_CHUNK):
        blk = db_local[start: start + _STREAM_CHUNK]
        if both_int:   # exact int32 accumulation on the int8 MXU
            s = jnp.matmul(q_rep.astype(jnp.int32),
                           blk.astype(jnp.int32).T,
                           preferred_element_type=jnp.int32
                           ).astype(jnp.float32)
        else:
            s = jnp.matmul(q_rep.astype(
                jnp.bfloat16 if blk.dtype == jnp.int8 else blk.dtype),
                blk.T, precision=prec, preferred_element_type=jnp.float32)
        gcol = offset + start + jnp.arange(blk.shape[0],
                                           dtype=jnp.int32)[None, :]
        if scales_local is not None:
            s = s * scales_local.reshape(-1)[None,
                                             start: start + _STREAM_CHUNK]
        s = jnp.where(gcol < n_valid, s, -jnp.inf)
        kb = min(kk, blk.shape[0])
        v, p = jax.lax.top_k(s, kb)
        idx = jnp.take_along_axis(jnp.broadcast_to(gcol, s.shape), p, axis=1)
        if best_v is None:
            best_v, best_i = v, idx
        else:
            cat_v = jnp.concatenate([best_v, v], axis=1)
            cat_i = jnp.concatenate([best_i, idx], axis=1)
            best_v, mp = jax.lax.top_k(cat_v, kk)
            best_i = jnp.take_along_axis(cat_i, mp, axis=1)
    if best_v.shape[1] < kk:   # single short chunk: pad to the contract
        pad = kk - best_v.shape[1]
        best_v = jnp.pad(best_v, ((0, 0), (0, pad)),
                         constant_values=-jnp.inf)
        best_i = jnp.pad(best_i, ((0, 0), (0, pad)), constant_values=-1)
    return best_v, best_i


def sharded_topk(q, db_sharded, k: int, mesh: Mesh, n_valid: int,
                 axis: str = "db", db_scales=None,
                 stream: Optional[bool] = None,
                 quantize_queries: bool = False):
    """(values, indices) of the global top-k per query.

    Per-shard top-k on each device, then an all-gather of the (nq, k)
    candidates over ICI and a final tiny top-k — O(devices*k) merge traffic
    instead of O(Nd). With an int8 ``db_sharded`` pass the matching
    ``db_scales`` from :func:`shard_database_quantized`: each shard feeds
    its rows to the MXU dot directly and rescales its score columns.

    ``stream`` (default: auto once a shard's dense (nq, rows) fp32 score
    matrix would exceed ~256 MB): stream each shard in row chunks with a
    running top-k, bounding per-shard memory to O(nq * chunk) — the SPMD
    twin of the single-chip design rule that the score matrix never
    materializes.

    ``quantize_queries`` (int8 databases): per-row int8-quantize the
    queries too, so each shard contracts on the int8 MXU; the per-query
    scales multiply only the merged VALUES (a positive per-query constant
    cannot reorder that query's candidates)."""
    quantized = db_sharded.dtype == jnp.int8
    qscales = None
    if quantize_queries and not quantized:
        raise ValueError("quantize_queries requires an int8 sharded "
                         "database (shard_database_quantized)")
    if quantized:
        assert db_scales is not None, \
            "int8 sharded database requires db_scales"
        if quantize_queries:
            from ..ops.topk_pallas import _quantize_block

            q, qs = _quantize_block(jnp.asarray(q))
            qscales = qs.reshape(-1, 1)
        else:
            q = jnp.asarray(q).astype(jnp.bfloat16)
    q = jnp.asarray(q)
    shard_rows = db_sharded.shape[0] // mesh.shape[axis]
    if stream is None:
        stream = q.shape[0] * shard_rows * 4 > 256 * 2 ** 20

    def finish_local(scores, rows):
        offset = jax.lax.axis_index(axis) * rows
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, min(k, rows))
        return vals, idx + offset

    out_specs = (P(None, axis), P(None, axis))
    if quantized:
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(axis, None), P(None, axis)),
            out_specs=out_specs, check_vma=False)
        def local_topk(q_rep, db_local, scales_local):
            if stream:
                return _local_chunked_topk(q_rep, db_local, scales_local,
                                           k, n_valid, axis)
            if q_rep.dtype == jnp.int8:   # full-int8: exact int32 accum
                scores = jnp.matmul(q_rep.astype(jnp.int32),
                                    db_local.astype(jnp.int32).T,
                                    preferred_element_type=jnp.int32
                                    ).astype(jnp.float32)
            else:
                # int8 rows feed the dot directly (the convert fuses)
                scores = jnp.matmul(q_rep, db_local.astype(jnp.bfloat16).T,
                                    preferred_element_type=jnp.float32)
            return finish_local(scores * scales_local, db_local.shape[0])

        vals, idxs = local_topk(q, db_sharded, db_scales)
    else:
        @functools.partial(
            shard_map, mesh=mesh,
            in_specs=(P(), P(axis, None)),
            out_specs=out_specs, check_vma=False)
        def local_topk(q_rep, db_local):
            if stream:
                return _local_chunked_topk(q_rep, db_local, None,
                                           k, n_valid, axis)
            # fp32 ranking must pin HIGHEST or the MXU truncates inputs to
            # bf16 (mAP-relevant); native-bf16 databases dot natively
            prec = (jax.lax.Precision.HIGHEST
                    if db_local.dtype == jnp.float32 else None)
            scores = jnp.matmul(q_rep.astype(db_local.dtype), db_local.T,
                                precision=prec,
                                preferred_element_type=jnp.float32)
            return finish_local(scores, db_local.shape[0])

        vals, idxs = local_topk(q, db_sharded)          # (nq, ndev*k)
    merged_vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    merged_idxs = jnp.take_along_axis(idxs, pos, axis=1)
    # k past the valid rows: pad columns carry -inf — surface them as the
    # -1 sentinel (contract shared with sharded_pq_topk) instead of
    # leaking out-of-range pad-row indices
    merged_idxs = jnp.where(merged_vals > -jnp.inf, merged_idxs, -1)
    if qscales is not None:
        merged_vals = merged_vals * qscales
    return merged_vals, merged_idxs


def shard_codes(codes, mesh: Mesh, axis: str = "db"):
    """Place an (N, m) uint8 PQ code matrix row-sharded over ``axis``.
    Pad rows are masked by ``n_valid`` at query time (a pad code would
    otherwise decode to real centroids and could win a top-k)."""
    codes = jnp.asarray(codes)
    n = codes.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)])
    return jax.device_put(codes, NamedSharding(mesh, P(axis, None))), n


def sharded_pq_topk(luts, codes_sharded, k: int, mesh: Mesh, n_valid: int,
                    axis: str = "db", chunk: int = 131072,
                    compute_dtype=None):
    """Global ADC top-k over row-sharded PQ codes: each shard streams its
    codes through the one-hot MXU contraction + fine-max hierarchy
    (:func:`dirjax.ops.pq_topk`'s device path) to a local (nq, k), then
    the O(devices*k) candidate merge of :func:`sharded_topk`. Lookup
    tables are replicated — (nq, m, ksub) fp32 is ~4 MB at nq=256,
    negligible ICI traffic."""
    from ..ops.pq import (_BLOCK, _adc_modes, _pq_topk_dense,
                          _pq_topk_hier)

    luts = jnp.asarray(luts, jnp.float32)
    shard_rows = codes_sharded.shape[0] // mesh.shape[axis]
    kk = min(k, shard_rows)
    dt_name = jnp.dtype(_adc_modes(compute_dtype)[0]).name

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(None, axis), P(None, axis)), check_vma=False)
    def local_topk(luts_rep, codes_local):
        rows = codes_local.shape[0]
        offset = jax.lax.axis_index(axis) * rows
        local_valid = jnp.clip(n_valid - offset, 0, rows)
        if rows <= max(4096, 2 * kk * _BLOCK):
            pad = (-rows) % 256
            if pad:
                codes_local = jnp.concatenate(
                    [codes_local, jnp.zeros((pad, codes_local.shape[1]),
                                            codes_local.dtype)])
            v, i = _pq_topk_dense(luts_rep, codes_local, local_valid, kk,
                                  dt_name)
        else:
            cchunk = max(_BLOCK, (min(chunk, rows) // _BLOCK) * _BLOCK)
            pad = (-rows) % cchunk
            if pad:
                codes_local = jnp.concatenate(
                    [codes_local, jnp.zeros((pad, codes_local.shape[1]),
                                            codes_local.dtype)])
            v, i = _pq_topk_hier(luts_rep, codes_local, local_valid, kk,
                                 cchunk, _BLOCK, dt_name)
        if v.shape[1] < kk:          # contract: every shard emits kk
            short = kk - v.shape[1]
            v = jnp.pad(v, ((0, 0), (0, short)), constant_values=-jnp.inf)
            i = jnp.pad(i, ((0, 0), (0, short)), constant_values=-1)
        return v, jnp.where(i >= 0, i + offset, -1)

    vals, idxs = local_topk(luts, codes_sharded)          # (nq, ndev*kk)
    merged_vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    merged_idxs = jnp.take_along_axis(idxs, pos, axis=1)
    return merged_vals, merged_idxs


def shard_ivf(ivf, mesh: Mesh, axis: str = "db"):
    """Partition an inverted file (:class:`dirjax.ops.ivf.IVFArrays`)
    cell-wise over the mesh: each device owns complete virtual cells
    (greedy size-balanced assignment) with their slabs re-indexed locally
    but ``slab_rows`` keeping GLOBAL row ids. Shards pad to a common
    static shape (sentinel cells carry ``probe_adjust=-3e38`` so the
    local probe can never pick them).

    Returns an :class:`~dirjax.ops.ivf.IVFArrays` whose fields carry a
    leading device axis, placed sharded over ``axis``.
    """
    import numpy as np

    from ..ops.ivf import IVFArrays

    ndev = mesh.shape[axis]
    tab = np.asarray(ivf.vlist_tab)
    cv = np.asarray(ivf.centroids_v)
    adj = np.asarray(ivf.probe_adjust)
    cell = np.asarray(ivf.cell_of_v)
    codes = np.asarray(ivf.codes)
    rows = np.asarray(ivf.slab_rows)
    nv, cap = tab.shape
    sizes = (tab >= 0).sum(1)
    loads = np.zeros(ndev, np.int64)
    groups = [[] for _ in range(ndev)]
    for v in np.argsort(-sizes, kind="stable"):   # greedy largest-first
        d = int(np.argmin(loads))
        groups[d].append(int(v))
        loads[d] += sizes[v]
    nvl = max(1, max(len(g) for g in groups))
    nsl = max(1, int(loads.max()))
    s_cv = np.zeros((ndev, nvl, cv.shape[1]), np.float32)
    s_adj = np.full((ndev, nvl), np.float32(-3.0e38))
    s_tab = np.full((ndev, nvl, cap), -1, np.int32)
    s_codes = np.zeros((ndev, nsl) + codes.shape[1:], codes.dtype)
    s_rows = np.full((ndev, nsl) + rows.shape[1:], -1, np.int32)
    s_cell = np.full((ndev, nvl), -1, np.int32)
    for d, g in enumerate(groups):
        si = 0
        for j, v in enumerate(g):
            sl = tab[v][tab[v] >= 0]
            s_cv[d, j] = cv[v]
            # slice, don't recompute: if build_ivf's probe bias ever
            # changes, the sharded probe must follow it
            s_adj[d, j] = adj[v]
            s_tab[d, j, : len(sl)] = np.arange(si, si + len(sl))
            s_cell[d, j] = cell[v]
            s_codes[d, si: si + len(sl)] = codes[sl]
            s_rows[d, si: si + len(sl)] = rows[sl]
            si += len(sl)

    def put(a, rank):
        return jax.device_put(
            jnp.asarray(a), NamedSharding(mesh, P(axis, *([None] * rank))))

    return IVFArrays(
        centroids_v=put(s_cv, 2), probe_adjust=put(s_adj, 1),
        vlist_tab=put(s_tab, 2), codes=put(s_codes, 3),
        slab_rows=put(s_rows, 2), cell_of_v=put(s_cell, 1))


def sharded_ivf_topk(luts, q, ivf_sharded, k: int, mesh: Mesh, *,
                     nprobe: int = 8, axis: str = "db",
                     compute_dtype=None, chunk: int = 128):
    """Global IVF-ADC top-k over a cell-sharded inverted file.

    Each device probes its ``ceil(nprobe / ndev)`` nearest LOCAL cells and
    runs the single-chip pipeline on its own slabs; the O(devices*k)
    candidate merge is the same as :func:`sharded_topk`. Local probing is
    the standard distributed-IVF approximation: the union differs from
    the global top-``nprobe`` cells only when one shard holds many of
    them — and then it probes *more* cells total, never fewer per shard.
    """
    from ..ops.ivf import _ivf_topk
    from ..ops.pq import _adc_modes

    luts = jnp.asarray(luts, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    ndev = mesh.shape[axis]
    nprobe_local = max(1, -(-nprobe // ndev))
    dt_name = jnp.dtype(_adc_modes(compute_dtype)[0]).name
    cap = ivf_sharded.vlist_tab.shape[2]
    cchunk = max(8, min(chunk,
                        min(nprobe_local,
                            ivf_sharded.vlist_tab.shape[1]) * cap))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=(P(None, axis), P(None, axis)), check_vma=False)
    def local_topk(luts_rep, q_rep, cv, adj, tab, codes, rows):
        return _ivf_topk(luts_rep, q_rep, cv[0], adj[0], tab[0],
                         codes[0], rows[0], k, nprobe_local, cchunk,
                         dt_name)

    vals, idxs = local_topk(
        luts, q, ivf_sharded.centroids_v, ivf_sharded.probe_adjust,
        ivf_sharded.vlist_tab, ivf_sharded.codes, ivf_sharded.slab_rows)
    merged_vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    merged_idxs = jnp.take_along_axis(idxs, pos, axis=1)
    return merged_vals, merged_idxs


def shard_codes_binary(codes, mesh: Mesh, axis: str = "db"):
    """Place an (N, W) packed uint32 sign-code matrix row-sharded over
    ``axis``. Pads N to a multiple of ``ndev * 128`` so every shard is
    block-aligned for :func:`dirjax.ops.binary.hamming_topk`'s fine-max
    phases; pad rows are masked by ``n_valid`` at query time."""
    codes = jnp.asarray(codes)
    n = codes.shape[0]
    mult = mesh.shape[axis] * 128
    pad = (-n) % mult
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)])
    return jax.device_put(codes, NamedSharding(mesh, P(axis, None))), n


def sharded_hamming_topk(q_packed, codes_sharded, k: int, mesh: Mesh,
                         n_valid: int, axis: str = "db", *, vq=None,
                         rerank_factor: int = 4, block: int = 128,
                         chunk_rows: int = 32768):
    """Global Hamming top-k over row-sharded packed sign codes.

    Each shard runs the single-chip three-phase exact scan
    (:func:`dirjax.ops.binary.hamming_topk`) on its rows with a local
    validity bound, then the O(devices*k) candidate merge shared with
    every other sharded tier. Values are the ±1 dot ``n_bits - 2*dist``;
    invalid slots carry index ``-1``. Like the other sharded tiers this
    stays plain-XLA inside shard_map (testable on the virtual CPU mesh);
    on real multi-chip hardware the per-shard call is a one-line swap to
    the 3-4x :func:`~dirjax.ops.binary.hamming_topk_mxu` MXU kernel
    (PERF_NOTES "Binary-hash tier").

    With ``vq`` (continuous projected queries from
    :func:`dirjax.ops.binary.project_queries`, replicated — (nq, n_bits)
    fp32 is tiny ICI traffic) each shard rescores its own top
    ``rerank_factor * k`` Hamming candidates asymmetrically before the
    merge. Every shard's shortlist is at least as deep as its share of
    the global shortlist, so the merged result can only improve on the
    single-chip rescore of the same depth.
    """
    from ..ops.binary import _hamming_topk_impl, asym_rescore

    qp = jnp.asarray(q_packed)
    ndev = mesh.shape[axis]
    shard_rows = codes_sharded.shape[0] // ndev
    kk = min(k, shard_rows)
    kf = min(max(k * rerank_factor, k), shard_rows) if vq is not None else kk
    # mirror hamming_topk's chunk sizing against the SHARD row count
    cr = max(block, min(chunk_rows, shard_rows))
    cr -= cr % block
    local_pad = (-shard_rows) % cr
    if vq is not None:
        vq = jnp.asarray(vq, jnp.float32)

    def _local(qp_rep, codes_local, vq_rep=None):
        rows = codes_local.shape[0]
        offset = jax.lax.axis_index(axis) * rows
        local_valid = jnp.clip(n_valid - offset, 0, rows)
        if local_pad:
            codes_local = jnp.concatenate(
                [codes_local,
                 jnp.zeros((local_pad, codes_local.shape[1]),
                           codes_local.dtype)])
        v, i = _hamming_topk_impl(qp_rep, codes_local, local_valid,
                                  kf, block, cr)
        if vq_rep is not None:
            # rescore against LOCAL codes with local candidate ids, then
            # globalize (codes_local rows are this shard's rows)
            v, i = asym_rescore(vq_rep, codes_local, i, kk)
            v = jnp.where(jnp.isfinite(v), v, jnp.float32(-(2 ** 30)))
        return v, jnp.where(i >= 0, i + offset, -1)

    if vq is None:
        local = shard_map(
            lambda a, b: _local(a, b), mesh=mesh,
            in_specs=(P(), P(axis, None)),
            out_specs=(P(None, axis), P(None, axis)), check_vma=False)
        vals, idxs = local(qp, codes_sharded)
    else:
        local = shard_map(
            _local, mesh=mesh,
            in_specs=(P(), P(axis, None), P()),
            out_specs=(P(None, axis), P(None, axis)), check_vma=False)
        vals, idxs = local(qp, codes_sharded, vq)
    merged_vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    merged_idxs = jnp.take_along_axis(idxs, pos, axis=1)
    return merged_vals, jnp.where(merged_vals > -(2 ** 30),
                                  merged_idxs, -1)


def sharded_scores(q, db_sharded, mesh: Mesh, n_valid: int, axis: str = "db"):
    """Full (nq, Nd) score matrix, computed shard-wise and laid out
    column-sharded over the mesh (gather to host with np.asarray)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False)
    def local_scores(q_rep, db_local):
        prec = (jax.lax.Precision.HIGHEST
                if db_local.dtype == jnp.float32 else None)
        return jnp.matmul(q_rep, db_local.T, precision=prec,
                          preferred_element_type=jnp.float32)

    scores = local_scores(q, db_sharded)
    return scores[:, :n_valid]


def sharded_aqe(q, db_sharded, mesh: Mesh, n_valid: int, alpha: float = 3.0,
                k: int = 10, axis: str = "db", db_scales=None,
                exclude_mask=None, exclude_pad: int = 0):
    """Alpha-query-expansion against a sharded database: top-k neighbors
    found shard-wise, neighbor rows gathered by global index, re-aggregated
    and re-normalized (semantics of reference test_dir.py:24-44). Supports
    an int8 database (pass ``db_scales``): only the k gathered neighbor
    rows per query are dequantized. ``exclude_mask`` (replicated bool
    (n_valid,), True = excluded) with ``exclude_pad >=`` the excluded
    count drops rows from the expansion neighborhood exactly
    (:func:`dirjax.ops.qe._drop_excluded` over-fetch rule)."""
    from ..ops.normalize import l2_normalize
    from ..ops.qe import _drop_excluded, _weights

    kk = min(k + int(exclude_pad), n_valid) \
        if exclude_mask is not None else k
    vals, idxs = sharded_topk(q, db_sharded, kk, mesh, n_valid, axis,
                              db_scales=db_scales)
    if exclude_mask is not None:
        vals, idxs = _drop_excluded(vals, idxs, jnp.asarray(exclude_mask),
                                    k)
    safe = jnp.maximum(idxs, 0)
    neighbors = jnp.take(db_sharded, safe, axis=0)   # gathers across shards
    if db_sharded.dtype == jnp.int8:
        neighbors = neighbors.astype(jnp.float32) * \
            jnp.take(db_scales.reshape(-1), safe)[:, :, None]
        q = jnp.asarray(q, jnp.float32)
    # one weight/aggregate rule for every AQE path (ops/qe.py owns it)
    w = jnp.where(idxs >= 0, _weights(vals, alpha), 0.0)
    expanded = (q + jnp.einsum("nk,nkd->nd", w,
                               neighbors.astype(jnp.float32),
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)) \
        / (k + 1.0)
    return l2_normalize(expanded)
