"""IVF-ADC: inverted-file coarse quantization over PQ codes.

Flat ADC (:mod:`dirjax.ops.pq`) still *scans every code* — at 16M rows the
stream is ~512 MB/query-batch and throughput falls linearly with corpus
size. An inverted file recovers corpus-size-independent latency: a coarse
k-means partitions rows into ``nlist`` cells, each query probes only the
``nprobe`` nearest cells, and ADC runs on that ~1% slice. This tier is
beyond the reference toolbox entirely (its ranking is one dense CPU matmul,
``/root/reference/dirtorch/utils/common.py:30-38``).

TPU-first design (static shapes; gathers only at slab granularity):

* **Slab storage.** Cells are stored as fixed 64-row *slabs* of codes
  (``slab * m`` contiguous bytes — 2 KB at m=32), the unit every gather
  moves. Scattered 32 B row gathers measured ~18x slower than the same
  bytes in 2 KB blocks (PERF_NOTES.md), so nothing ever fetches a row.
* **Virtual cells bound padding.** A fixed-shape probe table needs a
  static slabs-per-cell cap; natural k-means cells are imbalanced, so
  cells larger than ``cap`` slabs split into *sibling virtual cells*
  sharing one centroid. Probing ranks virtual cells — siblings tie and
  are taken together while the probe budget lasts — and the
  ``(nvlist, cap)`` table stays tightly padded no matter the imbalance.
* **Residual encoding, list-independent tables.** Rows are PQ-encoded as
  residuals from their centroid (IVFADC, Jegou et al. PAMI'11). Because
  ranking is by *inner product*, ``q . (c + r) = q . c + q . r``: the ADC
  lookup tables depend only on the query — one table set per query, a
  scalar per-cell bias, no per-cell table rebuild (the classic L2
  formulation would need one table set per probed cell).
* **Scoring is the PQ one-hot MXU contraction** (never a LUT gather;
  ``ops/pq.py`` measured the gather form at ~1000x slower), streamed over
  candidate-slab chunks under ``lax.scan`` emitting only per-slab maxima;
  the top-k slabs per query are re-fetched and rescored exactly, the same
  containment argument as ``ops/topk_pallas.py``.

Exactness contract: with ``nprobe >= nvlist`` the results equal dense ADC
over reconstructions (``q . centroid[cell(i)] + luts[codes[i]]``) to fp32
summation order; smaller ``nprobe`` trades recall for the scan fraction.
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .pq import (_adc_modes, _assign, _chunked, _kmeans, _select_exact,
                 encode_pq, train_pq)

__all__ = [
    "IVFArrays", "train_ivf", "ivf_assign", "build_ivf", "bin_ivf",
    "unbin_ivf", "ivf_topk",
]

_HIGHEST = jax.lax.Precision.HIGHEST

#: rows per storage slab — the gather granularity. 64 rows x m bytes is
#: 2 KB at m=32 (the measured sweet spot for XLA block gathers) and
#: matches ops/pq's fine-block size so rescore shapes stay familiar.
_SLAB = 64


class IVFArrays(NamedTuple):
    """Device arrays of a built inverted file (one pytree, shardable).

    ``centroids_v``/``probe_adjust`` are per *virtual* cell (siblings of a
    split cell repeat their centroid); ``vlist_tab[v]`` lists the slab ids
    of virtual cell ``v`` (-1 past its end); ``codes[s]`` holds slab
    ``s``'s residual PQ codes and ``slab_rows[s]`` the original row ids
    (-1 on tail padding).
    """

    centroids_v: jax.Array   # (nvlist, D) fp32
    probe_adjust: jax.Array  # (nvlist,) fp32: -||c||^2 / 2
    vlist_tab: jax.Array     # (nvlist, cap) int32
    codes: jax.Array         # (nslabs, slab, m) uint8
    slab_rows: jax.Array     # (nslabs, slab) int32
    cell_of_v: jax.Array     # (nvlist,) int32: cell id behind each
    #                          virtual cell (siblings repeat it) — lets
    #                          callers reconstruct per-row assignments
    #                          (serving `add()` re-bins from them)

    @property
    def nvlist(self) -> int:
        return self.centroids_v.shape[0]

    @property
    def slab(self) -> int:
        return self.codes.shape[1]


def train_ivf(x, nlist: int, *, iters: int = 20, seed: int = 0,
              sample: Optional[int] = 262144, chunk: int = 8192):
    """Coarse k-means: (nlist, D) fp32 centroids.

    Reuses the PQ trainer's batched Lloyd step with a single "subspace"
    spanning the full dimension; the one-hot assignment matrix bounds the
    chunk so peak memory stays ~chunk * nlist fp32.
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    assert n >= nlist, f"need at least nlist={nlist} training rows, got {n}"
    key = jax.random.PRNGKey(seed)
    if sample is not None and n > sample:
        idx = jax.random.choice(key, n, (sample,), replace=False)
        x = jnp.take(x, idx, axis=0)
        n = sample
    pick = jax.random.choice(jax.random.fold_in(key, 1), n, (nlist,),
                             replace=False)
    init = jnp.take(x, pick, axis=0)[None]                # (1, nlist, D)
    chunk = max(256, min(chunk, n, (1 << 25) // max(1, nlist)))
    x_chunks, w_chunks = _chunked(x[None], chunk)
    return _kmeans(x_chunks, w_chunks, init, iters)[0]    # (nlist, D)


@jax.jit
def _assign_block(block, centroids):
    return _assign(block[None], centroids[None])[0]       # (C,) int32


def ivf_assign(x, centroids, *, chunk: int = 16384) -> np.ndarray:
    """Nearest-centroid (L2) cell id per row, chunked on device.

    For the L2-normalized descriptors this toolbox produces, nearest-in-L2
    equals highest ``x . c - ||c||^2/2`` — the same rule the probe stage
    uses, so build and query agree on cell geometry.
    """
    x = jnp.asarray(x, jnp.float32)
    centroids = jnp.asarray(centroids, jnp.float32)
    n = x.shape[0]
    if n == 0:   # empty batch (e.g. a no-op serving add()): no device work
        return np.zeros((0,), np.int32)
    chunk = max(256, min(chunk, n, (1 << 26) // max(1, centroids.shape[0])))
    out = []
    for start in range(0, n, chunk):
        block = x[start: start + chunk]
        if block.shape[0] < chunk and start > 0:
            pad = chunk - block.shape[0]
            block = jnp.concatenate(
                [block, jnp.zeros((pad, x.shape[1]), x.dtype)])
            out.append(np.asarray(_assign_block(block, centroids))
                       [: n - start])
        else:
            out.append(np.asarray(_assign_block(block, centroids)))
    return np.concatenate(out)


def bin_ivf(assign, codes, centroids, *, slab: int = _SLAB,
            cap: Optional[int] = None) -> IVFArrays:
    """Host-side binning: sorted rows -> slabs -> virtual-cell table.

    ``assign`` (N,) cell per row, ``codes`` (N, m) residual PQ codes,
    ``centroids`` (nlist, D). Separated from :func:`build_ivf` so corpora
    too large to materialize can stream (generate -> assign -> encode) and
    bin at the end from just the 4+m bytes/row of codes+assignments.
    """
    assign = np.asarray(assign)
    codes = np.asarray(codes)
    centroids = np.asarray(centroids, np.float32)
    n, m = codes.shape
    nlist = centroids.shape[0]
    assert assign.shape == (n,)
    order = np.argsort(assign, kind="stable").astype(np.int64)
    counts = np.bincount(assign, minlength=nlist)
    slabs_per_list = -(-counts // slab)  # ceil
    if cap is None:
        nonempty = max(1, int((counts > 0).sum()))
        cap = max(1, math.ceil(1.5 * slabs_per_list.sum() / nonempty))
    nslabs = max(1, int(slabs_per_list.sum()))
    # virtual cells: ceil(slabs/cap) siblings per non-empty cell
    nv_per_list = -(-slabs_per_list // cap)
    nvlist = max(1, int(nv_per_list.sum()))
    # everything below is vectorized (a per-slab Python loop costs
    # minutes at the 100M-row scale this tier exists for)
    row_starts = np.concatenate([[0], np.cumsum(counts)])
    slab_starts = np.concatenate([[0], np.cumsum(slabs_per_list)])
    # each sorted row's position in the per-list slab-padded layout
    within = np.arange(n, dtype=np.int64) - np.repeat(
        row_starts[:-1], counts)
    padded_pos = np.repeat(slab_starts[:-1] * slab, counts) + within
    rows_flat = np.full(nslabs * slab, -1, np.int64)
    rows_flat[padded_pos] = order
    slab_rows = rows_flat.reshape(nslabs, slab).astype(np.int32)
    codes_flat = np.zeros((nslabs * slab, m), np.uint8)
    codes_flat[padded_pos] = codes[order]
    codes_slabbed = codes_flat.reshape(nslabs, slab, m)
    # tail padding repeats the slab's FIRST row's codes (slab_rows stays
    # -1): a pad row then scores like a real row instead of decoding
    # code 0 to arbitrary centroids, so blind per-slab maxima (the union
    # path's fine-max) never exceed the slab's true best
    pad_mask = slab_rows < 0
    if pad_mask.any():
        codes_slabbed = np.where(pad_mask[:, :, None],
                                 codes_slabbed[:, :1, :], codes_slabbed)
    # virtual-cell table: slab j of list li -> vcell v_starts[li]+rel//cap
    v_starts = np.concatenate([[0], np.cumsum(nv_per_list)])
    li_of_slab = np.repeat(np.arange(nlist), slabs_per_list)
    rel = np.arange(slab_starts[-1], dtype=np.int64) - np.repeat(
        slab_starts[:-1], slabs_per_list)
    vlist_tab = np.full((nvlist, cap), -1, np.int32)
    vlist_tab[v_starts[li_of_slab] + rel // cap, rel % cap] = \
        np.arange(slab_starts[-1])
    cent_of_v = np.repeat(np.arange(nlist), nv_per_list)
    if len(cent_of_v) == 0:                      # empty corpus guard
        cent_of_v = np.zeros(1, np.int64)
    centroids_v = centroids[cent_of_v]
    return IVFArrays(
        centroids_v=jnp.asarray(centroids_v),
        probe_adjust=jnp.asarray(
            -0.5 * np.sum(np.square(centroids_v), axis=1, dtype=np.float32)),
        vlist_tab=jnp.asarray(vlist_tab),
        codes=jnp.asarray(codes_slabbed),
        slab_rows=jnp.asarray(slab_rows),
        cell_of_v=jnp.asarray(cent_of_v.astype(np.int32)),
    )


def build_ivf(x, nlist: int, m: int = 32, ksub: int = 16, *,
              slab: int = _SLAB, cap: Optional[int] = None,
              coarse_iters: int = 20, pq_iters: int = 25, seed: int = 0,
              sample: Optional[int] = 262144, codebooks=None,
              centroids=None, chunk: int = 16384
              ) -> Tuple[IVFArrays, jax.Array, jax.Array]:
    """In-memory convenience: train + assign + residual-encode + bin.

    Returns ``(ivf, centroids, codebooks)``; queries need the codebooks
    for :func:`dirjax.ops.pq.pq_lookup` tables. For corpora that cannot
    materialize, run the stages yourself and finish with :func:`bin_ivf`.
    """
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    if centroids is None:
        centroids = train_ivf(x, nlist, iters=coarse_iters, seed=seed,
                              sample=sample)
    centroids = jnp.asarray(centroids)
    assign = ivf_assign(x, centroids, chunk=chunk)
    if codebooks is None:
        # train on a device-side residual SAMPLE — the full (N, D)
        # residual matrix never exists anywhere (and never rides the
        # host link: an earlier draft round-tripped it to the host,
        # which is minutes of wall on a slow-transfer harness)
        ns = n if sample is None else min(n, sample)
        idx = np.asarray(jax.random.choice(
            jax.random.PRNGKey(seed + 2), n, (ns,),
            replace=False)) if ns < n else np.arange(n)
        r = jnp.take(x, jnp.asarray(idx), axis=0) \
            - jnp.take(centroids, jnp.asarray(assign[idx]), axis=0)
        codebooks = train_pq(r, m, ksub, iters=pq_iters, seed=seed,
                             sample=None)
    # encode residuals chunk-wise on device; only the (chunk, m) uint8
    # codes ever reach the host
    code_chunks = []
    for start in range(0, n, chunk):
        blk = x[start: start + chunk]
        r = blk - jnp.take(centroids,
                           jnp.asarray(assign[start: start + chunk]),
                           axis=0)
        code_chunks.append(np.asarray(encode_pq(r, codebooks)))
    codes = np.concatenate(code_chunks)
    ivf = bin_ivf(assign, codes, centroids, slab=slab, cap=cap)
    return ivf, centroids, codebooks


def unbin_ivf(ivf: IVFArrays, n: int) -> Tuple[np.ndarray, np.ndarray]:
    """Invert :func:`bin_ivf`: per-row ``(assign, codes)`` in original
    row order (host arrays). Serving ``add()`` re-bins from these plus
    the new rows instead of re-assigning the whole corpus."""
    rows = np.asarray(ivf.slab_rows)
    codes = np.asarray(ivf.codes)
    tab = np.asarray(ivf.vlist_tab)
    cv = np.asarray(ivf.cell_of_v)
    slab_cell = np.full(rows.shape[0], -1, np.int32)
    mask = tab >= 0
    slab_cell[tab[mask]] = np.repeat(cv, tab.shape[1]).reshape(
        tab.shape)[mask]
    assign = np.full(n, -1, np.int32)
    out_codes = np.zeros((n, codes.shape[2]), np.uint8)
    valid = rows >= 0
    assign[rows[valid]] = np.broadcast_to(
        slab_cell[:, None], rows.shape)[valid]
    out_codes[rows[valid]] = codes[valid]
    assert (assign >= 0).all(), "slab_rows do not cover all n rows"
    return assign, out_codes


def _adc_slab_scores(luts, blk, bias, rowvalid, dt, prec):
    """(nq, C, slab) masked candidate scores: bias + one-hot ADC."""
    ksub = luts.shape[2]
    oh = jax.nn.one_hot(blk.astype(jnp.int32), ksub, dtype=dt)
    adc = jnp.einsum("qcsmk,qmk->qcs", oh, luts.astype(dt),
                     precision=prec, preferred_element_type=jnp.float32)
    return jnp.where(rowvalid, bias[:, :, None] + adc, -jnp.inf)


def _rescore_slabs(luts, codes_flat, slab_rows, win, win_ok, win_bias,
                   k, dt, prec, slab, m):
    """Exact rescore of (nq, kf) winning slab ids -> final (vals, idxs).

    Gathers each winner's codes (one contiguous slab*m fetch) and row ids,
    rescores with the SAME rounded tables as the fine-max phase, masks pad
    rows, and selects the top k. Row ids can exceed fp32's exact-int
    range, so the one-hot select splits them into 12-bit halves.
    """
    nq, kf = win.shape
    wsafe = jnp.maximum(win, 0)
    blk = jnp.take(codes_flat, wsafe.reshape(-1), axis=0) \
        .reshape(nq, kf, slab, m)
    rows = jnp.take(slab_rows, wsafe.reshape(-1), axis=0) \
        .reshape(nq, kf, slab)
    ok = (rows >= 0) & win_ok[:, :, None]
    s3 = _adc_slab_scores(luts, blk, win_bias, ok, dt, prec) \
        .reshape(nq, kf * slab)
    kk = min(k, s3.shape[1])
    vals, pos = jax.lax.top_k(s3, kk)
    rows_flat = jnp.maximum(rows.reshape(nq, kf * slab), 0)
    idxs = _select_exact(rows_flat >> 12, pos) * 4096 \
        + _select_exact(rows_flat & 0xFFF, pos)
    idxs = jnp.where(vals > -jnp.inf, idxs, -1)
    if kk < k:
        vals = jnp.pad(vals, ((0, 0), (0, k - kk)),
                       constant_values=-jnp.inf)
        idxs = jnp.pad(idxs, ((0, 0), (0, k - kk)), constant_values=-1)
    return vals, idxs


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "chunk",
                                             "dt_name"))
def _ivf_topk(luts, q, centroids_v, probe_adjust, vlist_tab, codes,
              slab_rows, k: int, nprobe: int, chunk: int,
              dt_name: str = "float32"):
    """Probe -> streamed slab fine-max -> exact winning-slab rescore."""
    dt, prec = _adc_modes(jnp.dtype(dt_name).type)
    nq = q.shape[0]
    nvlist, cap = vlist_tab.shape
    nslabs, slab, m = codes.shape
    codes_flat = codes.reshape(nslabs, slab * m)

    # --- probe: nearest virtual cells (L2 rule == build's ivf_assign) ---
    cs = jnp.matmul(q, centroids_v.T, precision=_HIGHEST)   # (nq, nvlist)
    p = min(nprobe, nvlist)
    _, pid = jax.lax.top_k(cs + probe_adjust[None, :], p)
    bias = _select_exact(cs, pid)                           # (nq, p)

    # --- candidate slabs: (nq, S) with S = p * cap, -1 where padded ----
    cand = jnp.take(vlist_tab, pid, axis=0).reshape(nq, p * cap)
    bias_s = jnp.repeat(bias, cap, axis=1)                  # (nq, S)
    s_total = p * cap
    pad = (-s_total) % chunk
    if pad:
        cand = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
        bias_s = jnp.pad(bias_s, ((0, 0), (0, pad)))
    nch = cand.shape[1] // chunk
    safe = jnp.maximum(cand, 0)

    # --- phase A: stream candidate-slab chunks, emit per-slab maxima ---
    def body(_, xs):
        ids, b, raw = xs                                    # (nq, chunk)
        blk = jnp.take(codes_flat, ids.reshape(-1), axis=0) \
            .reshape(nq, chunk, slab, m)
        rows = jnp.take(slab_rows, ids.reshape(-1), axis=0) \
            .reshape(nq, chunk, slab)
        ok = (rows >= 0) & (raw >= 0)[:, :, None]
        s = _adc_slab_scores(luts, blk, b, ok, dt, prec)
        return 0, s.max(axis=2)                             # (nq, chunk)

    to_chunks = lambda a: jnp.moveaxis(                     # noqa: E731
        a.reshape(nq, nch, chunk), 1, 0)
    _, fmax = jax.lax.scan(
        body, 0, (to_chunks(safe), to_chunks(bias_s), to_chunks(cand)))
    fmax = jnp.moveaxis(fmax, 0, 1).reshape(nq, -1)         # (nq, S_pad)

    # --- phase B: top-k slabs by max provably contain the top-k rows ---
    kf = min(k, fmax.shape[1])
    fv, sel = jax.lax.top_k(fmax, kf)                       # (nq, kf)
    win = _select_exact(cand, sel)                          # global slab ids
    win_bias = _select_exact(bias_s, sel)
    win_ok = (win >= 0) & (fv > -jnp.inf)

    # --- phase C: exact rescore of winning slabs (same luts/rounding) --
    return _rescore_slabs(luts, codes_flat, slab_rows, win, win_ok,
                          win_bias, k, dt, prec, slab, m)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "dt_name",
                                             "phase_a"))
def _ivf_topk_union(luts, q, centroids_v, probe_adjust, vlist_tab, codes,
                    slab_rows, k: int, nprobe: int,
                    dt_name: str = "float32", phase_a: str = "xla"):
    """Batch-union probing: a recall-oriented mode, not a fast path.

    Gathers the UNION of the batch's probed cells once (vlist-level
    dedup) and scores every gathered slab against ALL queries as one
    shared matmul — the flat scan's full-MXU fine-max contraction
    (Pallas kernel on TPU) over only the probed fraction. Every query
    then selects over the whole union, so recall is >= per-query probing
    (a cell probed by any query serves all).

    Measured (16M rows, v5e): the shared matmul is ~3x more
    FLOP-efficient than the per-query batched matvec, but on
    uncorrelated queries the union carries ~nq times the row-query
    pairs, so it LOSES throughput at every batch size tried (nq=16:
    8.3 vs 5.6 ms; nq=256: 159 vs 67 ms at nprobe=32). Note the dedup
    only stops duplicate cells being SELECTED twice — the gather/score
    work is static at nq*nprobe*cap slabs regardless of probe overlap
    (TPU shapes can't contract dynamically), so correlated batches pay
    the same as uncorrelated ones. Use it only when batch-union recall
    semantics are wanted; :func:`ivf_topk` defaults to the per-query
    path.
    """
    dt, prec = _adc_modes(jnp.dtype(dt_name).type)
    nq = q.shape[0]
    nvlist, cap = vlist_tab.shape
    nslabs, slab, m = codes.shape
    codes_flat = codes.reshape(nslabs, slab * m)

    # --- probe + vlist-level dedup (duplicate cells across queries) ----
    cs = jnp.matmul(q, centroids_v.T, precision=_HIGHEST)   # (nq, nvlist)
    p = min(nprobe, nvlist)
    _, pid = jax.lax.top_k(cs + probe_adjust[None, :], p)
    occ = pid.reshape(-1)                                   # (B,)
    b_tot = occ.shape[0]
    sort_ids, perm = jax.lax.sort_key_val(
        occ, jnp.arange(b_tot, dtype=jnp.int32))
    first = jnp.concatenate(
        [jnp.ones((1,), jnp.float32),
         (sort_ids[1:] != sort_ids[:-1]).astype(jnp.float32)])
    # inverse-permute without a scatter: sorting perm back to identity
    # carries first into place (keep[perm[j]] = first[j]) in O(B log B)
    # — a one-hot dot here would be an O(B^2) ~268 MB transient at B=8k
    _, keep_f = jax.lax.sort_key_val(perm, first)
    keep = keep_f > 0.5                                     # (B,)

    sid = jnp.take(vlist_tab, occ, axis=0)                  # (B, cap)
    svalid = ((sid >= 0) & keep[:, None]).reshape(-1)       # (S_u,)
    sid_flat = jnp.maximum(sid.reshape(-1), 0)
    s_u = sid_flat.shape[0]
    voc = jnp.repeat(occ, cap)                              # (S_u,)

    # --- shared fine-max over the union's slabs ------------------------
    cand_codes = jnp.take(codes_flat, sid_flat, axis=0)     # (S_u, slab*m)
    rows_mat = cand_codes.reshape(s_u * slab, m)
    luts_flat_t = luts.astype(dt).reshape(nq, -1).T         # (mk, nq)
    if phase_a in ("pallas", "interpret"):
        from .pq import _adc_finemax_pallas, _pallas_geometry

        mk = luts_flat_t.shape[0]
        tile, groups = _pallas_geometry(mk, m, nq,
                                        jnp.dtype(dt).itemsize)
        if tile == 0:            # no geometry fits the VMEM budget
            phase_a = "xla"
    if phase_a in ("pallas", "interpret"):
        tile = max(slab, (tile // slab) * slab)
        fpt = tile // slab
        n_tiled = rows_mat.shape[0] + ((-rows_mat.shape[0]) % tile)
        if fpt % 8 and n_tiled != tile:
            # fmax BlockSpec sublane (tile//slab) must be a multiple of 8
            # or the full dim (CLAUDE.md Mosaic rules — bad shapes have
            # wedged the chip): non-power-of-two slabs take the XLA scan
            phase_a = "xla"
    if phase_a in ("pallas", "interpret"):
        pad = (-rows_mat.shape[0]) % tile
        if pad:
            rows_mat = jnp.concatenate(
                [rows_mat, jnp.zeros((pad, m), rows_mat.dtype)])
        fmax = _adc_finemax_pallas(
            luts_flat_t, rows_mat, s_u * slab, tile_rows=tile, block=slab,
            interpret=phase_a == "interpret",
            groups=groups).T[:, :s_u]                       # (nq, S_u)
    else:
        from .pq import _onehot_scores

        chunk_r = min(65536, max(slab, s_u * slab))
        chunk_r = max(slab, (chunk_r // slab) * slab)
        pad = (-rows_mat.shape[0]) % chunk_r
        if pad:
            rows_mat = jnp.concatenate(
                [rows_mat, jnp.zeros((pad, m), rows_mat.dtype)])
        chunks = rows_mat.reshape(-1, chunk_r, m)

        def body(_, blk):
            s = _onehot_scores(luts, blk, dt, prec)         # (nq, chunk_r)
            return 0, s.reshape(nq, chunk_r // slab, slab).max(axis=2)

        _, fm = jax.lax.scan(body, 0, chunks)
        fmax = jnp.moveaxis(fm, 0, 1).reshape(nq, -1)[:, :s_u]

    # --- per-occurrence bias + mask, hierarchical select ---------------
    bias_occ = jnp.take(cs.T, voc, axis=0).T                # (nq, S_u)
    from .pq import _NEG, _descend_maxima

    fmax_b = jnp.where(svalid[None, :], fmax + bias_occ, _NEG)
    top, tvalid = _descend_maxima(fmax_b, k)                # (nq, kf)
    sid_r = jnp.broadcast_to(sid.reshape(-1)[None, :], (nq, s_u))
    win = _select_exact(sid_r, top)                         # may pick -1
    win = jnp.where(tvalid, win, -1)
    win_bias = _select_exact(bias_occ, top)
    return _rescore_slabs(luts, codes_flat, slab_rows, win,
                          (win >= 0) & tvalid, win_bias, k, dt, prec,
                          slab, m)


def ivf_topk(luts, q, ivf: IVFArrays, k: int, *, nprobe: int = 8,
             compute_dtype=None, chunk: int = 128, union: bool = False
             ) -> Tuple[jax.Array, jax.Array]:
    """(values, indices) of the best ``k`` rows over the probed cells.

    ``luts`` are :func:`dirjax.ops.pq.pq_lookup` tables of the *plain*
    queries against the RESIDUAL codebooks (inner-product IVFADC needs no
    per-cell tables); ``q`` the same queries for the probe/bias matmul.
    ``compute_dtype=jnp.bfloat16`` runs both ADC contractions ~3x faster
    at ~0.4% score noise. ``chunk`` is the slab-streaming width (memory
    knob: peak transient is ~nq * chunk * slab * (m + m*ksub) bytes).

    ``union=True`` switches to batch-union probing
    (:func:`_ivf_topk_union`): the whole batch's probed cells are scored
    once as a shared contraction and every query selects over the union
    — higher recall (a cell probed by any query serves all) but slower
    on uncorrelated queries (see its docstring for the measurements).
    """
    q = jnp.asarray(q, jnp.float32)
    dt_name = jnp.dtype(_adc_modes(compute_dtype)[0]).name
    if union:
        phase_a = "pallas" if jax.default_backend() == "tpu" else "xla"
        return _ivf_topk_union(luts, q, ivf.centroids_v, ivf.probe_adjust,
                               ivf.vlist_tab, ivf.codes, ivf.slab_rows,
                               k, nprobe, dt_name, phase_a)
    chunk = max(8, min(chunk, min(nprobe, ivf.nvlist)
                       * ivf.vlist_tab.shape[1]))
    return _ivf_topk(luts, q, ivf.centroids_v, ivf.probe_adjust,
                     ivf.vlist_tab, ivf.codes, ivf.slab_rows,
                     k, nprobe, chunk, dt_name)
