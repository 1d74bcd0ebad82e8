"""Alpha query expansion (AQE) and database augmentation (ADBA).

Vectorized, device-resident reformulation of the reference's per-query
Python loop (``test_dir.py:24-44``): the new descriptor is the mean of the
original and its top-k neighbors weighted by similarity^alpha, re-L2-normed:

    q' = normalize( (q + sum_{j in topk(q)} sim(q, d_j)^alpha * d_j) / (k+1) )

For ADBA the database expands against itself with the self-similarity
zeroed first (reference convention: a zeroed self can still occupy a top-k
slot — with weight 0^alpha — when fewer than k neighbors score positive).

On TPU the dense expansion is two MXU matmuls plus a top-k — no host loop.
The ``*_chunked`` variants bound peak memory for million-row databases:
similarities are produced in (row_block, db_chunk) tiles, reduced to a
running top-k, and only the k neighbor rows per query are ever gathered —
the (Nq, Nd) / (Nd, Nd) similarity matrix never materializes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .normalize import l2_normalize

__all__ = ["expand_descriptors", "expand_queries", "expand_database",
           "expand_queries_chunked", "expand_database_chunked",
           "expand_queries_quantized"]


def _weights(top_sims, alpha: float):
    """sim^alpha exactly as numpy computes it for the reference's integer
    alpha: negative sims keep sign^alpha (jnp.power alone would NaN)."""
    if float(alpha).is_integer():
        return jnp.sign(top_sims) ** int(alpha) * jnp.power(jnp.abs(top_sims),
                                                            alpha)
    return jnp.power(top_sims, alpha)


def _expand_from_topk(descs, db_descs, top_sims, top_idx, alpha: float,
                      k: int):
    # gather BEFORE casting: only the (N, k) neighbor rows are widened to
    # fp32, never the full database (the chunked variants' memory contract).
    # top_idx slots of -1 (exclusion-filtered candidates, _drop_excluded)
    # contribute weight 0 and a clamped-but-ignored gather.
    neighbors = jnp.take(db_descs, jnp.maximum(top_idx, 0),
                         axis=0).astype(jnp.float32)
    w = jnp.where(top_idx >= 0, _weights(top_sims, alpha), 0.0)
    weighted = jnp.einsum("nk,nkd->nd", w, neighbors,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    return l2_normalize((descs + weighted) / (k + 1.0))


def _drop_excluded(vals, idxs, exclude_mask, k: int):
    """Exact top-``k`` of the NON-excluded rows from an over-fetched
    top-``(k + pad)`` candidate list, provided ``pad >=`` the number of
    excluded rows (at most that many excluded rows can outrank a live
    one). Excluded/empty slots come back as ``(0.0, -1)`` — weight-zero
    under :func:`_expand_from_topk`. Used to keep tombstoned index rows
    from steering query expansion (dirjax.serving)."""
    bad = (idxs < 0) | jnp.take(exclude_mask, jnp.maximum(idxs, 0))
    vals = jnp.where(bad, -jnp.inf, vals)
    vals, pos = jax.lax.top_k(vals, min(k, vals.shape[1]))
    idxs = jnp.take_along_axis(idxs, pos, axis=1)
    live = vals > -jnp.inf
    return jnp.where(live, vals, 0.0), jnp.where(live, idxs, -1)


def _expand_from_sims(descs, db_descs, sims, alpha: float, k: int):
    k = min(int(k), db_descs.shape[0])
    top_sims, top_idx = jax.lax.top_k(sims, k)           # (N, k)
    return _expand_from_topk(descs, db_descs, top_sims, top_idx, alpha, k)


def expand_queries(qdescs, db_descs, alpha: float = 3.0, k: int = 10):
    """AQE: expand each query with its top-k database neighbors."""
    qdescs = jnp.asarray(qdescs, dtype=jnp.float32)
    db_descs = jnp.asarray(db_descs, dtype=jnp.float32)
    sims = jnp.matmul(qdescs, db_descs.T, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    return _expand_from_sims(qdescs, db_descs, sims, alpha, k)


def expand_database(db_descs, alpha: float = 3.0, k: int = 10):
    """ADBA: expand every database descriptor against the database itself,
    excluding self-matches (diagonal zeroed, reference test_dir.py:33-34)."""
    db_descs = jnp.asarray(db_descs, dtype=jnp.float32)
    sims = jnp.matmul(db_descs, db_descs.T, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    n = db_descs.shape[0]
    sims = sims * (1.0 - jnp.eye(n, dtype=sims.dtype))
    return _expand_from_sims(db_descs, db_descs, sims, alpha, k)


# --------------------------------------------------------------------------
# chunked variants: bounded memory at 1M-row scale
# --------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("k", "zero_self"))
def _chunk_topk(q, chunk, start, row0, k: int, zero_self: bool):
    """Top-k of q @ chunk.T with global column offset ``start``; when
    ``zero_self``, the (global row == global col) self-similarities are
    zeroed first (ADBA convention)."""
    sims = jnp.matmul(q, chunk.T, precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)
    if zero_self:
        col = start + jnp.arange(chunk.shape[0], dtype=jnp.int32)[None, :]
        row = row0 + jnp.arange(q.shape[0], dtype=jnp.int32)[:, None]
        sims = jnp.where(col == row, 0.0, sims)
    vals, idx = jax.lax.top_k(sims, k)
    return vals, idx + start


@functools.partial(jax.jit, static_argnames=("k",))
def _merge_topk(v1, i1, v2, i2, k: int):
    vals = jnp.concatenate([v1, v2], axis=1)
    idxs = jnp.concatenate([i1, i2], axis=1)
    best, pos = jax.lax.top_k(vals, k)
    return best, jnp.take_along_axis(idxs, pos, axis=1)


def _streaming_topk(q, db, k: int, db_chunk: int, row0=None):
    """(values, indices) of the top-k per query, streaming the database in
    ``db_chunk``-row tiles: peak memory O(len(q) * db_chunk)."""
    assert db_chunk >= k, f"db_chunk={db_chunk} must be >= k={k}"
    zero_self = row0 is not None
    row0 = jnp.int32(row0 if zero_self else 0)
    best = None
    n = db.shape[0]
    for start in range(0, n, db_chunk):
        chunk = db[start:min(start + db_chunk, n)]
        kk = min(k, chunk.shape[0])
        v, i = _chunk_topk(q, chunk, jnp.int32(start), row0, kk, zero_self)
        best = (v, i) if best is None else _merge_topk(*best, v, i, k)
    return best


def expand_queries_chunked(qdescs, db_descs, alpha: float = 3.0, k: int = 10,
                           *, db_chunk: int = 131072, exclude_mask=None,
                           exclude_pad: int = 0):
    """AQE over a database too large for an (Nq, Nd) similarity matrix.

    Equivalent to :func:`expand_queries` (same top-k, same weighting); the
    database may stay bf16 — scores accumulate in fp32 on the MXU.

    ``exclude_mask`` (device bool (Nd,), True = excluded) drops rows from
    the expansion neighborhood: the top-k runs over-fetched by
    ``exclude_pad`` (must be >= the excluded count) and excluded hits are
    filtered before the weighted sum — the expanded queries equal those of
    a database without the excluded rows."""
    qdescs = jnp.asarray(qdescs, dtype=jnp.float32)
    db_descs = jnp.asarray(db_descs)
    k = min(int(k), db_descs.shape[0])
    kk = min(k + int(exclude_pad), db_descs.shape[0]) \
        if exclude_mask is not None else k
    q_cast = qdescs.astype(db_descs.dtype)
    vals, idxs = _streaming_topk(q_cast, db_descs, kk, db_chunk)
    if exclude_mask is not None:
        vals, idxs = _drop_excluded(vals, idxs, exclude_mask, k)
    return _expand_from_topk(qdescs, db_descs, vals, idxs, alpha, k)


def expand_database_chunked(db_descs, alpha: float = 3.0, k: int = 10, *,
                            row_block: int = 4096, db_chunk: int = 131072):
    """ADBA at scale: both the query rows (the database itself) and the
    scored columns stream in blocks, and each expanded block is pulled to
    HOST as it completes — peak DEVICE memory is the database itself plus
    O(row_block * db_chunk) similarities and one (row_block, D) fp32
    block, never the (Nd, D) fp32 output (8 GB at 1M x 2048, which would
    not fit HBM next to a 4 GB database).

    Returns a host ``np.ndarray`` (float32). Equivalent to
    :func:`expand_database` (self-similarity zeroed before the top-k,
    reference test_dir.py:33-34)."""
    import numpy as np

    db_descs = jnp.asarray(db_descs)
    n, d = db_descs.shape
    k = min(int(k), n)
    out = np.empty((n, d), np.float32)
    for row0 in range(0, n, row_block):
        hi = min(row0 + row_block, n)
        rows = db_descs[row0:hi]
        vals, idxs = _streaming_topk(rows, db_descs, k, db_chunk, row0=row0)
        out[row0:hi] = np.asarray(
            _expand_from_topk(rows.astype(jnp.float32), db_descs,
                              vals, idxs, alpha, k))
    return out


def expand_queries_quantized(qdescs, db_i8, db_scales, alpha: float = 3.0,
                             k: int = 10, *, exclude_mask=None,
                             exclude_pad: int = 0):
    """AQE against an int8-quantized database (:func:`..ops.topk_pallas.
    quantize_db`): the top-k runs through the int8 streaming kernel (half
    the HBM bytes of bf16) and only the k neighbor rows per query are
    gathered and dequantized. Same weighting/mean semantics as
    :func:`expand_queries`; ``exclude_mask``/``exclude_pad`` as in
    :func:`expand_queries_chunked` (over-fetch + filter — the kernel has
    no in-stream exclusion)."""
    from .topk_pallas import rank_topk_fused

    qdescs = jnp.asarray(qdescs, dtype=jnp.float32)
    k = min(int(k), db_i8.shape[0])
    kk = min(k + int(exclude_pad), db_i8.shape[0]) \
        if exclude_mask is not None else k
    vals, idxs = rank_topk_fused(qdescs, db_i8, kk, db_scales=db_scales)
    if exclude_mask is not None:
        vals, idxs = _drop_excluded(vals, idxs, exclude_mask, k)
    safe = jnp.maximum(idxs, 0)
    nb = jnp.take(db_i8, safe, axis=0).astype(jnp.float32)      # (Nq, k, D)
    nb = nb * jnp.take(db_scales.reshape(-1), safe)[:, :, None]
    w = jnp.where(idxs >= 0, _weights(vals, alpha), 0.0)
    weighted = jnp.einsum("nk,nkd->nd", w, nb,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    return l2_normalize((qdescs + weighted) / (k + 1.0))


def expand_descriptors(descs, db=None, alpha: float = 0, k: int = 0):
    """Reference-signature convenience wrapper (test_dir.py:24-44):
    ``db=None`` means ADBA-style self-expansion."""
    assert k >= 0 and alpha >= 0, "k and alpha must be non-negative"
    if k == 0:
        return jnp.asarray(descs)
    if db is None:
        return expand_database(descs, alpha=alpha, k=k)
    return expand_queries(descs, db, alpha=alpha, k=k)
