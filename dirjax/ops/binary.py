"""Binary hashing: ITQ sign codes + packed Hamming ranking.

A compact-code tier between PQ (32 B/row) and int8 (2 KB/row at 2048-D):
descriptors become ``n_bits`` sign bits packed into uint32 words — 256 B
per row at 2048 bits, 8x the int8 corpus per chip — ranked by Hamming
distance computed with :func:`jax.lax.population_count` over XOR-ed words.
Hamming over sign codes is reported as the equivalent ±1 dot product
``n_bits - 2*dist``, so scores sort the same way as every other index tier.

The quantizer is ITQ (iterative quantization, Gong & Lazebnik CVPR'11):
PCA-project the centered descriptors to ``n_bits`` dimensions, then learn
the orthogonal rotation ``R`` minimizing ``||sign(VR) - VR||_F`` so bits
split variance evenly. TPU-native shape: the loop is one (n, b) x (b, b)
MXU matmul + one (b, b) Procrustes SVD per iteration, all on device —
pass a device array to avoid the slow host->device upload of big samples.

Ranking is a three-phase exact-top-k (the same fine-max shape as
``ops/topk_pallas.py``, here in plain XLA because the hot op is a VPU
``population_count``, not an MXU contraction):

1. stream row chunks under ``lax.scan``, writing ONLY per-``block``
   maxima (the (nq, N) distance matrix exists one chunk at a time);
2. ``lax.top_k`` over the (nq, N/block) maxima picks k candidate blocks
   — exact: the true top-k rows span at most k blocks, and every
   selected block's max bounds any excluded block's rows;
3. gather the winning blocks (contiguous ``block * n_words`` uint32
   slices — the fast gather shape on TPU) and rescore + final top-k.

Hamming distances are small integers, so ties are common: returned
*values* are exact vs a brute-force oracle; tie-broken *indices* may
legitimately differ.

No reference counterpart — dirtorch ranks with one dense fp32 CPU matmul
(``/root/reference/dirtorch/utils/common.py:30-38``); compact binary
codes are standard retrieval practice the toolbox never grew.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BinaryCodec", "fit_itq", "binarize", "project_queries",
           "unpack_pm1", "hamming_topk", "pad_for_search", "asym_rescore"]


class BinaryCodec(NamedTuple):
    """Learned hash: ``bits = sign((x - mean) @ proj)``.

    ``proj`` is (D, n_bits) with orthonormal columns (PCA basis times the
    ITQ rotation). Asymmetric scores rank by the CENTERED dot product
    ``(q - mean)·(x - mean)`` (up to the n_bits-dim projection): the
    per-row ``-mean·x`` term means rankings can differ from raw-dot
    rankings when the corpus mean is far from zero — an inherent recall
    cost of ITQ, which needs centered data for balanced bits. L2-normed
    retrieval descriptors have small means, so the reordering is minor
    there."""

    mean: jnp.ndarray    # (D,)
    proj: jnp.ndarray    # (D, n_bits)

    @property
    def n_bits(self) -> int:
        return int(self.proj.shape[1])

    @property
    def n_words(self) -> int:
        return self.n_bits // 32


def fit_itq(descriptors, n_bits: Optional[int] = None, *, iters: int = 30,
            seed: int = 0, sample: Optional[int] = 131072) -> BinaryCodec:
    """Learn an ITQ binary codec from (a sample of) the corpus.

    ``n_bits`` defaults to the descriptor dim rounded down to a multiple
    of 32 (packing granularity). ``iters=0`` skips the rotation — plain
    PCA sign hashing. Pass ``descriptors`` as a device array when the
    corpus already lives on device (uploading a 131072 x 2048 fp32 sample
    through the dev tunnel costs minutes; see CLAUDE.md)."""
    n, d = descriptors.shape
    if n_bits is None:
        n_bits = (d // 32) * 32
    assert 32 <= n_bits <= d and n_bits % 32 == 0, \
        f"n_bits={n_bits} must be a multiple of 32 in [32, {d}]"
    if sample is not None and n > sample:
        rows = np.random.default_rng(seed).choice(n, sample, replace=False)
        rows.sort()
        if isinstance(descriptors, np.ndarray):
            descriptors = descriptors[rows]
        else:
            descriptors = jnp.take(descriptors, jnp.asarray(rows), axis=0)
    x = jnp.asarray(descriptors, jnp.float32)
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    # PCA basis: top-n_bits eigenvectors of the covariance. The covariance
    # matmul runs on the MXU at HIGHEST (bf16-truncated fp32 shifts
    # near-zero eigen directions — exactly the bits that flip).
    cov = jnp.matmul(xc.T, xc, precision=jax.lax.Precision.HIGHEST)
    _, vecs = jnp.linalg.eigh(cov)            # ascending eigenvalues
    w_pca = vecs[:, ::-1][:, :n_bits]
    if iters == 0:
        return BinaryCodec(mean=mean, proj=w_pca)
    v = jnp.matmul(xc, w_pca, precision=jax.lax.Precision.HIGHEST)
    key = jax.random.PRNGKey(seed)
    r, _ = jnp.linalg.qr(jax.random.normal(key, (n_bits, n_bits)))
    for _ in range(iters):
        r = _itq_step(v, r)       # v as an ARG, never a baked closure
    return BinaryCodec(mean=mean, proj=jnp.matmul(w_pca, r))


@jax.jit
def _itq_step(v, r):
    b = jnp.where(jnp.matmul(v, r) >= 0, 1.0, -1.0)
    # Procrustes: max tr(R^T V^T B) -> R = U @ Vh from svd(V^T B)
    m = jnp.matmul(v.T, b, precision=jax.lax.Precision.HIGHEST)
    u, _, vh = jnp.linalg.svd(m, full_matrices=False)
    return jnp.matmul(u, vh)


@jax.jit
def _binarize(x, mean, proj):
    v = jnp.matmul(x.astype(jnp.float32) - mean, proj,
                   precision=jax.lax.Precision.HIGHEST)
    bits = (v >= 0).astype(jnp.uint32)
    w = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(w << shifts, axis=-1, dtype=jnp.uint32)


def binarize(descriptors, codec: BinaryCodec, chunk: int = 262144
             ) -> jnp.ndarray:
    """(N, D) descriptors -> (N, n_bits/32) packed uint32 sign codes on
    device. Bit ``i`` of word ``w`` (LSB first) is projected dim
    ``32*w + i``. Chunked so encoding a corpus never doubles its HBM."""
    n = descriptors.shape[0]
    if n <= chunk:
        return _binarize(jnp.asarray(descriptors), codec.mean, codec.proj)
    out = [_binarize(jnp.asarray(descriptors[s:s + chunk]),
                     codec.mean, codec.proj)
           for s in range(0, n, chunk)]
    return jnp.concatenate(out)


def project_queries(queries, codec: BinaryCodec) -> jnp.ndarray:
    """Centered projection of float queries — the asymmetric-scoring
    counterpart of :func:`binarize` (keep the query continuous, quantize
    only the database side)."""
    return jnp.matmul(jnp.asarray(queries, jnp.float32) - codec.mean,
                      codec.proj, precision=jax.lax.Precision.HIGHEST)


def unpack_pm1(codes: jnp.ndarray) -> jnp.ndarray:
    """(..., W) packed uint32 -> (..., 32*W) float32 in {-1, +1}."""
    shifts = jnp.arange(32, dtype=jnp.uint32)
    bits = (codes[..., None] >> shifts) & jnp.uint32(1)
    bits = bits.reshape(*codes.shape[:-1], codes.shape[-1] * 32)
    return bits.astype(jnp.float32) * 2.0 - 1.0


def pad_for_search(codes: jnp.ndarray, chunk_rows: int = 32768,
                   block: int = 128) -> jnp.ndarray:
    """Pre-pad a code buffer to :func:`hamming_topk`'s chunk multiple so
    repeated searches never re-pad (a per-call copy of the whole corpus).
    Uses the same rounding rule as the kernel — keep defaults in sync."""
    chunk = max(block, min(chunk_rows, codes.shape[0]))
    chunk -= chunk % block
    return _pad_rows(jnp.asarray(codes), chunk)


def _pad_rows(db: jnp.ndarray, multiple: int) -> jnp.ndarray:
    n = db.shape[0]
    rem = (-n) % multiple
    if rem:
        db = jnp.concatenate(
            [db, jnp.zeros((rem, db.shape[1]), db.dtype)])
    return db


@partial(jax.jit, static_argnames=("k", "block", "chunk_rows"))
def _hamming_topk_impl(qp, dbp, n_valid, k: int, block: int,
                       chunk_rows: int):
    nq, w = qp.shape
    n_pad = dbp.shape[0]
    n_bits = 32 * w
    n_chunks = n_pad // chunk_rows
    blocks_per_chunk = chunk_rows // block
    neg = jnp.int32(-(2 ** 30))

    def _sims(chunk, row0):
        """±1-dot similarity n_bits - 2*Hamming, padded rows -> -inf."""
        d = jnp.sum(jax.lax.population_count(
            qp[:, None, :] ^ chunk[None, :, :]).astype(jnp.int32), axis=-1)
        rows = row0 + jnp.arange(chunk.shape[0], dtype=jnp.int32)
        return jnp.where(rows[None, :] < n_valid, n_bits - 2 * d, neg)

    # phase 1: stream chunks, keep only per-block maxima
    def body(_, xs):
        ci, chunk = xs
        sims = _sims(chunk, ci * chunk_rows)
        return None, jnp.max(
            sims.reshape(nq, blocks_per_chunk, block), axis=-1)

    _, maxima = jax.lax.scan(
        body, None, (jnp.arange(n_chunks, dtype=jnp.int32),
                     dbp.reshape(n_chunks, chunk_rows, w)))
    maxima = jnp.moveaxis(maxima, 0, 1).reshape(nq, -1)   # (nq, n_blocks)

    # phase 2: k candidate blocks per query (exactness: see module doc)
    kb = min(k, maxima.shape[1])
    _, block_ids = jax.lax.top_k(maxima, kb)

    # phase 3: gather winning blocks (contiguous block*w uint32 slices)
    # and rescore them exactly
    cand = jnp.take(dbp.reshape(-1, block, w), block_ids, axis=0)
    d = jnp.sum(jax.lax.population_count(
        qp[:, None, None, :] ^ cand).astype(jnp.int32), axis=-1)
    row_ids = block_ids[..., None] * block \
        + jnp.arange(block, dtype=jnp.int32)
    sims = jnp.where(row_ids < n_valid, n_bits - 2 * d, neg)
    vals, pos = jax.lax.top_k(sims.reshape(nq, kb * block), k)
    idxs = jnp.take_along_axis(row_ids.reshape(nq, kb * block), pos, axis=1)
    return (vals.astype(jnp.float32),
            jnp.where(vals > neg, idxs, -1))


@partial(jax.jit, static_argnames=("k",))
def asym_rescore(vq, codes, idxs, k: int):
    """Asymmetric rescore of a Hamming-candidate shortlist: continuous
    projected queries ``vq`` (:func:`project_queries`) against ±1 unpacked
    candidate codes — an einsum over the small shortlist, so fp32 HIGHEST
    precision costs nothing at serving scale. ``idxs`` slots of ``-1`` are
    ignored; returns the top-k ``(values, indices)`` of the shortlist."""
    cand = unpack_pm1(jnp.take(codes, jnp.maximum(idxs, 0), axis=0))
    scores = jnp.einsum("qb,qcb->qc", vq, cand,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(idxs >= 0, scores, -jnp.inf)
    vals, pos = jax.lax.top_k(scores, min(k, scores.shape[1]))
    sel = jnp.take_along_axis(idxs, pos, axis=1)
    return vals, jnp.where(jnp.isfinite(vals), sel, -1)


def hamming_topk(q_packed, db_packed, k: int, *, n_valid: Optional[int] = None,
                 block: int = 128, chunk_rows: int = 32768):
    """Exact top-k by Hamming distance over packed sign codes.

    Returns ``(values, indices)`` with values = ``n_bits - 2*dist`` (the
    ±1 dot product) as fp32, descending; indices of padding/invalid slots
    are ``-1``. ``n_valid`` masks trailing rows of a pre-padded database
    (rows at index >= n_valid can never be returned)."""
    qp = jnp.asarray(q_packed)
    dbp = jnp.asarray(db_packed)
    assert qp.ndim == 2 and dbp.ndim == 2 and qp.shape[1] == dbp.shape[1]
    n = dbp.shape[0] if n_valid is None else int(n_valid)
    assert 0 < k <= n, f"k={k} exceeds the {n} database rows"
    chunk_rows = max(block, min(chunk_rows, dbp.shape[0]))
    chunk_rows -= chunk_rows % block
    dbp = _pad_rows(dbp, chunk_rows)
    return _hamming_topk_impl(qp, dbp, jnp.int32(n), k, block, chunk_rows)
