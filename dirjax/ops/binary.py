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

Two exact ranking paths, same fine-max top-k shape as
``ops/topk_pallas.py``:

* :func:`hamming_topk` — plain-XLA popcount scan: stream row chunks
  under ``lax.scan``, write ONLY per-``block`` maxima, ``lax.top_k``
  picks k candidate blocks (exact: the true top-k rows span at most k
  blocks and every selected block's max bounds any excluded block's
  rows), gather + rescore. VPU-bound: 36 ms at 1M x 2048 bits nq=256.
* :func:`hamming_topk_mxu` — the TPU serving path: a Pallas kernel
  unpacks packed code tiles to ±1 bf16 INSIDE VMEM and runs the same
  similarity as an MXU matmul (10.85 ms for the same job — PERF_NOTES
  "Binary-hash tier"), reusing the dense path's hierarchical selection
  and finishing with a popcount rescore of ~k gathered blocks.

Hamming distances are small integers, so ties are common: returned
*values* are exact vs a brute-force oracle; tie-broken *indices* may
legitimately differ.

No reference counterpart — dirtorch ranks with one dense fp32 CPU matmul
(``/root/reference/dirtorch/utils/common.py:30-38``); compact binary
codes are standard retrieval practice the toolbox never grew.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["BinaryCodec", "fit_itq", "binarize", "project_queries",
           "binarize_and_project",
           "unpack_pm1", "hamming_topk", "pad_for_search", "asym_rescore",
           "bytes_for_search", "hamming_topk_mxu", "hamming_search_fused"]


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


@jax.jit
def _binarize_project(x, mean, proj):
    """(packed codes, continuous projection) in ONE dispatch sharing ONE
    centered (nq, D) x (D, bits) matmul — asym search needs both, and
    eagerly :func:`binarize` + :func:`project_queries` each recompute it
    as separate device round trips (PERF_NOTES "Index server")."""
    v = jnp.matmul(x.astype(jnp.float32) - mean, proj,
                   precision=jax.lax.Precision.HIGHEST)
    bits = (v >= 0).astype(jnp.uint32)
    w = bits.reshape(*bits.shape[:-1], bits.shape[-1] // 32, 32)
    shifts = jnp.arange(32, dtype=jnp.uint32)
    return jnp.sum(w << shifts, axis=-1, dtype=jnp.uint32), v


def binarize_and_project(queries, codec: BinaryCodec
                         ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused :func:`binarize` + :func:`project_queries` for query-side
    encoding (identical outputs, one matmul, one dispatch)."""
    return _binarize_project(jnp.asarray(queries), codec.mean, codec.proj)


def _bits_per_word(codes) -> int:
    """Packed-code word width: 32 (uint32 words) or 8 (byte layout)."""
    if codes.dtype == jnp.uint32:
        return 32
    assert codes.dtype == jnp.uint8, f"packed codes, got {codes.dtype}"
    return 8


def unpack_pm1(codes: jnp.ndarray) -> jnp.ndarray:
    """(..., W) packed uint32 (or uint8 bytes) -> (..., bits) float32 in
    {-1, +1}; LSB-first within each word either way, so the uint32 and
    byte layouts of the same codes unpack identically."""
    bpw = _bits_per_word(codes)
    shifts = jnp.arange(bpw, dtype=codes.dtype)
    bits = (codes[..., None] >> shifts) & codes.dtype.type(1)
    bits = bits.reshape(*codes.shape[:-1], codes.shape[-1] * bpw)
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
    n_bits = _bits_per_word(qp) * w
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
    if qp.dtype != dbp.dtype and dbp.dtype == jnp.uint8:
        qp = _to_bytes(qp)      # byte-layout database, uint32 queries
    assert qp.ndim == 2 and dbp.ndim == 2 and qp.shape[1] == dbp.shape[1]
    n = dbp.shape[0] if n_valid is None else int(n_valid)
    assert 0 < k <= n, f"k={k} exceeds the {n} database rows"
    chunk_rows = max(block, min(chunk_rows, dbp.shape[0]))
    chunk_rows -= chunk_rows % block
    dbp = _pad_rows(dbp, chunk_rows)
    return _hamming_topk_impl(qp, dbp, jnp.int32(n), k, block, chunk_rows)


# ---------------------------------------------------------------------------
# MXU Hamming path: unpack-in-VMEM + matmul (Pallas), ~3x the popcount scan
# ---------------------------------------------------------------------------
# The popcount scan above is VPU-bound: 1M x 2048 bits at nq=256 measured
# 36 ms device-slope (7.1k QPS) while the SAME similarity as a +-1 bf16
# matmul is a 1.05 Tflop MXU job (~6 ms, see PERF_NOTES ranking roofline).
# Unpacking the whole corpus to bf16 would need 4 GB — instead a Pallas
# kernel unpacks one code tile at a time INSIDE VMEM and feeds the MXU,
# so HBM still streams only the 256 B/row packed codes. Phases 2/3 reuse
# the fine-max hierarchy machinery of ops/topk_pallas.py.
#
# In-kernel unpack (Mosaic-safe by construction — every step is a pattern
# already proven on this toolchain, see CLAUDE.md pitfalls):
#   1. codes arrive as BYTES (uint8) and hop uint8 -> int32 -> bf16
#      (direct uint8->bf16 casts do not lower);
#   2. byte b replicates to its 8 bit-lanes via an iota-compare constant
#      matmul (vector-shape-cast repeats do not lower; the eye-expand MXU
#      dot is the PQ kernel's trick) — bytes fit bf16 EXACTLY (<= 255),
#      accumulate f32;
#   3. bit d = floor(rep / 2^(d%8)) mod 2 in f32 (exact for these ints),
#      then +-1 bf16.
# Expansion costs T*256*D*2 extra MXU flops — the same as the score dot
# itself at nq=256 — which still lands ~3x ahead of the VPU scan.

_BITS_TILE = 1024    # rows per grid step. VMEM high-water at 1024 with the
#                      chunked expansion: per-chunk rep f32 (1024, 1024)
#                      4 MB + int8 pm1 1 MB + int32 scores 1 MB + operands
#                      ~2.5 MB — well under the 16 MB scoped budget (2048
#                      would put rep at 8 MB and total ~15.5 MB: too close,
#                      and VMEM-overflow compiles WEDGE the chip)


def _to_bytes(codes) -> jnp.ndarray:
    """(N, W) uint32 -> (N, 4W) uint8, LSB-first byte order (byte ``4w+j``
    holds bits ``32w+8j .. 32w+8j+7``), matching :func:`unpack_pm1` — the
    same memory layout as a little-endian uint32 view, so round-trips are
    ``np.view`` cheap."""
    c = jnp.asarray(codes)
    if c.dtype == jnp.uint8:
        return c
    shifts = jnp.arange(0, 32, 8, dtype=jnp.uint32)
    b = ((c[..., None] >> shifts) & jnp.uint32(0xFF)).astype(jnp.uint8)
    return b.reshape(c.shape[0], -1)


def bytes_for_search(codes, tile_rows: int = _BITS_TILE) -> jnp.ndarray:
    """Packed (N, W) uint32 codes -> (Npad, 4W) uint8 byte matrix, padded
    with zero rows to a ``tile_rows`` multiple — the resident layout of
    :func:`hamming_topk_mxu`. Build once per corpus; same bytes per row
    as the uint32 layout, so capacity is unchanged."""
    return _pad_rows(_to_bytes(codes), tile_rows)


def _bits_finemax_kernel(q_ref, db_ref, fmax_ref, *, n_total, tile_rows,
                         asym: bool = False):
    """One byte-code tile: in-VMEM unpack to +-1, MXU score vs the
    queries, reduce to per-8-row fine-block maxima (the same contract as
    topk_pallas._finemax_kernel, so _hier_select applies).

    The byte->lane replication matmul is BLOCK-DIAGONAL (byte b only
    feeds lanes [8b, 8b+8)), so it runs as K=128 chunks — half the
    dense-eye flops and no MXU contraction padding. Symmetric mode
    (``asym=False``): each chunk's +-1 slice contracts against the +-1
    int8 queries on the int8 MXU (2x bf16 rate; products accumulate
    exactly in int32). Both cut phase 1 from 10.85 ms to the measured
    value in PERF_NOTES "Binary-hash tier".

    Asymmetric mode (``asym=True``, r5): ``q_ref`` holds the CONTINUOUS
    projected queries as bf16 and each +-1 chunk contracts against them
    on the bf16 MXU with f32 accumulation — the fine maxima are then
    maxima of the FINAL asymmetric score, so the hierarchy selects the
    exact asym top-k directly (no symmetric shortlist, no rerank_factor;
    the r4 design's kf = 4k shortlist cost 10.4 ms of hier-select +
    popcount-finish that this mode deletes — PERF_NOTES r5). Scores are
    bf16-input/f32-accumulate — the same arithmetic as the dense bf16
    ranking tier."""
    import jax.experimental.pallas as pl

    t = pl.program_id(0)
    by = db_ref[...].astype(jnp.int32).astype(jnp.bfloat16)   # (T, NB)
    nt, nb = by.shape
    nq = q_ref.shape[0]
    cb = 128 if nb % 128 == 0 else nb      # bytes per expansion chunk
    cd = cb * 8
    # one (cb, cd) iota-compare eye, shared by every chunk (the local
    # byte of local lane d is d>>3 in each chunk; shifts/ands only —
    # '//'/'%' lowering is unproven on this Mosaic toolchain)
    bid = jax.lax.broadcasted_iota(jnp.int32, (cb, cd), 0)
    did = jax.lax.broadcasted_iota(jnp.int32, (cb, cd), 1)
    eye8 = ((did >> 3) == bid).astype(jnp.bfloat16)
    shift = jax.lax.broadcasted_iota(jnp.int32, (1, cd), 1) & 7
    div = jnp.exp2(shift.astype(jnp.float32))
    scores = jnp.zeros((nt, nq), jnp.float32 if asym else jnp.int32)
    for c in range(nb // cb):
        rep = jax.lax.dot_general(                            # (T, cd) f32
            by[:, c * cb:(c + 1) * cb], eye8,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        half = jnp.floor(rep / div)
        bit = half - 2.0 * jnp.floor(half * 0.5)              # half mod 2
        pm1f = bit * 2.0 - 1.0
        if asym:
            scores += jax.lax.dot_general(                    # (T, nq) f32
                pm1f.astype(jnp.bfloat16),
                q_ref[:, c * cd:(c + 1) * cd],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            scores += jax.lax.dot_general(                    # (T, nq) i32
                pm1f.astype(jnp.int32).astype(jnp.int8),
                q_ref[:, c * cd:(c + 1) * cd],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
    scores = scores.astype(jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (nt, nq), 0) + t * tile_rows
    scores = jnp.where(row < n_total, scores, -jnp.inf)
    fmax_ref[...] = scores.reshape(nt // 8, 8, nq).max(axis=1)


def _bits_finemax_call(q_mat, db_bytes, n_valid: int, tile_rows: int,
                       interpret: bool, asym: bool):
    """pallas_call wrapper shared by the symmetric (int8 ±1 queries) and
    asymmetric (bf16 continuous queries) phase-1 variants."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    nq, d = q_mat.shape
    nb = db_bytes.shape[1]
    tiles = db_bytes.shape[0] // tile_rows
    fpt = tile_rows // 8
    kernel = partial(_bits_finemax_kernel, n_total=n_valid,
                     tile_rows=tile_rows, asym=asym)
    return pl.pallas_call(
        kernel,
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((nq, d), lambda t: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, nb), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fpt, nq), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * fpt, nq), jnp.float32),
        interpret=interpret,
    )(q_mat, db_bytes)


@partial(jax.jit, static_argnames=("n_valid", "tile_rows", "interpret"))
def _bits_finemax_phase1(q_packed, db_bytes, n_valid: int, tile_rows: int,
                         interpret: bool):
    # query prep INSIDE the jit: eager _to_bytes/unpack dispatches cost
    # ~3-5 ms each through the dev tunnel (CLAUDE.md)
    q_pm1 = unpack_pm1(_to_bytes(q_packed)).astype(jnp.int8)
    return _bits_finemax_call(q_pm1, db_bytes, n_valid, tile_rows,
                              interpret, asym=False)


@partial(jax.jit, static_argnames=("n_valid", "tile_rows", "interpret"))
def _bits_finemax_asym_phase1(vq, db_bytes, n_valid: int, tile_rows: int,
                              interpret: bool):
    """Asymmetric phase 1: fine-block maxima of the CONTINUOUS projected
    query scores (bf16 MXU, f32 accumulation) — see the kernel docstring."""
    return _bits_finemax_call(jnp.asarray(vq, jnp.bfloat16), db_bytes,
                              n_valid, tile_rows, interpret, asym=True)


@partial(jax.jit, static_argnames=("k", "n_valid"))
def _bits_finish(q_packed, db_bytes, bids, vmask, k: int, n_valid: int):
    """Gather the winning 8-row byte blocks (2 KB contiguous — the fast
    gather shape) and rescore them exactly by popcount; dense-score the
    ragged tail rows the hierarchy cannot address; final top-k."""
    qbytes = _to_bytes(q_packed)
    nq, kf_pad = bids.shape
    nb = db_bytes.shape[1]
    n_bits = nb * 8
    nb_main = n_valid // 8
    blocks = db_bytes.reshape(-1, 8, nb)
    cand = jnp.take(blocks, bids, axis=0)          # (nq, kf_pad, 8, NB)
    dist = jnp.sum(jax.lax.population_count(
        qbytes[:, None, None, :] ^ cand).astype(jnp.int32), axis=-1)
    sims = (n_bits - 2 * dist).astype(jnp.float32)
    rows = (bids[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)).reshape(nq, kf_pad * 8)
    valid = jnp.repeat(vmask, 8, axis=1)
    scores = jnp.where(valid, sims.reshape(nq, kf_pad * 8), -jnp.inf)
    tail = n_valid - nb_main * 8
    if tail:
        tdist = jnp.sum(jax.lax.population_count(
            qbytes[:, None, :] ^ db_bytes[nb_main * 8: n_valid][None]
        ).astype(jnp.int32), axis=-1)
        scores = jnp.concatenate(
            [scores, (n_bits - 2 * tdist).astype(jnp.float32)], axis=1)
        rows = jnp.concatenate(
            [rows, jnp.tile(jnp.arange(nb_main * 8, n_valid,
                                       dtype=jnp.int32)[None], (nq, 1))],
            axis=1)
    vals, pos = jax.lax.top_k(scores, k)
    idxs = jnp.take_along_axis(rows, pos, axis=1)
    return vals, jnp.where(vals > -jnp.inf, idxs, -1)


def _chunk_dims(nb: int):
    """The kernel's K-chunking (bytes, lanes per chunk) — the finish and
    fallback stages mirror it so recomputed scores match phase-1 maxima."""
    cb = 128 if nb % 128 == 0 else nb
    return cb, cb * 8


@partial(jax.jit, static_argnames=("k", "n_valid"))
def _bits_finish_asym(vq, db_bytes, bids, vmask, k: int, n_valid: int):
    """Asymmetric finish: gather the winning 8-row byte blocks (2 KB
    contiguous) and rescore them with the SAME bf16-input/f32-accumulate
    chunked contraction the asym kernel used (the containment argument
    needs recomputed scores to equal the phase-1 scores); dense-score the
    ragged tail identically; final top-k."""
    vqb = jnp.asarray(vq, jnp.bfloat16)
    nq, kf_pad = bids.shape
    nb = db_bytes.shape[1]
    nb_main = n_valid // 8
    blocks = db_bytes.reshape(-1, 8, nb)
    cand = jnp.take(blocks, bids, axis=0)            # (nq, kf_pad, 8, NB)
    pm1 = unpack_pm1(cand).astype(jnp.bfloat16)      # fuses into the dots
    cb, cd = _chunk_dims(nb)
    sims = jnp.zeros((nq, kf_pad, 8), jnp.float32)
    for c in range(nb // cb):
        sims = sims + jnp.einsum(
            "qkrd,qd->qkr", pm1[..., c * cd:(c + 1) * cd],
            vqb[:, c * cd:(c + 1) * cd],
            preferred_element_type=jnp.float32)
    rows = (bids[:, :, None] * 8
            + jnp.arange(8, dtype=jnp.int32)).reshape(nq, kf_pad * 8)
    valid = jnp.repeat(vmask, 8, axis=1)
    scores = jnp.where(valid, sims.reshape(nq, kf_pad * 8), -jnp.inf)
    tail = n_valid - nb_main * 8
    if tail:
        tpm1 = unpack_pm1(db_bytes[nb_main * 8: n_valid]
                          ).astype(jnp.bfloat16)
        ts = jnp.zeros((nq, tail), jnp.float32)
        for c in range(nb // cb):
            ts = ts + jnp.einsum(
                "qd,td->qt", vqb[:, c * cd:(c + 1) * cd],
                tpm1[:, c * cd:(c + 1) * cd],
                preferred_element_type=jnp.float32)
        scores = jnp.concatenate([scores, ts], axis=1)
        rows = jnp.concatenate(
            [rows, jnp.tile(jnp.arange(nb_main * 8, n_valid,
                                       dtype=jnp.int32)[None], (nq, 1))],
            axis=1)
    vals, pos = jax.lax.top_k(scores, k)
    idxs = jnp.take_along_axis(rows, pos, axis=1)
    return vals, jnp.where(vals > -jnp.inf, idxs, -1)


@partial(jax.jit, static_argnames=("k", "n_valid", "chunk_rows"))
def _asym_topk_xla(vq, db_bytes, k: int, n_valid: int,
                   chunk_rows: int = 32768):
    """Plain-XLA exact asymmetric top-k (CPU fallback; same fine-max +
    candidate-block structure as :func:`_hamming_topk_impl`, scored with
    the bf16 contraction instead of popcounts)."""
    vqb = jnp.asarray(vq, jnp.bfloat16)
    nq = vqb.shape[0]
    n_pad = db_bytes.shape[0]
    chunk_rows = max(128, min(chunk_rows, n_pad))
    chunk_rows -= chunk_rows % 128
    dbp = _pad_rows(db_bytes, chunk_rows)
    n_chunks = dbp.shape[0] // chunk_rows
    nb = dbp.shape[1]
    cb, cd = _chunk_dims(nb)

    def _scores(chunk, row0):
        pm1 = unpack_pm1(chunk).astype(jnp.bfloat16)
        s = jnp.zeros((nq, chunk.shape[0]), jnp.float32)
        for c in range(nb // cb):
            s = s + jnp.matmul(vqb[:, c * cd:(c + 1) * cd],
                               pm1[:, c * cd:(c + 1) * cd].T,
                               preferred_element_type=jnp.float32)
        rows = row0 + jnp.arange(chunk.shape[0], dtype=jnp.int32)
        return jnp.where(rows[None, :] < n_valid, s, -jnp.inf)

    def body(best, xs):
        ci, chunk = xs
        s = _scores(chunk, ci * chunk_rows)
        kk = min(k, chunk.shape[0])
        v, i = jax.lax.top_k(s, kk)
        i = i + ci * chunk_rows
        bv, bi = best
        v2 = jnp.concatenate([bv, v], axis=1)
        i2 = jnp.concatenate([bi, i], axis=1)
        nv, pos = jax.lax.top_k(v2, k)
        return (nv, jnp.take_along_axis(i2, pos, axis=1)), None

    init = (jnp.full((nq, k), -jnp.inf), jnp.full((nq, k), -1, jnp.int32))
    (vals, idxs), _ = jax.lax.scan(
        body, init, (jnp.arange(n_chunks, dtype=jnp.int32),
                     dbp.reshape(n_chunks, chunk_rows, nb)))
    return vals, jnp.where(vals > -jnp.inf, idxs, -1)


@partial(jax.jit, static_argnames=("k", "n_valid", "tile_rows",
                                   "asym", "use_mxu", "interpret"))
def _fused_search(q, mean, proj, db_bytes, *, k: int, n_valid: int,
                  tile_rows: int, asym: bool, use_mxu: bool,
                  interpret: bool):
    from .topk_pallas import _hier_select

    qp, vq = _binarize_project(q, mean, proj)   # the unused one is DCEd
    nq = qp.shape[0]
    if asym:
        # EXACT asymmetric top-k: phase 1 emits fine maxima of the FINAL
        # (continuous-query) score, so no symmetric shortlist or
        # rerank_factor is involved (r5 — see _bits_finemax_kernel)
        if not use_mxu:
            return _asym_topk_xla(vq, db_bytes, k, n_valid)
        vqq = vq if nq >= 8 else jnp.concatenate(
            [vq, jnp.zeros((8 - nq, vq.shape[1]), vq.dtype)])
        fmax = _bits_finemax_asym_phase1(vqq, db_bytes, n_valid, tile_rows,
                                         interpret)
        bids, vmask = _hier_select(fmax, k, tile_rows, n_valid)
        vals, idxs = _bits_finish_asym(vqq, db_bytes, bids, vmask, k,
                                       n_valid)
        return vals[:nq], idxs[:nq]
    if not use_mxu:
        return hamming_topk(qp, db_bytes, k, n_valid=n_valid)
    # Mosaic miscompiles sub-8-row dots (rank_topk_fused note): pad
    # queries to one sublane tile and slice the answer
    qpp = qp if nq >= 8 else jnp.concatenate(
        [qp, jnp.zeros((8 - nq, qp.shape[1]), qp.dtype)])
    fmax = _bits_finemax_phase1(qpp, db_bytes, n_valid, tile_rows,
                                interpret)
    bids, vmask = _hier_select(fmax, k, tile_rows, n_valid)
    vals, idxs = _bits_finish(qpp, db_bytes, bids, vmask, k, n_valid)
    return vals[:nq], idxs[:nq]


def hamming_search_fused(queries, codec: BinaryCodec, db_bytes, k: int, *,
                         n_valid: Optional[int] = None,
                         tile_rows: int = _BITS_TILE, asym: bool = True,
                         use_mxu: Optional[bool] = None,
                         interpret: Optional[bool] = None):
    """The whole binary search as ONE device dispatch: float queries ->
    centered projection (packed codes + continuous projection from one
    shared matmul) -> top-k (the MXU unpack-matmul phases on TPU, plain
    XLA elsewhere).

    ``asym=False`` ranks by the symmetric ±1 dot (``n_bits - 2*hamming``,
    exact integers). ``asym=True`` (r5) ranks by the EXACT asymmetric
    score — continuous projected query against ±1 codes — selected
    directly by an asymmetric phase 1 (:func:`_bits_finemax_kernel`), so
    there is no symmetric shortlist or ``rerank_factor``: the r4 design
    rescored the top ``4k`` Hamming candidates, which (a) could miss rows
    whose Hamming rank exceeded the shortlist and (b) paid 10.4 ms of
    k=400 hierarchy-select + popcount-finish per 256-query batch
    (PERF_NOTES r5). Asymmetric scores are bf16-input/f32-accumulate —
    the dense bf16 ranking tier's arithmetic.

    Staged, a search was 3-5 eager dispatches; through the dev tunnel
    each adds ~12-30 ms of round-trip latency on the serving path
    (PERF_NOTES "Index server" — the r4 PQ fusion recipe applied to the
    binary tier). Unlike the DENSE ranking path, fusing is safe here: the
    candidate fetch is a plain XLA gather of contiguous 2 KB byte blocks,
    not the Pallas DMA-pipeline gather whose scheduling regressed under
    fusion (topk_pallas ``_hierarchical`` docstring). ``db_bytes`` must
    come from :func:`bytes_for_search` (same contract as
    :func:`hamming_topk_mxu`).
    """
    q = jnp.asarray(queries)
    dbb = jnp.asarray(db_bytes)
    assert dbb.dtype == jnp.uint8 and dbb.shape[0] % tile_rows == 0, \
        "db_bytes must come from bytes_for_search (uint8, tile-padded)"
    n = dbb.shape[0] if n_valid is None else int(n_valid)
    assert 0 < k <= n, (k, n)
    if use_mxu is None:
        use_mxu = jax.default_backend() == "tpu"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _fused_search(q, codec.mean, codec.proj, dbb, k=int(k),
                         n_valid=n, tile_rows=tile_rows, asym=bool(asym),
                         use_mxu=bool(use_mxu), interpret=bool(interpret))


def hamming_topk_mxu(q_packed, db_bytes, k: int, *,
                     n_valid: Optional[int] = None,
                     tile_rows: int = _BITS_TILE,
                     interpret: Optional[bool] = None):
    """Exact Hamming top-k over a :func:`bytes_for_search` byte corpus via
    the MXU (same return contract as :func:`hamming_topk`; values are the
    identical ``n_bits - 2*dist`` integers — +-1 products accumulate
    exactly in f32). Stages run as SEPARATE jits like the dense ranking
    path (PERF_NOTES: fusing them schedules the gather pathologically)."""
    from .topk_pallas import _hier_select

    qp = jnp.asarray(q_packed)
    dbb = jnp.asarray(db_bytes)
    assert dbb.dtype == jnp.uint8 and dbb.shape[0] % tile_rows == 0, \
        "db_bytes must come from bytes_for_search (uint8, tile-padded)"
    qw = qp.shape[1] * (4 if qp.dtype == jnp.uint32 else 1)
    assert qw == dbb.shape[1], (qp.shape, dbb.shape)
    n = dbb.shape[0] if n_valid is None else int(n_valid)
    assert 0 < k <= n, f"k={k} exceeds the {n} database rows"
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    # Mosaic miscompiles sub-8-row dots (see rank_topk_fused): pad
    # queries to one sublane tile and slice the answer
    nq = qp.shape[0]
    if nq < 8:
        qp = jnp.concatenate(
            [qp, jnp.zeros((8 - nq, qp.shape[1]), qp.dtype)])
    fmax = _bits_finemax_phase1(qp, dbb, n, tile_rows, interpret)
    bids, vmask = _hier_select(fmax, k, tile_rows, n)
    vals, idxs = _bits_finish(qp, dbb, bids, vmask, k, n)
    return vals[:nq], idxs[:nq]
