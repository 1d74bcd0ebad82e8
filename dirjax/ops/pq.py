"""Product quantization (PQ/OPQ): ADC retrieval far past int8 capacity.

The reference toolbox ranks with a dense fp32 matmul over full descriptors
(``/root/reference/dirtorch/utils/common.py:30-38``) — at 2048-D fp32 that
is 8 KB per image, so a 16 GB chip tops out around 2M images even int8-
quantized. PQ stores each image as ``m`` uint8 codebook ids (16-32 bytes):
the same chip holds a **hundred-million-image** corpus, scored approximately
via asymmetric distance computation (ADC) and optionally re-ranked exactly
on a short candidate list. This subsystem is beyond-reference capability
(dirtorch has no compressed-domain search at all).

TPU-first design:

* **k-means trains all ``m`` subspaces at once** as one batched einsum on
  the MXU (``'mcd,mkd->mck'``) — no per-subspace Python loop, one fused
  assignment + centroid-update step, chunked over rows with a
  ``lax.scan`` so peak memory is O(chunk * ksub) not O(N * ksub).
* **ADC is a one-hot contraction, not a gather.** TPU gathers run at
  ~100-150 GB/s (PERF_NOTES.md) and a gather formulation writes the
  (nq, N) partial-score matrix once per subspace; instead codes expand to
  a one-hot operand contracted against the lookup tables on the MXU
  (``'cmk,qmk->qc'``), streamed in row chunks with a running top-k so the
  full score matrix never materializes (the same design rule as
  ``ops/topk_pallas.py``).
* **Static shapes throughout**: rows pad up to the chunk size and mask,
  so every chunk compiles once and ``lax.scan`` drives the stream.

Exactness contract: ADC scores equal ``q . reconstruct(codes)`` to fp32
(``precision=HIGHEST`` pins the contraction on TPU); the approximation
error is purely the quantizer's, never the kernel's.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "train_pq", "encode_pq", "pq_lookup", "pq_scores", "pq_topk",
    "reconstruct_pq", "train_opq",
]

_HIGHEST = jax.lax.Precision.HIGHEST


def _as_subvectors(x, m: int):
    """(N, D) -> (m, N, dsub) with D = m * dsub."""
    n, d = x.shape
    assert d % m == 0, f"dim {d} not divisible by m={m}"
    return jnp.transpose(x.reshape(n, m, d // m), (1, 0, 2))


def _assign(chunk, centroids):
    """Nearest-centroid ids for one row chunk, batched over subspaces.

    chunk (m, C, dsub), centroids (m, ksub, dsub) -> (m, C) int32.
    ||x-c||^2 = ||x||^2 - 2 x.c + ||c||^2; the x^2 term is constant per
    row so the argmin needs only the cross term and c^2.
    """
    xc = jnp.einsum("mcd,mkd->mck", chunk, centroids,
                    precision=_HIGHEST, preferred_element_type=jnp.float32)
    c2 = jnp.sum(jnp.square(centroids), axis=-1)          # (m, ksub)
    return jnp.argmin(c2[:, None, :] - 2.0 * xc, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("iters",))
def _kmeans(x_chunks, w_chunks, init, iters: int):
    """Batched-over-subspaces Lloyd iterations.

    x_chunks (nchunks, m, C, dsub), w_chunks (nchunks, C) 0/1 pad mask,
    init (m, ksub, dsub). Empty clusters keep their previous centroid.
    """
    ksub = init.shape[1]

    def one_iter(_, centroids):
        def body(carry, xs):
            sums, counts = carry
            chunk, w = xs
            ids = _assign(chunk, centroids)               # (m, C)
            oh = jax.nn.one_hot(ids, ksub, dtype=jnp.float32) \
                * w[None, :, None]                        # (m, C, ksub)
            sums = sums + jnp.einsum(
                "mck,mcd->mkd", oh, chunk,
                precision=_HIGHEST, preferred_element_type=jnp.float32)
            counts = counts + jnp.sum(oh, axis=1)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            body, (jnp.zeros_like(centroids),
                   jnp.zeros(centroids.shape[:2], jnp.float32)),
            (x_chunks, w_chunks))
        return jnp.where(counts[..., None] > 0,
                         sums / jnp.maximum(counts, 1.0)[..., None],
                         centroids)

    return jax.lax.fori_loop(0, iters, one_iter, init)


def _chunked(x_sub, chunk: int):
    """Pad (m, N, dsub) rows to a chunk multiple; return scan operands."""
    m, n, dsub = x_sub.shape
    pad = (-n) % chunk
    if pad:
        x_sub = jnp.concatenate(
            [x_sub, jnp.zeros((m, pad, dsub), x_sub.dtype)], axis=1)
    w = (jnp.arange(n + pad) < n).astype(jnp.float32)
    nchunks = (n + pad) // chunk
    x_chunks = jnp.transpose(
        x_sub.reshape(m, nchunks, chunk, dsub), (1, 0, 2, 3))
    return x_chunks, w.reshape(nchunks, chunk)


def train_pq(x, m: int = 16, ksub: int = 256, *, iters: int = 25,
             seed: int = 0, sample: Optional[int] = 262144,
             chunk: int = 8192, init=None):
    """Learn PQ codebooks (m, ksub, dsub) by per-subspace k-means.

    ``sample`` caps the training set (classic PQ practice: a few hundred
    thousand rows suffice for 256 centroids); ``init`` warm-starts the
    centroids (used by :func:`train_opq`'s alternating minimization).
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    assert ksub <= 256, "codes are uint8: ksub must be <= 256"
    assert n >= ksub, f"need at least ksub={ksub} training rows, got {n}"
    key = jax.random.PRNGKey(seed)
    if sample is not None and n > sample:
        idx = jax.random.choice(key, n, (sample,), replace=False)
        x = jnp.take(x, idx, axis=0)
        n = sample
    x_sub = _as_subvectors(x, m)                          # (m, N, dsub)
    if init is None:
        # shared random row draw; each subspace sees its own subvectors
        pick = jax.random.choice(jax.random.fold_in(key, 1), n, (ksub,),
                                 replace=False)
        init = jnp.take(x_sub, pick, axis=1)              # (m, ksub, dsub)
    chunk = min(chunk, max(256, n))
    x_chunks, w_chunks = _chunked(x_sub, chunk)
    return _kmeans(x_chunks, w_chunks, jnp.asarray(init, jnp.float32), iters)


@functools.partial(jax.jit, static_argnames=())
def _encode_block(block, codebooks):
    ids = _assign(_as_subvectors(block, codebooks.shape[0]), codebooks)
    return jnp.transpose(ids, (1, 0))                     # (C, m)


def encode_pq(x, codebooks, *, chunk: int = 65536):
    """Quantize (N, D) rows to (N, m) uint8 codes, chunked so encoding a
    corpus never needs more than one (chunk, D) block on device."""
    x = jnp.asarray(x, jnp.float32)
    n = x.shape[0]
    out = []
    for start in range(0, n, chunk):
        block = x[start: start + chunk]
        if block.shape[0] < chunk and start > 0:
            # pad the ragged tail to the steady-state shape: one compile
            pad = chunk - block.shape[0]
            block = jnp.concatenate(
                [block, jnp.zeros((pad, x.shape[1]), x.dtype)])
            out.append(_encode_block(block, codebooks)[:n - start])
        else:
            out.append(_encode_block(block, codebooks))
    return jnp.concatenate(out).astype(jnp.uint8)


def pq_lookup(q, codebooks):
    """ADC lookup tables (nq, m, ksub): the dot product of each query
    subvector with every centroid. Scoring a database row is then a sum of
    ``m`` table entries — computed on the MXU in :func:`pq_topk`."""
    q = jnp.asarray(q, jnp.float32)
    nq, d = q.shape
    m = codebooks.shape[0]
    return jnp.einsum("qmd,mkd->qmk", q.reshape(nq, m, d // m), codebooks,
                      precision=_HIGHEST, preferred_element_type=jnp.float32)


def _onehot_scores(luts, codes_chunk):
    """(nq, C) ADC scores for one code chunk via the one-hot contraction."""
    ksub = luts.shape[2]
    oh = jax.nn.one_hot(codes_chunk.astype(jnp.int32), ksub,
                        dtype=jnp.float32)                # (C, m, ksub)
    return jnp.einsum("cmk,qmk->qc", oh, luts,
                      precision=_HIGHEST, preferred_element_type=jnp.float32)


def pq_scores(luts, codes):
    """Dense (nq, N) ADC score matrix — tests / small corpora only; the
    serving path is :func:`pq_topk`, which never materializes this."""
    return _onehot_scores(luts, jnp.asarray(codes))


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def _pq_topk_scan(luts, codes_pad, n_valid, k: int, chunk: int):
    nq = luts.shape[0]
    nchunks = codes_pad.shape[0] // chunk
    chunks = codes_pad.reshape(nchunks, chunk, codes_pad.shape[1])
    kk = min(k, chunk)

    def body(carry, xs):
        best_v, best_i = carry
        ci, block = xs
        s = _onehot_scores(luts, block)                   # (nq, chunk)
        col = ci * chunk + jnp.arange(chunk, dtype=jnp.int32)[None, :]
        s = jnp.where(col < n_valid, s, -jnp.inf)
        v, p = jax.lax.top_k(s, kk)
        idx = jnp.take_along_axis(jnp.broadcast_to(col, s.shape), p, axis=1)
        cat_v = jnp.concatenate([best_v, v], axis=1)      # width <= 2k
        cat_i = jnp.concatenate([best_i, idx], axis=1)
        best_v, mp = jax.lax.top_k(cat_v, kk)
        best_i = jnp.take_along_axis(cat_i, mp, axis=1)
        return (best_v, best_i), None

    init = (jnp.full((nq, kk), -jnp.inf),
            jnp.full((nq, kk), -1, jnp.int32))
    (vals, idxs), _ = jax.lax.scan(
        body, init, (jnp.arange(nchunks, dtype=jnp.int32), chunks))
    return vals, idxs


def pq_topk(luts, codes, k: int, *, chunk: int = 131072
            ) -> Tuple[jax.Array, jax.Array]:
    """Streaming ADC top-k: (values, indices) of the best ``k`` rows per
    query. Rows stream in ``chunk``-sized blocks under one ``lax.scan``
    with a running 2k-wide merge, so peak memory is O(nq * chunk) scores
    plus the (N, m) codes — never the (nq, N) matrix."""
    codes = jnp.asarray(codes)
    n = codes.shape[0]
    chunk = min(chunk, max(1024, n))
    pad = (-n) % chunk
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)])
    return _pq_topk_scan(luts, codes, jnp.int32(n), k, chunk)


def reconstruct_pq(codes, codebooks):
    """Decode (N, m) codes back to (N, D) centroids-concatenated rows."""
    codes = jnp.asarray(codes).astype(jnp.int32)
    rec = jax.vmap(lambda cb, c: cb[c], in_axes=(0, 1), out_axes=1)(
        codebooks, codes)                                 # (N, m, dsub)
    return rec.reshape(codes.shape[0], -1)


def train_opq(x, m: int = 16, ksub: int = 256, *, iters: int = 25,
              opq_iters: int = 10, seed: int = 0,
              sample: Optional[int] = 131072, chunk: int = 8192):
    """OPQ: learn a rotation R (D, D) + codebooks minimizing quantization
    error of ``x @ R`` (Ge et al., OPQ, CVPR'13 — alternating k-means and
    orthogonal Procrustes). Encode with ``encode_pq(x @ R, codebooks)``
    and build query tables from ``q @ R``; rotation preserves dot products
    against reconstructions, so search semantics are unchanged.

    Returns ``(R, codebooks)``.
    """
    x = jnp.asarray(x, jnp.float32)
    n, d = x.shape
    key = jax.random.PRNGKey(seed)
    if sample is not None and n > sample:
        idx = jax.random.choice(key, n, (sample,), replace=False)
        x = jnp.take(x, idx, axis=0)
    r = jnp.eye(d, dtype=jnp.float32)
    codebooks = None
    for _ in range(opq_iters):
        xr = x @ r
        codebooks = train_pq(xr, m, ksub, iters=max(4, iters // 4),
                             seed=seed, sample=None, chunk=chunk,
                             init=codebooks)
        rec = reconstruct_pq(encode_pq(xr, codebooks), codebooks)
        # orthogonal Procrustes: argmin_R ||x R - rec||_F
        u, _, vt = jnp.linalg.svd(
            jnp.matmul(x.T, rec, precision=_HIGHEST), full_matrices=False)
        r = u @ vt
    codebooks = train_pq(x @ r, m, ksub, iters=iters, seed=seed,
                         sample=None, chunk=chunk, init=codebooks)
    return r, codebooks
