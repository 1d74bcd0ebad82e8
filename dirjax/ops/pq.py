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
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "train_pq", "encode_pq", "pq_lookup", "pq_scores", "pq_topk",
    "pq_pad_codes", "reconstruct_pq", "train_opq",
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
    if n == 0:   # empty batch (e.g. a no-op serving add()): no device work
        return jnp.zeros((0, codebooks.shape[0]), jnp.uint8)
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


def _adc_modes(compute_dtype):
    """(operand dtype, dot precision) for the ADC contraction.

    ``None``/fp32 pins ``HIGHEST`` — without it the TPU MXU silently
    truncates fp32 operands to bf16 (the same rule as ``ops/ranking``).
    bf16 is ~3x faster on TPU (measured: 1M rows m=32/ksub=16 scores in
    1.4 ms bf16 vs 3.7 ms fp32-HIGHEST) at ~0.4% relative score noise —
    well under PQ's own quantization error; the serving default.
    """
    if compute_dtype is None or compute_dtype == jnp.float32:
        return jnp.float32, _HIGHEST
    return compute_dtype, None


def _onehot_scores(luts, codes_chunk, dt=jnp.float32, prec=_HIGHEST):
    """(nq, C) ADC scores for one code chunk.

    The one-hot expands against the lookup tables on the MXU; XLA fuses
    the iota-compare producer into the contraction (measured at compute
    bound on v5e — no (C, m, ksub) operand ever reaches HBM).
    """
    ksub = luts.shape[2]
    oh = jax.nn.one_hot(codes_chunk.astype(jnp.int32), ksub, dtype=dt)
    return jnp.einsum("cmk,qmk->qc", oh, luts.astype(dt),
                      precision=prec, preferred_element_type=jnp.float32)


def pq_scores(luts, codes, *, compute_dtype=None):
    """Dense (nq, N) ADC score matrix — tests / small corpora only; the
    serving path is :func:`pq_topk`, which never materializes this."""
    dt, prec = _adc_modes(compute_dtype)
    return _onehot_scores(luts, jnp.asarray(codes), dt, prec)


@functools.partial(jax.jit, static_argnames=("k", "dt_name"))
def _pq_topk_dense(luts, codes_pad, n_valid, k: int,
                   dt_name: str = "float32"):
    """Small-corpus path: dense scores + one top_k (chunk == padded N)."""
    dt, prec = _adc_modes(jnp.dtype(dt_name).type)
    s = _onehot_scores(luts, codes_pad, dt, prec)
    col = jnp.arange(codes_pad.shape[0], dtype=jnp.int32)[None, :]
    s = jnp.where(col < n_valid, s, -jnp.inf)
    kk = min(k, codes_pad.shape[0])
    vals, idxs = jax.lax.top_k(s, kk)
    return vals, jnp.where(vals > -jnp.inf, idxs, -1)


#: finite -inf stand-in inside the selection dots: 0 * -inf would be NaN
#: (host-side np scalar: a jnp constant here would initialize the backend
#: at import time, blocking `import dirjax` on claiming the accelerator)
_NEG = np.float32(-3.0e38)


def _select_exact(values, sel):
    """``take_along_axis(values, sel, axis=1)`` as a one-hot MXU
    contraction. Per-element lane gathers lower to scalar VPU loads on
    TPU (~14 ns each — a (256, 1600) gather costs milliseconds,
    PERF_NOTES.md); the dot is bitwise-exact for finite fp32 payloads
    (each one-hot row has a single 1.0) and exact for int payloads below
    2^24. ``values`` must not contain +-inf (use :data:`_NEG`)."""
    out_int = jnp.issubdtype(values.dtype, jnp.integer)
    oh = jax.nn.one_hot(sel, values.shape[1], dtype=jnp.float32)
    picked = jnp.einsum("qkw,qw->qk", oh, values.astype(jnp.float32),
                        precision=_HIGHEST,
                        preferred_element_type=jnp.float32)
    return picked.astype(jnp.int32) if out_int else picked


def _descend_maxima(fmax, k: int):
    """Hierarchical selection over per-block maxima: (ids, valid).

    Builds a max-pyramid (x16 per level) until the coarsest width is a
    cheap ``lax.top_k`` (<= 4096 lanes — wide sorts are the cost center:
    0.1 ms at width 1600 vs 2.2 ms at 12800, PERF_NOTES.md), then descends:
    at each level the surviving groups expand to their 16 children
    (values fetched by a one-hot block contraction, not a gather), and a
    narrow (<= 16k)-wide top_k keeps k. Each level's top-k-by-group-max
    provably contains every true top-k row (the containment argument of
    ``ops/topk_pallas.py``), so the final ids do too.
    """
    nq, nb = fmax.shape
    pyramid = [jnp.maximum(fmax, _NEG)]
    while pyramid[-1].shape[1] > 4096:
        f = pyramid[-1]
        pad = (-f.shape[1]) % 16
        if pad:
            f = jnp.pad(f, ((0, 0), (0, pad)), constant_values=_NEG)
        pyramid.append(f.reshape(nq, -1, 16).max(axis=2))
    top_v, top = jax.lax.top_k(pyramid[-1],
                               min(k, pyramid[-1].shape[1]))
    for child in reversed(pyramid[:-1]):
        w = child.shape[1]
        pad = (-w) % 16
        c3 = (jnp.pad(child, ((0, 0), (0, pad)), constant_values=_NEG)
              if pad else child).reshape(nq, -1, 16)
        # exact 16-wide block fetch on the MXU (same trick as phase C)
        oh = jax.nn.one_hot(top, c3.shape[1], dtype=jnp.float32)
        v = jnp.einsum("qkc,qcw->qkw", oh, c3, precision=_HIGHEST,
                       preferred_element_type=jnp.float32).reshape(nq, -1)
        cand = (top[:, :, None] * 16
                + jnp.arange(16, dtype=jnp.int32)).reshape(nq, -1)
        v = jnp.where(cand < w, v, _NEG)
        top_v, sel = jax.lax.top_k(v, min(k, v.shape[1]))
        top = _select_exact(cand, sel)
    return top, top_v > 0.5 * _NEG


#: Pallas phase-A row tile: VMEM = codes (tile*m) + one-hot
#: (tile*m*ksub*2 bf16) + scores (tile*nq*4) — ~2.3 MB at m=32/ksub=16
_PALLAS_TILE = 1024


def _pallas_geometry(mk: int, m: int, nq: int,
                     dt_bytes: int) -> Tuple[int, int]:
    """(tile_rows, groups) for the phase-A kernel under a VMEM budget.

    mk <= 1024 keeps the r3-measured single-slice geometry untouched.
    Past that (8-bit codebooks: m=32/ksub=256 is mk=8192) the flat id
    axis is cut into the smallest number of ksub-aligned slices (a
    divisor of m) of <= 512 lanes — the width the original kernel was
    tuned at — and the row tile is the largest of 1024/512/256 whose
    conservative estimate fits 12 MB of the 16 MB scope: the whole LUT
    (mk*nq*dt) and expansion matrix (m*mk*2 bf16) stay resident, plus
    per tile the codes, ONE slice's f32 rep + one-hot, and the f32
    score accumulator. Over-VMEM compiles WEDGE this chip (CLAUDE.md),
    hence estimate-first instead of try/fail."""
    if mk <= 512:
        return _PALLAS_TILE, 1
    if mk <= 1024:
        return _PALLAS_TILE // 2, 1
    groups = next(g for g in range(2, m + 1)
                  if m % g == 0 and mk // g <= 512)
    g = mk // groups
    fixed = mk * nq * dt_bytes + m * mk * 2
    for tile in (1024, 512, 256):
        if fixed + tile * (m + 4 * g + dt_bytes * g + 4 * nq) <= 12 << 20:
            return tile, groups
    # nothing fits (e.g. fp32 LUTs at nq >= 1024): tile 0 tells the
    # caller to take the XLA scan — compiling an over-budget kernel
    # anyway is exactly the wedge this helper exists to prevent
    return 0, groups


@functools.partial(jax.jit,
                   static_argnames=("k", "chunk", "block", "dt_name",
                                    "phase_a", "n_static"))
def _pq_topk_hier(luts, codes_pad, n_valid, k: int, chunk: int, block: int,
                  dt_name: str = "float32", phase_a: str = "xla",
                  n_static: int = -1):
    """Streaming hierarchical ADC top-k (the at-scale path).

    Phase A: one ``lax.scan`` over row chunks scores each chunk on the MXU
    and emits ONLY per-``block``-row maxima — (nq, N/block) fp32, e.g.
    16 MB at nq=256 over 1M rows, never the (nq, N) matrix. Phase B:
    :func:`_descend_maxima` -> k winning blocks/query. Phase C: gather the
    winning blocks' CODES (block*m bytes each — candidate gathers move
    kilobytes, not descriptor rows) and rescore them from the same
    ``compute_dtype``-rounded tables, so phase A maxima and phase C scores
    agree to fp32 summation order; one final (k*block)-wide top_k.
    """
    dt, prec = _adc_modes(jnp.dtype(dt_name).type)
    nq = luts.shape[0]
    m = codes_pad.shape[1]
    if phase_a in ("pallas", "interpret"):
        assert n_static >= 0, "pallas phase A needs the static row count"
        mk = luts.shape[1] * luts.shape[2]
        tile, groups = _pallas_geometry(mk, m, nq,
                                        jnp.dtype(dt).itemsize)
        if tile == 0:            # no geometry fits the VMEM budget
            phase_a = "xla"
    if phase_a in ("pallas", "interpret"):
        tile = min(tile, codes_pad.shape[0])
        tile = max(block, (tile // block) * block)   # kernel reshapes
        #                                              (tile//block, block)
        fpt = tile // block
        n_tiled = codes_pad.shape[0] + ((-codes_pad.shape[0]) % tile)
        if fpt % 8 and n_tiled != tile:
            # the fmax BlockSpec sublane (tile//block) must be a multiple
            # of 8 or the full dim (CLAUDE.md Mosaic rules) — bad shapes
            # have WEDGED this toolchain's chip; take the XLA scan instead
            phase_a = "xla"
    if phase_a in ("pallas", "interpret"):
        pad = (-codes_pad.shape[0]) % tile
        cp = jnp.concatenate(
            [codes_pad, jnp.zeros((pad, m), codes_pad.dtype)]) \
            if pad else codes_pad
        luts_flat_t = luts.astype(dt).reshape(nq, -1).T   # (m*ksub, nq)
        fmax = _adc_finemax_pallas(
            luts_flat_t, cp, n_static, tile_rows=tile, block=block,
            interpret=phase_a == "interpret",
            groups=groups).T                              # (nq, N/block)
    else:
        nchunks = codes_pad.shape[0] // chunk
        chunks = codes_pad.reshape(nchunks, chunk, m)

        def body(_, xs):
            ci, blk = xs
            s = _onehot_scores(luts, blk, dt, prec)       # (nq, chunk)
            col = ci * chunk + jnp.arange(chunk,
                                          dtype=jnp.int32)[None, :]
            s = jnp.where(col < n_valid, s, -jnp.inf)
            return 0, s.reshape(nq, chunk // block, block).max(axis=2)

        _, fmax = jax.lax.scan(
            body, 0, (jnp.arange(nchunks, dtype=jnp.int32), chunks))
        fmax = jnp.moveaxis(fmax, 0, 1).reshape(nq, -1)   # (nq, N/block)

    bids, bvalid = _descend_maxima(fmax, k)               # (nq, kf)
    kf = bids.shape[1]
    safe_bids = jnp.clip(bids, 0, codes_pad.shape[0] // block - 1)
    rows = (safe_bids[:, :, None] * block
            + jnp.arange(block, dtype=jnp.int32)).reshape(nq, kf * block)
    # gather whole code BLOCKS (block*m contiguous bytes each), not rows:
    # the same 52 MB fetched as 32-byte scattered rows measured 18 ms on
    # v5e; as 2 KB contiguous block rows it is ~1 ms (XLA row gathers are
    # per-row-overhead-bound at small widths, PERF_NOTES.md)
    cand = jnp.take(codes_pad.reshape(-1, block * m),
                    safe_bids.reshape(-1), axis=0) \
        .reshape(nq, kf * block, m)
    # rescore with the SAME one-hot contraction (and rounded tables) as
    # phase A, batched per query — scores agree to fp32 summation order.
    # NB: a take_along_axis LUT-gather formulation of this sum measured
    # 720 ms at nq=256/6400 cands on v5e (scalar VPU gathers); the
    # batched one-hot einsum is 0.6 ms.
    oh = jax.nn.one_hot(cand.astype(jnp.int32), luts.shape[2], dtype=dt)
    s = jnp.einsum("qcmk,qmk->qc", oh, luts.astype(dt),
                   precision=prec, preferred_element_type=jnp.float32)
    ok = (rows < n_valid) & jnp.repeat(bvalid, block, axis=1)
    s = jnp.where(ok, s, -jnp.inf)
    kk = min(k, s.shape[1])
    vals, pos = jax.lax.top_k(s, kk)
    # row ids can exceed fp32's exact-int range (2^24) at capacity scale,
    # so select block id and in-block offset separately (both small)
    idxs = _select_exact(rows // block, pos) * block \
        + _select_exact(rows % block, pos)
    return vals, jnp.where(vals > -jnp.inf, idxs, -1)


#: fine-block rows for the hierarchical path: 64 rows/block keeps the
#: maxima array 64x smaller than the scores (16 MB at nq=256 over 1M rows)
#: while candidate re-scoring stays a few-MB gather
_BLOCK = 64


# --- Pallas phase A: ADC fine-max without materializing scores ----------
#
# The XLA scan above must write each chunk's (nq, chunk) score matrix to
# HBM before the fine-max reduce reads it back (~2 GB round-trip per 1M
# rows at nq=256 — the measured 6.3 ms vs the 1.4 ms compute). This
# kernel computes the one-hot contraction AND the per-block maxima inside
# VMEM, so HBM sees only the codes in (m bytes/row) and the maxima out.
# Layout mirrors ops/topk_pallas._finemax_kernel: DB rows on sublanes, so
# the per-64-consecutive-row maxima reduce is a free sublane reshape.


def _adc_finemax_kernel(lut_ref, codes_ref, expand_ref, fmax_ref, *,
                        n_total, tile_rows, block, ksub, groups=1):
    t = pl.program_id(0)
    # one-hot over the FLAT (m*ksub) id axis: lane l belongs to subspace
    # l//ksub and centroid l%ksub, so oh[r, l] = (codes[r, l//ksub] ==
    # l%ksub). The lane-repeat of codes is done ON THE MXU via the
    # constant expansion matrix E[j, l] = [l//ksub == j] (a
    # vector-shape-cast repeat fails Mosaic layout inference on this
    # toolchain). Code values <= 255 are exact in bf16, so the tiny
    # (tile, m) x (m, m*ksub) dot reproduces them exactly.
    # uint8 -> bf16 has no direct Mosaic lowering; hop via int32/f32
    #
    # For large ksub the (tile, m*ksub) rep/one-hot would blow scoped
    # VMEM (16 MB at m=32/ksub=256/tile=1024), so the flat id axis is
    # processed in ``groups`` static slices, accumulating the score dot.
    # Slices are ksub-aligned (g = mk/groups is a multiple of ksub), so
    # the LOCAL lane iota % ksub still names the right centroid, and the
    # expansion matrix rows outside a slice's subspaces are zero there —
    # slicing E's lanes (512-multiples) is exact. groups=1 is the
    # original whole-width kernel.
    codes_bf = codes_ref[...].astype(jnp.int32).astype(jnp.float32) \
        .astype(jnp.bfloat16)
    mk = expand_ref.shape[1]
    g = mk // groups
    nt = codes_bf.shape[0]
    nq = lut_ref.shape[1]
    scores = jnp.zeros((nt, nq), jnp.float32)
    for j in range(groups):
        rep = jax.lax.dot_general(
            codes_bf, expand_ref[:, j * g:(j + 1) * g],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # (tile, g)
        lane_c = jax.lax.broadcasted_iota(jnp.int32, rep.shape, 1) % ksub
        oh = (rep == lane_c.astype(jnp.float32)).astype(lut_ref.dtype)
        scores = scores + jax.lax.dot_general(
            oh, lut_ref[j * g:(j + 1) * g, :],            # (g, nq)
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=(jax.lax.Precision.HIGHEST
                       if lut_ref.dtype == jnp.float32 else None),
            preferred_element_type=jnp.float32)           # (tile, nq)
    row = jax.lax.broadcasted_iota(jnp.int32, (nt, nq), 0) + t * tile_rows
    scores = jnp.where(row < n_total, scores, -jnp.inf)
    fmax_ref[...] = scores.reshape(nt // block, block, nq).max(axis=1)


@functools.partial(jax.jit, static_argnames=("n_valid", "tile_rows",
                                             "block", "interpret",
                                             "groups"))
def _adc_finemax_pallas(luts_flat_t, codes_pad, n_valid: int,
                        tile_rows: int, block: int, interpret: bool,
                        groups: int = 1):
    """(NB, nq) fine-block ADC maxima. ``luts_flat_t`` is (m*ksub, nq) in
    the compute dtype; ``codes_pad`` rows must be a ``tile_rows``
    multiple. VMEM per tile: codes (tile*m B) + one-hot
    (tile*(m*ksub/groups)*2 B bf16, per slice) + scores (tile*nq*4 B) —
    tile 1024 at m=32/ksub=16/nq=256/groups=1 is ~2.3 MB, well under the
    16 MB scope; large-ksub callers pass ``groups`` so each slice stays
    small (see :func:`_pallas_geometry`)."""
    mk, nq = luts_flat_t.shape
    m = codes_pad.shape[1]
    ksub = mk // m
    assert mk % groups == 0 and (mk // groups) % ksub == 0, \
        "groups must split the flat id axis on subspace boundaries"
    tiles = codes_pad.shape[0] // tile_rows
    fpt = tile_rows // block
    expand = jnp.repeat(jnp.eye(m, dtype=jnp.bfloat16), ksub, axis=1)
    return pl.pallas_call(
        functools.partial(_adc_finemax_kernel, n_total=n_valid,
                          tile_rows=tile_rows, block=block, ksub=ksub,
                          groups=groups),
        grid=(tiles,),
        in_specs=[
            pl.BlockSpec((mk, nq), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, m), lambda t: (t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m, mk), lambda t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((fpt, nq), lambda t: (t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tiles * fpt, nq), jnp.float32),
        interpret=interpret,
    )(luts_flat_t, codes_pad, expand)


def pq_topk(luts, codes, k: int, *, chunk: int = 131072,
            block: int = _BLOCK, compute_dtype=None,
            use_pallas: Optional[bool] = None,
            n_valid: Optional[int] = None
            ) -> Tuple[jax.Array, jax.Array]:
    """Streaming ADC top-k: (values, indices) of the best ``k`` rows per
    query; ``-inf``/-1 pad past the corpus when k > N.

    Corpora small enough for one dense top_k take the direct path;
    otherwise the fine-max hierarchy streams row chunks under one
    ``lax.scan`` (peak memory O(nq * chunk) scores + the (N, m) codes —
    never the (nq, N) matrix) and only k*``block`` candidate rows are
    ever rescored. ``compute_dtype=jnp.bfloat16`` runs the contraction
    ~3x faster on the TPU MXU at ~0.4% score noise (:func:`_adc_modes`).

    ``n_valid``: pass the true row count when ``codes`` is already padded
    with junk rows past it (:func:`pq_pad_codes`). Skips the per-call pad
    concatenation — which outside jit is an extra eager dispatch AND a
    transient full copy of the codes (3+ GB at capacity scale); padded
    rows never appear in results.
    """
    codes = jnp.asarray(codes)
    n = codes.shape[0] if n_valid is None else int(n_valid)
    assert n <= codes.shape[0], (n, codes.shape)
    dt_name = jnp.dtype(_adc_modes(compute_dtype)[0]).name
    if block == _BLOCK and luts.shape[1] * luts.shape[2] > 1024:
        # large-ksub phase C: the candidate rescore builds k*block*m*ksub
        # one-hot elements per query — at m=32/ksub=256 the default
        # 64-row block costs ~63 ms/batch on v5e where phase A is 33
        # (PERF_NOTES r5). 8-row fine blocks cut that 8x; the selection
        # pyramid absorbs the 8x-wider fmax (the dense tier descends N/8
        # on every call) and the fp32 exact-id bound still clears 100M
        # rows (N/8 < 2^24).
        block = 8
    if n <= max(4096, 2 * k * block):   # hierarchy can't pay for itself
        pad = (-codes.shape[0]) % 256
        codes_pad = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)]) \
            if pad else codes
        vals, idxs = _pq_topk_dense(luts, codes_pad, jnp.int32(n),
                                    min(k, n), dt_name)
        if idxs.shape[1] < k:           # pad to the requested k
            short = k - idxs.shape[1]
            vals = jnp.pad(vals, ((0, 0), (0, short)),
                           constant_values=-jnp.inf)
            idxs = jnp.pad(idxs, ((0, 0), (0, short)), constant_values=-1)
        return vals, idxs
    chunk = max(block, (min(chunk, codes.shape[0]) // block) * block)
    pad = (-codes.shape[0]) % chunk
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)])
    # block ids ride fp32 one-hot dots in selection (_select_exact):
    # exact only below 2^24 — past that the ids would silently round
    assert codes.shape[0] // block < (1 << 24), (
        f"N/block = {codes.shape[0] // block} exceeds fp32's exact-int "
        f"range; raise block (>= {codes.shape[0] // ((1 << 24) - 1) + 1})")
    mk = luts.shape[1] * luts.shape[2]
    if use_pallas is None:   # auto: real TPU (any ksub: past mk=1024
        # the grouped kernel slices the one-hot, _pallas_geometry)
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        phase_a = "pallas" if jax.default_backend() == "tpu" \
            else "interpret"
        return _pq_topk_hier(luts, codes, jnp.int32(n), k, chunk, block,
                             dt_name, phase_a=phase_a, n_static=n)
    return _pq_topk_hier(luts, codes, jnp.int32(n), k, chunk, block,
                         dt_name)


def pq_pad_codes(codes, *, chunk: int = 131072
                 ) -> Tuple[jax.Array, int]:
    """Pad (N, m) codes once to :func:`pq_topk`'s streaming geometry.

    Returns ``(codes_padded, n_valid)`` for ``pq_topk(..., n_valid=)``.
    Serving indexes store the padded array so no search ever re-pads —
    per call that concat is an extra eager dispatch and a transient full
    copy of the codes in HBM (33 MB at 1M rows, 3+ GB at capacity
    scale). Large corpora pad to the scan ``chunk`` (at most ~4 MB of
    junk rows); small ones to the dense path's 256 (the scan geometry
    recomputes from the padded shape, so a 256-multiple stays legal for
    the hierarchy too)."""
    codes = jnp.asarray(codes)
    n = codes.shape[0]
    pad = (-n) % (chunk if n > 32768 else 256)
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, codes.shape[1]), codes.dtype)])
    return codes, n


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
        # all fp32 matmuls here at HIGHEST: default-precision inputs get
        # bf16-truncated on TPU, so R drifts from orthogonal and the
        # codebooks train on noised data (CLAUDE.md)
        xr = jnp.matmul(x, r, precision=_HIGHEST)
        codebooks = train_pq(xr, m, ksub, iters=max(4, iters // 4),
                             seed=seed, sample=None, chunk=chunk,
                             init=codebooks)
        rec = reconstruct_pq(encode_pq(xr, codebooks), codebooks)
        # orthogonal Procrustes: argmin_R ||x R - rec||_F
        u, _, vt = jnp.linalg.svd(
            jnp.matmul(x.T, rec, precision=_HIGHEST), full_matrices=False)
        r = jnp.matmul(u, vt, precision=_HIGHEST)
    codebooks = train_pq(jnp.matmul(x, r, precision=_HIGHEST), m, ksub,
                         iters=iters, seed=seed, sample=None, chunk=chunk,
                         init=codebooks)
    return r, codebooks
