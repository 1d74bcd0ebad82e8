"""Serving: an HBM-resident retrieval index.

The production-facing API on top of the ranking kernels — beyond the
reference's CLI-only surface, this is what "switching from dirtorch" looks
like for a deployed system:

* descriptors live on device (optionally bf16 — halves HBM, fp32 MXU
  accumulation keeps ranking order), either on one chip or row-sharded over
  a mesh's "db" axis for million-image corpora;
* ``search`` runs the fused similarity+top-k Pallas kernel (single chip) or
  the shard_map kernel + ICI candidate merge (mesh);
* optional on-device alpha-query-expansion before the final ranking;
* ``save``/``load`` round-trip the index through one .npz.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.binary import (BinaryCodec, binarize, binarize_and_project,
                         fit_itq)
from .ops.ivf import (IVFArrays, bin_ivf, build_ivf, ivf_assign, ivf_topk,
                      unbin_ivf)
from .ops.pq import (encode_pq, pq_lookup, pq_pad_codes, pq_topk,
                     reconstruct_pq, train_opq, train_pq)
from .ops.qe import expand_queries_chunked
from .ops.topk_pallas import quantize_db, rank_topk_fused

__all__ = ["RetrievalIndex", "BinaryIndex", "PQIndex", "IVFPQIndex"]


#: query-count buckets shared by every index class: under jit each distinct
#: nq is a fresh compile (minutes on a cold cache), so search pads the batch
#: up to the next bucket with zero queries and slices the answer back down
NQ_BUCKETS = (1, 4, 8, 16, 32, 64, 128, 256)


def _nq_bucket(nq: int) -> int:
    """Pad target for an ``nq``-row query batch: the ladder up to 256, then
    256-row rungs — so ANY batch size maps into a bounded, warmable set of
    compiled shapes (a server running ``max_batch > 256`` would otherwise
    hit arbitrary raw sizes on live traffic; ``DynamicBatcher.warmup``
    mirrors this rule)."""
    for b in NQ_BUCKETS:
        if b >= nq:
            return b
    return -(-nq // 256) * 256


def _rotate_rows(x, r):
    """OPQ rotation at HIGHEST precision: default fp32 matmuls get
    bf16-truncated on TPU (CLAUDE.md) and the noise lands directly in
    the ADC lookup tables / stored codes."""
    return jnp.matmul(x, r, precision=jax.lax.Precision.HIGHEST)


@jax.jit
def _pack_vi(vals, idxs):
    """(vals, idxs) -> one (2, nq, k) f32 array (indices bitcast).

    Each host pull is a blocking round trip (~36 ms fixed through the
    dev tunnel regardless of size — PERF_NOTES "Index server"), so the
    serving paths pull results in ONE transfer instead of two. The pack
    itself is an async device dispatch that pipelines behind the search.
    bf16 score values widen to f32 losslessly."""
    return jnp.stack([vals.astype(jnp.float32),
                      jax.lax.bitcast_convert_type(idxs.astype(jnp.int32),
                                                   jnp.float32)])


def _pull_vi(vals, idxs) -> Tuple[np.ndarray, np.ndarray]:
    """Single-transfer host pull of a search result pair."""
    p = np.asarray(_pack_vi(vals, idxs))
    return p[0], p[1].view(np.int32)


def _adc_body(q, rotation, codebooks, codes, k, n_valid, dt):
    if rotation is not None:
        q = _rotate_rows(q, rotation)
    luts = pq_lookup(q, codebooks)
    cdt = None if dt == "float32" else jnp.dtype(dt).type
    return pq_topk(luts, codes, k, compute_dtype=cdt, n_valid=n_valid)


@functools.partial(jax.jit, static_argnames=("k", "n_valid", "dt"))
def _fused_adc_topk(q, rotation, codebooks, codes, *, k: int,
                    n_valid: int, dt: str):
    """ONE device dispatch for rotate -> LUT build -> streaming ADC
    top-k. Eagerly these are 3-4 separate dispatches plus a per-call
    codes pad-concat (a transient full copy of the code array in HBM);
    through the dev tunnel each eager dispatch adds ~30 ms of round-trip
    latency (PERF_NOTES "Index server"), and even on production PCIe
    every dispatch is host work on the serving path. ``codes`` must be
    pre-padded (:func:`dirjax.ops.pq_pad_codes`)."""
    return _adc_body(q, rotation, codebooks, codes, k, n_valid, dt)


@functools.partial(jax.jit, static_argnames=("k", "nprobe", "dt"))
def _fused_ivf_topk(q, rotation, codebooks, ivf, *, k: int, nprobe: int,
                    dt: str):
    """One dispatch for rotate -> residual LUTs -> IVF probe + ADC top-k
    (same rationale as :func:`_fused_adc_topk`). ``ivf`` is the
    :class:`dirjax.ops.ivf.IVFArrays` NamedTuple (a jit-friendly pytree
    of device arrays)."""
    from .ops.ivf import ivf_topk

    qr = q if rotation is None else _rotate_rows(q, rotation)
    luts = pq_lookup(qr, codebooks)
    cdt = None if dt == "float32" else jnp.dtype(dt).type
    return ivf_topk(luts, qr, ivf, k, nprobe=nprobe, compute_dtype=cdt)


def _int8_rescore(q, rdb, rscales, idxs, k: int):
    """Exact int8 rescore of a candidate shortlist — the ONE body shared
    by every rerank path (fused PQ, IVF, PQIndex mesh). Gathers k
    candidate rows/query from HBM (the only row-level traffic) and
    scores the UNROTATED query against them (int8 rows live in the
    original descriptor space); invalid candidates (-1 past a tiny
    corpus) mask to -inf."""
    safe = jnp.maximum(idxs, 0)
    rows = jnp.take(rdb, safe, axis=0).astype(jnp.float32)
    rows = rows * jnp.take(rscales.reshape(-1), safe)[:, :, None]
    scores = jnp.einsum("qd,qkd->qk", q, rows,
                        precision=jax.lax.Precision.HIGHEST,
                        preferred_element_type=jnp.float32)
    scores = jnp.where(idxs >= 0, scores, -jnp.inf)
    kk = min(k, scores.shape[1])
    vals, pos = jax.lax.top_k(scores, kk)
    return vals, jnp.take_along_axis(idxs, pos, axis=1)


@functools.partial(jax.jit, static_argnames=("k",))
def _fused_int8_rerank(q, rdb, rscales, idxs, *, k: int):
    """:func:`_int8_rescore` as its own dispatch (used where the
    candidates come from a separately-jitted stage)."""
    return _int8_rescore(q, rdb, rscales, idxs, k)


@functools.partial(jax.jit, static_argnames=("base", "k", "n_valid", "dt"))
def _fused_adc_rerank(q, rotation, codebooks, codes, rdb, rscales, *,
                      base: int, k: int, n_valid: int, dt: str):
    """:func:`_fused_adc_topk` plus the exact int8 rescore of the top
    ``base`` ADC candidates, still one dispatch."""
    _, idxs = _adc_body(q, rotation, codebooks, codes, base, n_valid, dt)
    return _int8_rescore(q, rdb, rscales, idxs, k)


class _Tombstones:
    """Deletion support shared by every index class.

    ``remove()`` tombstones rows in a host-side boolean mask; searches
    stay EXACT by over-fetching ``k + pad`` candidates from the device
    kernels (``pad`` = the tombstone count rounded up to 64 so the set of
    compiled top-k widths stays small) and dropping tombstoned hits in a
    tiny (nq, k+pad) filter pass. Memory is reclaimed only by
    :meth:`compact`, which renumbers indices — an explicit, separate step
    because callers may hold previously returned indices.

    The mask lives on the host (one bool per row) — and so does the
    filter: the candidate matrix is a tiny (nq, k+pad) host array on its
    way out of ``search`` anyway, and a device-side filter would cost a
    host->device re-upload plus eager dispatches through the tunnel
    (~8 MB/s, ~3-5 ms each; CLAUDE.md). The mask persists through
    ``save``/``load`` (packed bits).

    Alpha-query-expansion is tombstone-exact too: expansion paths
    over-fetch their neighbor top-k by the same pad and filter against a
    lazily-cached DEVICE copy of the mask (:meth:`_tomb_mask_device`)
    before the weighted sum, so removed rows can neither be returned nor
    steer expanded queries (was a documented caveat through r4)."""

    _removed = None            # np.bool_ (n,) — None until first remove()
    _n_removed = 0             # cached count: searches must stay O(1) here
    _removed_dev = None        # lazy device copy for the AQE filter

    @property
    def n_removed(self) -> int:
        return self._n_removed

    def lookup(self, indices) -> list:
        """Map result indices back to image keys. ``-1`` sentinels (the
        padding :meth:`_tomb_filter` emits when fewer than ``k`` live
        rows survive the candidate set) map to ``None``, never to a real
        key."""
        assert self.keys is not None, "index was built without keys"
        return [[None if j < 0 else self.keys[j] for j in row]
                for row in np.asarray(indices)]

    def remove(self, keys: Optional[Sequence[str]] = None,
               indices=None) -> int:
        """Tombstone rows by key (keyed indexes) or by row index. Returns
        how many rows were newly removed (already-removed rows and
        duplicates count zero). O(n) per call — batch removals."""
        if (keys is None) == (indices is None):
            raise ValueError("pass exactly one of keys= / indices=")
        if keys is not None:
            if self.keys is None:
                raise ValueError("index carries no keys; use indices=")
            pos = {k: i for i, k in enumerate(self.keys)}
            missing = [k for k in keys if k not in pos]
            if missing:
                raise KeyError(f"keys not in index: {missing[:5]}")
            indices = [pos[k] for k in keys]
        idx = np.unique(np.asarray(indices, np.int64).reshape(-1))
        if idx.size == 0:
            return 0
        if idx[0] < 0 or idx[-1] >= self.n:
            raise IndexError(f"row index out of range [0, {self.n})")
        if self._removed is None:
            self._removed = np.zeros(self.n, bool)
        newly = int(np.count_nonzero(~self._removed[idx]))
        self._removed[idx] = True
        self._n_removed += newly
        self._removed_dev = None     # device copy is stale
        return newly

    def _tomb_pad(self) -> int:
        return ((self.n_removed + 63) // 64) * 64

    def _tomb_mask_device(self):
        """Device copy of the tombstone mask, for filtering EXPANSION
        neighbors on device (AQE). Lazy and cached — uploaded once per
        mutation, n bools (1 MB per 1M rows), not per search."""
        if self._removed_dev is None:
            self._removed_dev = jnp.asarray(self._removed)
        return self._removed_dev

    def _tomb_aqe_kwargs(self) -> dict:
        """``exclude_mask``/``exclude_pad`` kwargs for the expansion ops
        (:func:`dirjax.ops.qe._drop_excluded` over-fetch rule); empty when
        nothing is tombstoned."""
        if not self.n_removed:
            return {}
        return {"exclude_mask": self._tomb_mask_device(),
                "exclude_pad": self._tomb_pad()}

    def _tomb_filter(self, vals, idxs, k: int):
        """Exact post-kernel filter on the HOST: tombstoned (and
        padding) hits to -inf, re-select k. The candidates are a tiny
        (nq, k+pad) matrix already headed for the host, and the mask
        lives there. Scores come back fp32."""
        vals = np.array(np.asarray(vals), np.float32, copy=True)
        idxs = np.asarray(idxs)
        bad = (idxs < 0) | self._removed[np.maximum(idxs, 0)]
        vals[bad] = -np.inf
        kk = min(k, vals.shape[1])
        sel = np.argsort(-vals, axis=1, kind="stable")[:, :kk]
        v2 = np.take_along_axis(vals, sel, axis=1)
        i2 = np.take_along_axis(idxs, sel, axis=1)
        return v2, np.where(v2 > -np.inf, i2, -1)

    def _tomb_extend(self, n_new: int) -> None:
        if self._removed is not None:
            self._removed = np.concatenate(
                [self._removed, np.zeros(n_new, bool)])
            self._removed_dev = None

    def _tomb_save(self, arrays: dict) -> None:
        if self.n_removed:
            arrays["removed_mask"] = np.packbits(self._removed)

    def _tomb_restore(self, mask) -> None:
        self._removed = mask
        self._removed_dev = None
        self._n_removed = 0 if mask is None else int(mask.sum())

    @staticmethod
    def _tomb_unpack(data, n: int):
        if "removed_mask" not in data:
            return None
        return np.unpackbits(data["removed_mask"], count=n).astype(bool)

    def compact(self) -> np.ndarray:
        """Physically drop tombstoned rows and renumber. Returns an
        (n_old,) int64 map old index -> new index (-1 for removed rows)
        so callers can translate indices they saved before the compact."""
        if self.n_removed == 0:
            return np.arange(self.n, dtype=np.int64)
        keep_idx = np.where(~self._removed)[0]
        mapping = np.full(self.n, -1, np.int64)
        mapping[keep_idx] = np.arange(keep_idx.size)
        self._compact_rows(keep_idx)
        if self.keys is not None:
            self.keys = [self.keys[i] for i in keep_idx]
        self.n = int(keep_idx.size)
        self._removed = None
        self._removed_dev = None
        self._n_removed = 0
        return mapping


class RetrievalIndex(_Tombstones):
    """Dot-product top-k search over a fixed descriptor database.

    ``dtype=jnp.int8`` stores the database 8-bit quantized (per-row scales,
    :func:`dirjax.ops.topk_pallas.quantize_db`): half the HBM of bf16 —
    twice the corpus per chip and twice the streaming-QPS ceiling — at
    ~8-bit ranking noise. Composes with ``mesh=`` (rows + scales sharded
    over the "db" axis) for multi-chip corpora.
    """

    def __init__(self, descriptors, keys: Optional[Sequence[str]] = None,
                 mesh=None, dtype=jnp.float32):
        if not isinstance(descriptors, jax.Array):
            # device arrays pass straight through: descriptors fresh out of
            # (sharded) extraction must not round-trip through the host
            # (the dev tunnel moves ~8 MB/s — CLAUDE.md)
            descriptors = np.asarray(descriptors)
        assert descriptors.ndim == 2, "descriptors must be (N, D)"
        self.n = descriptors.shape[0]
        self.dim = descriptors.shape[1]
        self.keys = list(keys) if keys is not None else None
        if self.keys is not None:
            assert len(self.keys) == self.n
        self.mesh = mesh
        self.dtype = dtype
        self._scales = None
        if dtype == jnp.int8 and mesh is None:
            self._db, self._scales = quantize_db(descriptors)
        elif dtype == jnp.int8:
            from .parallel.ranking import shard_database_quantized

            self._db, self._scales, self._n_valid = shard_database_quantized(
                jnp.asarray(descriptors), mesh)
        elif mesh is None:
            self._db = jnp.asarray(descriptors, dtype)
        else:
            from .parallel.ranking import shard_database

            self._db, self._n_valid = shard_database(
                jnp.asarray(descriptors, dtype), mesh)

    #: see module-level NQ_BUCKETS / _nq_bucket (shared by every class)
    NQ_BUCKETS = NQ_BUCKETS

    # --- search ---------------------------------------------------------
    def search(self, queries, k: int = 10, *, aqe: Optional[dict] = None,
               int8_queries: bool = False) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, indices) per query row. ``aqe={'k':, 'alpha':}``
        expands queries against the index first (test_dir.py:24-44
        semantics).

        ``int8_queries=True`` (int8 indexes): quantize the (possibly
        AQE-expanded) queries per-row to int8 so the ranking contraction
        runs on the int8 MXU — the fastest serving mode, at ~8-bit extra
        noise on the query side."""
        if int8_queries and self._scales is None:
            raise ValueError("int8_queries requires an int8 index "
                             "(RetrievalIndex(dtype=jnp.int8))")
        # int8_queries is threaded through as a PARAMETER: stashing it on
        # self raced under the DynamicBatcher's concurrent dispatch
        # workers (pipeline>1) — one request could run in the other's
        # quantization mode
        q = np.asarray(queries)
        if q.ndim == 1:
            q = q[None, :]  # single query convenience
        assert q.shape[1] == self.dim, \
            f"query dim {q.shape[1]} != index dim {self.dim}"
        nq = len(q)
        bucket = _nq_bucket(nq)
        if bucket != nq:
            q = np.concatenate(
                [q, np.zeros((bucket - nq, self.dim), q.dtype)])
        if self.n_removed:
            if k > self.n:   # same contract as the clean kernel path
                raise ValueError(
                    f"k={k} exceeds the {self.n} database rows")
            vals, idxs = self._search_padded(
                q, min(k + self._tomb_pad(), self.n), aqe,
                bool(int8_queries))
            vals, idxs = self._tomb_filter(vals, idxs, k)
            return np.asarray(vals)[:nq], np.asarray(idxs)[:nq]
        vals, idxs = self._search_padded(q, k, aqe, bool(int8_queries))
        return vals[:nq], idxs[:nq]

    def _search_padded(self, q, k: int, aqe: Optional[dict],
                       int8_queries: bool = False
                       ) -> Tuple[np.ndarray, np.ndarray]:
        if self.mesh is None:
            if self._scales is not None:  # int8, single chip
                q = jnp.asarray(q, jnp.float32)
                if aqe:
                    from .ops.qe import expand_queries_quantized

                    q = expand_queries_quantized(q, self._db, self._scales,
                                                 alpha=aqe["alpha"],
                                                 k=aqe["k"],
                                                 **self._tomb_aqe_kwargs())
                vals, idxs = rank_topk_fused(
                    q, self._db, k, db_scales=self._scales,
                    quantize_queries=int8_queries)
                return _pull_vi(vals, idxs)
            q = jnp.asarray(q, self.dtype)
            if aqe:
                # chunked: never materializes the (Nq, Nd) similarity matrix
                q = expand_queries_chunked(
                    q, self._db, alpha=aqe["alpha"], k=aqe["k"],
                    **self._tomb_aqe_kwargs()).astype(self.dtype)
            vals, idxs = rank_topk_fused(q, self._db, k)
            return _pull_vi(vals, idxs)

        from .parallel.ranking import sharded_aqe, sharded_topk

        q = jnp.asarray(q, jnp.float32)
        if aqe:
            q = sharded_aqe(q, self._db, self.mesh, self._n_valid,
                            alpha=aqe["alpha"], k=aqe["k"],
                            db_scales=self._scales,
                            **self._tomb_aqe_kwargs())
        if self._scales is None:
            q = q.astype(self.dtype)
        vals, idxs = sharded_topk(
            q, self._db, k, self.mesh, self._n_valid,
            db_scales=self._scales,
            quantize_queries=(self._scales is not None and int8_queries))
        return _pull_vi(vals, idxs)

    def add(self, descriptors, keys: Optional[Sequence[str]] = None) -> None:
        """Append rows to the index (keys too if the index carries keys).

        Index growth changes the database shape, so the next ``search``
        per (nq, k) recompiles — batch additions rather than inserting one
        row at a time. int8 indexes quantize the new rows with their own
        per-row scales (existing rows are untouched); mesh-sharded indexes
        re-shard, which moves the whole database once per add."""
        new = np.asarray(descriptors)
        assert new.ndim == 2 and new.shape[1] == self.dim, new.shape
        if self.keys is not None:
            assert keys is not None and len(keys) == len(new), \
                "index carries keys: add() needs one key per new row"
        if self.mesh is None and self._scales is not None:   # int8, 1 chip
            q8, s8 = quantize_db(new)
            self._db = jnp.concatenate([self._db, q8])
            self._scales = jnp.concatenate([self._scales, s8], axis=1)
        elif self.mesh is None:
            self._db = jnp.concatenate(
                [self._db, jnp.asarray(new, self.dtype)])
        else:
            self._reshard(np.concatenate([self._host_rows(), new]))
        # extend keys only after the database swap succeeded, so a failed
        # concat/device_put (e.g. OOM mid-add) can't leave keys/db skewed
        if self.keys is not None:
            self.keys.extend(keys)
        self._tomb_extend(len(new))
        self.n += len(new)

    def _compact_rows(self, keep_idx: np.ndarray) -> None:
        if self.mesh is None:
            gather = jnp.asarray(keep_idx)
            self._db = jnp.take(self._db, gather, axis=0)
            if self._scales is not None:
                self._scales = jnp.take(self._scales, gather, axis=1)
            return
        self._reshard(self._host_rows()[keep_idx])

    def _host_rows(self) -> np.ndarray:
        """Mesh path: pull the valid rows to the host, dequantized for
        int8 indexes (one full round trip — add()/compact() document
        the cost)."""
        if self._scales is None:
            return np.asarray(self._db[: self.n])
        return np.asarray(self._db[: self.n], np.float32) \
            * np.asarray(self._scales).T[: self.n]

    def _reshard(self, rows: np.ndarray) -> None:
        if self._scales is None:
            from .parallel.ranking import shard_database

            self._db, self._n_valid = shard_database(
                jnp.asarray(rows, self.dtype), self.mesh)
        else:
            from .parallel.ranking import shard_database_quantized

            self._db, self._scales, self._n_valid = \
                shard_database_quantized(jnp.asarray(rows, jnp.float32),
                                         self.mesh)

    # --- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        """int8 indexes persist quantized (rows + per-row scales: 4x
        smaller than fp32 and reload without re-quantizing); other dtypes
        persist fp32. Tombstones persist as packed bits."""
        arrays = {}
        self._tomb_save(arrays)
        if self._scales is not None:
            arrays["descriptors_i8"] = np.asarray(self._db[: self.n])
            arrays["scales"] = np.asarray(self._scales)[:, : self.n]
        else:
            arrays["descriptors"] = np.asarray(
                self._db[: self.n]).astype(np.float32)
        if self.keys is not None:
            arrays["keys"] = np.asarray(self.keys)
        with open(path, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, path: str, mesh=None, dtype=None):
        """``dtype=None`` keeps the stored representation (int8 archives
        reload as int8 without a quantization pass; fp32 archives as fp32).
        PQ/IVF archives (:meth:`PQIndex.save` / :meth:`IVFPQIndex.save`)
        dispatch to their own loaders, so one loader opens any dirjax
        index file."""
        with np.load(path, allow_pickle=False) as probe:
            if "ivf_codes" in probe:
                return IVFPQIndex.load(path)
            if "pq_codes" in probe:
                return PQIndex.load(path, mesh=mesh)
            if "binary_codes" in probe:
                return BinaryIndex.load(path, mesh=mesh)
        with np.load(path, allow_pickle=False) as data:
            keys = [str(k) for k in data["keys"]] if "keys" in data else None
            if "descriptors_i8" in data:
                removed = cls._tomb_unpack(data,
                                           len(data["descriptors_i8"]))
                if dtype not in (None, jnp.int8):
                    # caller wants a float index back: dequantize
                    descs = data["descriptors_i8"].astype(np.float32) \
                        * data["scales"].T
                    idx = cls(descs, keys=keys, mesh=mesh, dtype=dtype)
                    idx._tomb_restore(removed)
                    return idx
                idx = cls.__new__(cls)
                db_i8 = data["descriptors_i8"]
                scales = data["scales"]
                idx.n, idx.dim = db_i8.shape
                idx.keys = keys
                idx.mesh = mesh
                idx.dtype = jnp.int8
                idx._tomb_restore(removed)
                if mesh is None:
                    idx._db = jnp.asarray(db_i8)
                    idx._scales = jnp.asarray(scales)
                else:
                    from .parallel.ranking import shard_database_quantized

                    # re-shard the stored quantization (scales preserved)
                    deq = db_i8.astype(np.float32) * scales.T
                    idx._db, idx._scales, idx._n_valid = \
                        shard_database_quantized(jnp.asarray(deq), mesh)
                return idx
            descs = data["descriptors"]
            removed = cls._tomb_unpack(data, len(descs))
        idx = cls(descs, keys=keys, mesh=mesh,
                  dtype=jnp.float32 if dtype is None else dtype)
        idx._tomb_restore(removed)
        return idx


class BinaryIndex(_Tombstones):
    """ITQ binary-hash index: ``n_bits/8`` bytes per row.

    The capacity point between PQ (32 B/row) and int8 (2 KB/row at
    2048-D): 2048-bit sign codes are 256 B/row — 8x the int8 corpus per
    chip — with far higher per-row fidelity than 32-B PQ codes.
    Single-chip searches run as ONE fused dispatch
    (:func:`dirjax.ops.binary.hamming_search_fused`). ``asym=False``
    ranks by packed Hamming distance (MXU unpack-matmul kernel on TPU,
    popcount scan elsewhere). ``asym=True`` (default) ranks by the EXACT
    asymmetric score — continuous projected query against ±1 codes,
    selected directly by an asymmetric phase 1 (r5) — which recovers
    most of the query-side quantization loss without storing any float
    rows and without the r4 design's symmetric shortlist (whose
    ``rerank_factor * k`` rescore could miss rows and cost 10 ms/batch
    of selection at k=100 — PERF_NOTES).

    The codec is learned from the indexed corpus (ITQ: PCA + an iterative
    orthogonal rotation that balances bit variance,
    :func:`dirjax.ops.binary.fit_itq`); ``itq_iters=0`` gives plain PCA
    sign hashing. ``mesh=``: codes row-sharded over the mesh's "db" axis
    (:func:`dirjax.parallel.ranking.sharded_hamming_topk` — per-shard
    Hamming + asym rescore, O(devices*k) candidate merge). No reference
    counterpart (dirtorch's ranking is one dense fp32 CPU matmul,
    ``utils/common.py:30-38``).
    """

    NQ_BUCKETS = RetrievalIndex.NQ_BUCKETS

    def __init__(self, descriptors, n_bits: Optional[int] = None,
                 keys: Optional[Sequence[str]] = None, *,
                 itq_iters: int = 30, asym: bool = True, seed: int = 0,
                 sample: Optional[int] = 131072, mesh=None, _codec=None):
        if not isinstance(descriptors, jnp.ndarray):   # keep device arrays
            descriptors = np.asarray(descriptors, np.float32)
        assert descriptors.ndim == 2, "descriptors must be (N, D)"
        self.n = int(descriptors.shape[0])
        self.dim = int(descriptors.shape[1])
        self.keys = list(keys) if keys is not None else None
        if self.keys is not None:
            assert len(self.keys) == self.n
        self.asym = bool(asym)
        self.mesh = mesh
        self.codec = _codec if _codec is not None else fit_itq(
            descriptors, n_bits, iters=itq_iters, seed=seed, sample=sample)
        self._set_codes(binarize(descriptors, self.codec))

    def _set_codes(self, codes) -> None:
        """Place packed codes. Single chip: the BYTE layout (same bytes per
        row as uint32 words — capacity unchanged), padded once to a
        multiple that serves both the popcount-scan path (32768-row
        chunks) and the MXU unpack-matmul kernel (1024-row tiles), so no
        search ever re-pads the corpus. Mesh: uint32 words row-sharded
        over the "db" axis (:func:`~dirjax.parallel.ranking.shard_codes_binary`)."""
        if self.mesh is None:
            from .ops.binary import _BITS_TILE, _pad_rows, _to_bytes

            b = _to_bytes(jnp.asarray(codes))
            self._codes = _pad_rows(
                b, 32768 if self.n >= 32768 else _BITS_TILE)
        else:
            from .parallel.ranking import shard_codes_binary

            self._codes, _ = shard_codes_binary(codes, self.mesh)

    n_bits = property(lambda self: self.codec.n_bits)

    # --- search ---------------------------------------------------------
    def search(self, queries, k: int = 10, *, rerank_factor: int = 4
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, indices) per query row. Symmetric scores are the
        ±1 dot product ``n_bits - 2*hamming``; asymmetric scores are the
        continuous projected dot product — both sort descending like every
        other index tier. Hamming distances tie often: exact *values*,
        tie-broken indices. ``rerank_factor`` sizes the per-shard
        asymmetric-rescore shortlist on MESH indexes; single-chip
        searches are exact under their score and ignore it (r5)."""
        q = np.asarray(queries)
        if q.dtype.name != "bfloat16":   # bf16 passes through: the server's
            q = q.astype(np.float32)     # upload_bf16 path halves the
        #                                  host->device query bytes
        if q.ndim == 1:
            q = q[None, :]
        assert q.shape[1] == self.dim, \
            f"query dim {q.shape[1]} != index dim {self.dim}"
        nq = len(q)
        bucket = _nq_bucket(nq)
        if bucket != nq:
            q = np.concatenate(
                [q, np.zeros((bucket - nq, self.dim), q.dtype)])
        if k > self.n:
            raise ValueError(f"k={k} exceeds the {self.n} database rows")
        pad = self._tomb_pad() if self.n_removed else 0
        if self.mesh is not None:
            qj = jnp.asarray(q)
            if self.asym:   # one dispatch + one shared centered matmul
                qp, vq = binarize_and_project(qj, self.codec)
            else:
                qp, vq = binarize(qj, self.codec), None
            from .parallel.ranking import sharded_hamming_topk

            vals, idxs = sharded_hamming_topk(
                qp, self._codes, min(k + pad, self.n), self.mesh, self.n,
                vq=vq, rerank_factor=rerank_factor)
        else:
            # ONE dispatch (r5): encode -> top-k. asym indexes rank by
            # the EXACT asymmetric score (no symmetric shortlist —
            # rerank_factor applies to the mesh path only); eagerly
            # staged this was 3-5 dispatches, each a tunnel round trip
            from .ops.binary import hamming_search_fused

            vals, idxs = hamming_search_fused(
                jnp.asarray(q), self.codec, self._codes,
                min(k + pad, self.n), n_valid=self.n, asym=self.asym)
        vals, idxs = _pull_vi(vals, idxs)   # ONE host transfer
        if pad:
            vals, idxs = self._tomb_filter(vals, idxs, k)
        return vals[:nq], idxs[:nq]

    # --- mutation ---------------------------------------------------------
    def add(self, descriptors, keys: Optional[Sequence[str]] = None) -> None:
        """Encode new rows with the EXISTING codec and append (growth
        changes shapes — recompile per new size — so batch additions)."""
        new = np.asarray(descriptors, np.float32)
        assert new.ndim == 2 and new.shape[1] == self.dim, new.shape
        if self.keys is not None:
            assert keys is not None and len(keys) == len(new), \
                "index carries keys: add() needs one key per new row"
        old = self._codes[: self.n]
        fresh = binarize(new, self.codec)
        if self.mesh is not None:   # gather before mixing shardings
            old = jnp.asarray(np.asarray(old))
        else:                       # single chip stores the byte layout
            from .ops.binary import _to_bytes

            fresh = _to_bytes(fresh)
        merged = jnp.concatenate([old, fresh])
        if self.keys is not None:
            self.keys.extend(keys)
        self._tomb_extend(len(new))
        self.n += len(new)
        self._set_codes(merged)

    def _compact_rows(self, keep_idx: np.ndarray) -> None:
        if self.mesh is None:
            kept = jnp.take(self._codes, jnp.asarray(keep_idx), axis=0)
        else:
            kept = jnp.asarray(
                np.take(np.asarray(self._codes), keep_idx, axis=0))
        self._set_codes(kept)

    # --- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        """One npz: packed uint32 codes + the codec (mean, projection).
        A 10M-image 2048-bit index saves in ~2.4 GB; codes reload without
        re-hashing."""
        codes = np.asarray(self._codes[: self.n])
        if codes.dtype == np.uint8:      # byte layout -> uint32 file format
            codes = np.ascontiguousarray(codes).view(np.uint32)
        arrays = {
            "binary_codes": codes,
            "binary_mean": np.asarray(self.codec.mean, np.float32),
            "binary_proj": np.asarray(self.codec.proj, np.float32),
            "binary_asym": np.asarray(int(self.asym)),
        }
        self._tomb_save(arrays)
        if self.keys is not None:
            arrays["keys"] = np.asarray(self.keys)
        with open(path, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, path: str, mesh=None) -> "BinaryIndex":
        with np.load(path, allow_pickle=False) as data:
            codes = data["binary_codes"]
            mean = data["binary_mean"]
            proj = data["binary_proj"]
            asym = bool(int(data["binary_asym"]))
            keys = [str(k) for k in data["keys"]] if "keys" in data else None
            removed = cls._tomb_unpack(data, len(codes))
        idx = cls.__new__(cls)
        idx._tomb_restore(removed)
        idx.n = len(codes)
        idx.dim = int(mean.shape[0])
        idx.keys = keys
        idx.asym = asym
        idx.mesh = mesh
        idx.codec = BinaryCodec(mean=jnp.asarray(mean),
                                proj=jnp.asarray(proj))
        idx._set_codes(jnp.asarray(codes))
        return idx


class PQIndex(_Tombstones):
    """Product-quantized retrieval index: ~100x the corpus per chip.

    Rows are stored as ``m`` uint8 codebook ids (16-32 bytes/image vs 2 KB
    int8 / 4 KB bf16 at 2048-D) and scored by ADC — a streaming one-hot
    contraction on the MXU (:func:`dirjax.ops.pq_topk`) that never
    materializes the score matrix. A 16 GB chip that holds ~2M int8 rows
    holds **hundreds of millions** of PQ codes. Compressed-domain search
    is beyond the reference toolbox entirely (its ranking is a dense fp32
    matmul, ``common.py:30-38``).

    Config (measured on v5e, 1M x 2048, nq=256, k=100, bf16 compute):

    * default ``m=32, ksub=16`` (32 B/row): **17.6k QPS** — matches the
      full-precision Pallas ranking kernel's throughput at 1/128 the
      bytes. 4-bit codebooks keep the one-hot ADC contraction tiny on
      the MXU.
    * classic ``m=16, ksub=256`` (16 B/row): 4.5k QPS — maximum
      compression, higher per-code fidelity; pick it when HBM bytes
      matter more than query rate.

    Options:

    * ``opq=True``: learn an orthogonal rotation first (OPQ) — spreads
      variance across subspaces; measurably better recall on
      PCA-whitened descriptors whose energy is front-loaded.
    * ``rerank=True``: additionally keep int8 rows (+per-row scales) and
      exactly rescore the top ``rerank_factor * k`` ADC candidates per
      query. Costs the int8 bytes (capacity drops back to int8 scale) but
      recovers near-exact ranking; leave off for pure-compressed serving.
    * ``mesh=``: codes row-sharded over the mesh's "db" axis
      (:func:`dirjax.parallel.ranking.sharded_pq_topk`).
    """

    NQ_BUCKETS = RetrievalIndex.NQ_BUCKETS

    #: ADC contraction dtype: None = exact fp32 (HIGHEST); set to
    #: jnp.bfloat16 for ~3x faster TPU serving at ~0.4% score noise
    compute_dtype = None

    def __init__(self, descriptors, m: int = 32, ksub: int = 16,
                 keys: Optional[Sequence[str]] = None, *, opq: bool = False,
                 rerank: bool = False, mesh=None, train_iters: int = 25,
                 seed: int = 0, sample: Optional[int] = 262144,
                 compute_dtype=None, _trained=None):
        self.compute_dtype = compute_dtype
        descriptors = np.asarray(descriptors, np.float32)
        assert descriptors.ndim == 2, "descriptors must be (N, D)"
        self.n, self.dim = descriptors.shape
        self.keys = list(keys) if keys is not None else None
        if self.keys is not None:
            assert len(self.keys) == self.n
        self.mesh = mesh
        if _trained is not None:               # load() path: reuse codebooks
            self.rotation, self.codebooks = _trained
        elif opq:
            self.rotation, self.codebooks = train_opq(
                descriptors, m, ksub, iters=train_iters, seed=seed,
                sample=None if sample is None else min(sample, 131072))
        else:
            self.rotation = None
            self.codebooks = train_pq(descriptors, m, ksub,
                                      iters=train_iters, seed=seed,
                                      sample=sample)
        codes = self._encode(descriptors)
        self._rerank_db = self._rerank_scales = None
        if rerank:
            self._rerank_db, self._rerank_scales = quantize_db(descriptors)
        if mesh is None:
            self._codes, _ = pq_pad_codes(codes)
        else:
            from .parallel.ranking import shard_codes

            self._codes, self._n_valid = shard_codes(codes, mesh)

    m = property(lambda self: int(self.codebooks.shape[0]))
    ksub = property(lambda self: int(self.codebooks.shape[1]))

    @property
    def _dt(self) -> str:
        return "float32" if self.compute_dtype is None \
            else jnp.dtype(self.compute_dtype).name

    @classmethod
    def from_codes(cls, codebooks, codes, *,
                   keys: Optional[Sequence[str]] = None, rotation=None,
                   mesh=None, compute_dtype=None) -> "PQIndex":
        """Build an index from PRE-ENCODED rows: ``codebooks`` (m, ksub,
        dim/m) from :func:`dirjax.ops.train_pq` and ``codes`` (n, m) uint8
        from :func:`dirjax.ops.encode_pq` — e.g. a corpus encoded on the
        extraction fleet, or codes loaded device-side. Skips training and
        never round-trips the corpus through the host. ``rerank`` storage
        is unavailable in this path (it needs the original rows — use
        ``add`` or the training constructor)."""
        self = cls.__new__(cls)
        self.compute_dtype = compute_dtype
        self.codebooks = jnp.asarray(codebooks, jnp.float32)
        self.rotation = None if rotation is None \
            else jnp.asarray(rotation, jnp.float32)
        m, _, dsub = self.codebooks.shape
        assert codes.ndim == 2 and codes.shape[1] == m, \
            f"codes must be (n, {m}), got {codes.shape}"
        self.n = int(codes.shape[0])
        self.dim = int(m * dsub)
        self.keys = list(keys) if keys is not None else None
        if self.keys is not None:
            assert len(self.keys) == self.n
        self.mesh = mesh
        self._rerank_db = self._rerank_scales = None
        if not isinstance(codes, jax.Array):
            codes = jnp.asarray(codes)
        if mesh is None:
            self._codes, _ = pq_pad_codes(codes)
        else:
            from .parallel.ranking import shard_codes

            self._codes, self._n_valid = shard_codes(codes, mesh)
        return self

    def _encode(self, rows):
        rows = jnp.asarray(rows, jnp.float32)
        if self.rotation is not None:
            rows = _rotate_rows(rows, self.rotation)
        return encode_pq(rows, self.codebooks)

    # --- search ---------------------------------------------------------
    def search(self, queries, k: int = 10, *, rerank_factor: int = 4,
               aqe: Optional[dict] = None) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, indices) per query row by ADC.

        With ``rerank=True`` indexes, the top ``rerank_factor * k`` ADC
        candidates are exactly rescored against the stored int8 rows.
        ``aqe={'k':, 'alpha':}`` expands queries against centroid
        RECONSTRUCTIONS of their ADC neighbors (test_dir.py:24-44
        semantics in the compressed domain)."""
        q = np.asarray(queries)
        if q.dtype.name != "bfloat16":   # bf16 passes through: the server's
            q = q.astype(np.float32)     # upload_bf16 path halves the
        #                                  host->device query bytes
        if q.ndim == 1:
            q = q[None, :]
        assert q.shape[1] == self.dim, \
            f"query dim {q.shape[1]} != index dim {self.dim}"
        nq = len(q)
        bucket = _nq_bucket(nq)
        if bucket != nq:
            q = np.concatenate(
                [q, np.zeros((bucket - nq, self.dim), q.dtype)])
        q = jnp.asarray(q)
        if aqe:
            q = self._expand_queries(q, k=aqe["k"], alpha=aqe["alpha"])
        pad = self._tomb_pad() if self.n_removed else 0
        base = max(k * rerank_factor, k) \
            if self._rerank_db is not None else k
        kk = min(base + pad, self.n)
        if self.mesh is None and self._rerank_db is not None:
            # one dispatch: ADC + candidate gather + exact int8 rescore
            vals, idxs = _fused_adc_rerank(
                q, self.rotation, self.codebooks, self._codes,
                self._rerank_db, self._rerank_scales,
                base=kk, k=k + pad, n_valid=self.n, dt=self._dt)
        else:
            vals, idxs = self._adc_topk(q, kk)
            if self._rerank_db is not None:
                vals, idxs = self._rerank(q, idxs, k + pad)
        vals, idxs = _pull_vi(vals, idxs)   # ONE host transfer
        if pad:
            vals, idxs = self._tomb_filter(vals, idxs, k)
        return vals[:nq], idxs[:nq]

    def _adc_topk(self, q, k: int):
        if self.mesh is None:   # one fused dispatch, pre-padded codes
            return _fused_adc_topk(q, self.rotation, self.codebooks,
                                   self._codes, k=k, n_valid=self.n,
                                   dt=self._dt)
        luts = pq_lookup(self._rotate(q), self.codebooks)
        from .parallel.ranking import sharded_pq_topk

        return sharded_pq_topk(luts, self._codes, k, self.mesh,
                               self._n_valid,
                               compute_dtype=self.compute_dtype)

    def _rotate(self, q):
        return q if self.rotation is None \
            else _rotate_rows(q, self.rotation)

    def _rerank(self, q, idxs, k: int):
        """Exact int8 rescore of the ADC candidate list (the mesh path's
        rerank stage — single-chip searches fuse :func:`_int8_rescore`
        into the ADC dispatch instead)."""
        return _fused_int8_rerank(q, self._rerank_db, self._rerank_scales,
                                  jnp.asarray(idxs), k=min(k, idxs.shape[1]))

    def _expand_queries(self, q, k: int, alpha: float):
        """AQE against reconstructed neighbors — no full-precision rows
        needed, so it works at pure-compressed capacity. Tombstoned rows
        are filtered out of the neighbor set (over-fetch + device-mask
        filter, the :class:`_Tombstones` AQE rule)."""
        k = min(int(k), self.n)
        pad = self._tomb_pad() if self.n_removed else 0
        vals, idxs = self._adc_topk(q, min(k + pad, self.n))
        if pad:
            from .ops.qe import _drop_excluded

            vals, idxs = _drop_excluded(vals, idxs,
                                        self._tomb_mask_device(), k)
        codes = self._codes if self.mesh is None else self._codes
        nb_codes = jnp.take(codes, jnp.maximum(idxs, 0), axis=0)
        nb = reconstruct_pq(nb_codes.reshape(-1, self.m),
                            self.codebooks).reshape(*idxs.shape, self.dim)
        if self.rotation is not None:     # reconstructions live rotated
            nb = _rotate_rows(nb, self.rotation.T)
        w = jnp.sign(vals) ** int(alpha) * jnp.power(jnp.abs(vals), alpha) \
            if float(alpha).is_integer() else jnp.power(vals, alpha)
        w = jnp.where(idxs >= 0, w, 0.0)
        expanded = (q + jnp.einsum("nk,nkd->nd", w, nb,
                                   precision=jax.lax.Precision.HIGHEST)) \
            / (k + 1.0)
        norm = jnp.linalg.norm(expanded, axis=1, keepdims=True)
        return expanded / jnp.maximum(norm, 1e-12)

    def add(self, descriptors, keys: Optional[Sequence[str]] = None) -> None:
        """Encode new rows with the EXISTING codebooks and append. Like
        :meth:`RetrievalIndex.add`, growth changes shapes (recompile per
        new size) — batch additions."""
        new = np.asarray(descriptors, np.float32)
        assert new.ndim == 2 and new.shape[1] == self.dim, new.shape
        if self.keys is not None:
            assert keys is not None and len(keys) == len(new), \
                "index carries keys: add() needs one key per new row"
        new_codes = self._encode(new)
        if self.mesh is None:
            codes, _ = pq_pad_codes(
                jnp.concatenate([self._codes[: self.n], new_codes]))
        else:
            from .parallel.ranking import shard_codes

            merged = np.concatenate(
                [np.asarray(self._codes[: self.n]), np.asarray(new_codes)])
            codes, self._n_valid = shard_codes(merged, self.mesh)
        if self._rerank_db is not None:
            r8, s8 = quantize_db(new)
            self._rerank_db = jnp.concatenate([self._rerank_db, r8])
            self._rerank_scales = jnp.concatenate(
                [self._rerank_scales, s8], axis=1)
        self._codes = codes
        if self.keys is not None:
            self.keys.extend(keys)
        self._tomb_extend(len(new))
        self.n += len(new)

    def _compact_rows(self, keep_idx: np.ndarray) -> None:
        gather = jnp.asarray(keep_idx)
        if self.mesh is None:
            self._codes, _ = pq_pad_codes(
                jnp.take(self._codes, gather, axis=0))
        else:
            from .parallel.ranking import shard_codes

            merged = np.asarray(self._codes[: self.n])[keep_idx]
            self._codes, self._n_valid = shard_codes(merged, self.mesh)
        if self._rerank_db is not None:
            self._rerank_db = jnp.take(self._rerank_db, gather, axis=0)
            self._rerank_scales = jnp.take(self._rerank_scales, gather,
                                           axis=1)

    # --- persistence ----------------------------------------------------
    def save(self, path: str) -> None:
        """One npz: codes + codebooks (+ rotation/rerank rows/keys).
        A 10M-image 2048-D index saves in ~160 MB at m=16."""
        arrays = {
            "pq_codes": np.asarray(self._codes[: self.n]),
            "pq_codebooks": np.asarray(self.codebooks),
        }
        self._tomb_save(arrays)
        if self.rotation is not None:
            arrays["pq_rotation"] = np.asarray(self.rotation)
        if self._rerank_db is not None:
            arrays["descriptors_i8"] = np.asarray(self._rerank_db[: self.n])
            arrays["scales"] = np.asarray(self._rerank_scales)[:, : self.n]
        if self.keys is not None:
            arrays["keys"] = np.asarray(self.keys)
        with open(path, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, path: str, mesh=None) -> "PQIndex":
        with np.load(path, allow_pickle=False) as data:
            codes = data["pq_codes"]
            codebooks = jnp.asarray(data["pq_codebooks"])
            rotation = jnp.asarray(data["pq_rotation"]) \
                if "pq_rotation" in data else None
            keys = [str(k) for k in data["keys"]] if "keys" in data else None
            rerank = ("descriptors_i8" in data)
            db_i8 = data["descriptors_i8"] if rerank else None
            scales = data["scales"] if rerank else None
            removed = cls._tomb_unpack(data, len(codes))
        idx = cls.__new__(cls)
        idx._tomb_restore(removed)
        idx.n, mm = codes.shape
        idx.dim = codebooks.shape[0] * codebooks.shape[2]
        assert mm == codebooks.shape[0]
        idx.keys = keys
        idx.mesh = mesh
        idx.rotation = rotation
        idx.codebooks = codebooks
        idx._rerank_db = jnp.asarray(db_i8) if rerank else None
        idx._rerank_scales = jnp.asarray(scales) if rerank else None
        if mesh is None:
            idx._codes, _ = pq_pad_codes(jnp.asarray(codes))
        else:
            from .parallel.ranking import shard_codes

            idx._codes, idx._n_valid = shard_codes(codes, mesh)
        return idx


class IVFPQIndex(_Tombstones):
    """Inverted-file PQ index: corpus-size-independent query latency.

    :class:`PQIndex` still *scans every code* — linear in corpus size. An
    inverted file (:mod:`dirjax.ops.ivf`) partitions rows into ``nlist``
    coarse cells and each query scores only its ``nprobe`` nearest cells'
    residual PQ codes (IVFADC): at 16M rows with a ~1% scan fraction the
    per-batch work is what a 200K-row flat scan costs. Approximation is
    two-layer — the PQ quantizer (same as :class:`PQIndex`) plus the
    probe's recall-vs-``nprobe`` trade; ``nprobe >= nvlist`` degrades to
    exact flat ADC over reconstructions.

    Options mirror :class:`PQIndex`: ``opq`` learns a rotation first,
    ``rerank`` keeps int8 rows for exact shortlist rescoring,
    ``compute_dtype=jnp.bfloat16`` for ~3x faster TPU ADC. Multi-chip
    serving goes through the ops layer (cell-sharded
    :func:`dirjax.parallel.ranking.shard_ivf` /
    :func:`~dirjax.parallel.ranking.sharded_ivf_topk`); this class stays
    single-chip — the point of IVF is that one chip serves the corpus.
    """

    NQ_BUCKETS = RetrievalIndex.NQ_BUCKETS
    compute_dtype = None
    _coding = None        # lazy unbin_ivf cache — see _row_coding()

    def __init__(self, descriptors, nlist: int, m: int = 32,
                 ksub: int = 16, *, nprobe: int = 8,
                 keys: Optional[Sequence[str]] = None, opq: bool = False,
                 rerank: bool = False, slab: int = 64,
                 cap: Optional[int] = None, train_iters: int = 25,
                 seed: int = 0, sample: Optional[int] = 262144,
                 compute_dtype=None, _loaded=None):
        self.compute_dtype = compute_dtype
        self.nprobe = nprobe
        if _loaded is not None:                # load() path
            (self.n, self.dim, self.keys, self.rotation, self.codebooks,
             self._centroids, self._ivf, self._rerank_db,
             self._rerank_scales) = _loaded
            return
        descriptors = np.asarray(descriptors, np.float32)
        assert descriptors.ndim == 2, "descriptors must be (N, D)"
        self.n, self.dim = descriptors.shape
        self.keys = list(keys) if keys is not None else None
        if self.keys is not None:
            assert len(self.keys) == self.n
        if opq:
            # OPQ supplies only the rotation here; the codebooks are
            # retrained on COARSE RESIDUALS inside build_ivf (rotated
            # space), which is what ADC actually quantizes
            self.rotation, _ = train_opq(
                descriptors, m, ksub, iters=max(4, train_iters // 2),
                seed=seed,
                sample=None if sample is None else min(sample, 131072))
        else:
            self.rotation = None
        xr = descriptors if self.rotation is None \
            else np.asarray(_rotate_rows(jnp.asarray(descriptors),
                                         self.rotation))
        self._ivf, self._centroids, self.codebooks = build_ivf(
            xr, nlist, m, ksub, slab=slab, cap=cap,
            pq_iters=train_iters, seed=seed, sample=sample)
        self._rerank_db = self._rerank_scales = None
        if rerank:
            self._rerank_db, self._rerank_scales = quantize_db(descriptors)

    m = property(lambda self: int(self.codebooks.shape[0]))
    ksub = property(lambda self: int(self.codebooks.shape[1]))
    nlist = property(lambda self: int(self._centroids.shape[0]))

    def _rotate(self, q):
        return q if self.rotation is None \
            else _rotate_rows(q, self.rotation)

    # --- search ---------------------------------------------------------
    def search(self, queries, k: int = 10, *, nprobe: Optional[int] = None,
               rerank_factor: int = 4, aqe: Optional[dict] = None
               ) -> Tuple[np.ndarray, np.ndarray]:
        """Top-k (scores, indices) over the probed cells. ``nprobe``
        overrides the index default per call (recall knob); scores are
        ``q . centroid + q . residual-reconstruction``.

        ``aqe={'k':, 'alpha':}`` expands queries against IVF
        RECONSTRUCTIONS (cell centroid + decoded residual) of their
        probed neighbors — the same test_dir.py:24-44 semantics
        :class:`PQIndex` applies in the compressed domain, probing the
        same ``nprobe`` cells as the main search."""
        q = np.asarray(queries)
        if q.dtype.name != "bfloat16":   # bf16 passes through: the server's
            q = q.astype(np.float32)     # upload_bf16 path halves the
        #                                  host->device query bytes
        if q.ndim == 1:
            q = q[None, :]
        assert q.shape[1] == self.dim, \
            f"query dim {q.shape[1]} != index dim {self.dim}"
        nq = len(q)
        bucket = _nq_bucket(nq)
        if bucket != nq:
            q = np.concatenate(
                [q, np.zeros((bucket - nq, self.dim), q.dtype)])
        q = jnp.asarray(q)
        nprobe = nprobe or self.nprobe
        if aqe:
            q = self._expand_queries(q, k=aqe["k"], alpha=aqe["alpha"],
                                     nprobe=nprobe)
        pad = self._tomb_pad() if self.n_removed else 0
        k_eff = (max(k * rerank_factor, k)
                 if self._rerank_db is not None else k) + pad
        dt = "float32" if self.compute_dtype is None \
            else jnp.dtype(self.compute_dtype).name
        # one dispatch: rotate -> residual LUTs -> probe + ADC top-k
        # (serving._fused_adc_topk rationale; PERF_NOTES "Index server")
        vals, idxs = _fused_ivf_topk(q, self.rotation, self.codebooks,
                                     self._ivf, k=min(k_eff, self.n),
                                     nprobe=int(nprobe), dt=dt)
        if self._rerank_db is not None:
            vals, idxs = _fused_int8_rerank(
                q, self._rerank_db, self._rerank_scales, idxs, k=k + pad)
        vals, idxs = _pull_vi(vals, idxs)   # ONE host transfer
        if pad:
            vals, idxs = self._tomb_filter(vals, idxs, k)
        return vals[:nq], idxs[:nq]

    def _row_coding(self) -> Tuple[np.ndarray, np.ndarray]:
        """Per-row (cell assignment, residual codes) in original row
        order — the inverse of the slab binning, cached on the host
        (same bytes as the codes themselves; built lazily on the first
        AQE call, dropped whenever the inverted file is rebuilt)."""
        if self._coding is None:
            self._coding = unbin_ivf(self._ivf, self.n)
        return self._coding

    def _expand_queries(self, q, k: int, alpha: float, nprobe: int):
        """AQE against IVF reconstructions: neighbor row i decodes to
        ``centroid[assign[i]] + decode(codes[i])`` in rotated space —
        exactly what the search scores rank by, so the top-k weights
        (``vals**alpha``) and the expansion vectors agree. Tombstoned
        rows are filtered out of the neighbor set (over-fetch +
        device-mask filter, the :class:`_Tombstones` AQE rule)."""
        k = min(int(k), self.n)
        pad = self._tomb_pad() if self.n_removed else 0
        qr = self._rotate(q)
        vals, idxs = ivf_topk(pq_lookup(qr, self.codebooks), qr, self._ivf,
                              min(k + pad, self.n), nprobe=nprobe,
                              compute_dtype=self.compute_dtype)
        if pad:
            from .ops.qe import _drop_excluded

            vals, idxs = _drop_excluded(vals, idxs,
                                        self._tomb_mask_device(), k)
        assign, codes = self._row_coding()
        safe = np.maximum(np.asarray(idxs), 0)          # (nq, k) host
        nb = reconstruct_pq(jnp.asarray(codes[safe.reshape(-1)]),
                            self.codebooks)
        nb = nb + jnp.take(jnp.asarray(self._centroids),
                           jnp.asarray(assign[safe.reshape(-1)]), axis=0)
        nb = nb.reshape(*safe.shape, self.dim)
        if self.rotation is not None:   # reconstructions live rotated
            nb = _rotate_rows(nb, self.rotation.T)
        w = jnp.sign(vals) ** int(alpha) * jnp.power(jnp.abs(vals), alpha) \
            if float(alpha).is_integer() else jnp.power(vals, alpha)
        w = jnp.where(idxs >= 0, w, 0.0)
        expanded = (q + jnp.einsum("nk,nkd->nd", w, nb,
                                   precision=jax.lax.Precision.HIGHEST)) \
            / (k + 1.0)
        norm = jnp.linalg.norm(expanded, axis=1, keepdims=True)
        return expanded / jnp.maximum(norm, 1e-12)

    def add(self, descriptors, keys: Optional[Sequence[str]] = None) -> None:
        """Assign + encode the new rows against the EXISTING coarse
        centroids and codebooks, then re-bin the slab structure host-side
        (no device re-scan of old rows). Batch additions — every add
        rebuilds the bin tables and changes shapes (recompile)."""
        new = np.asarray(descriptors, np.float32)
        assert new.ndim == 2 and new.shape[1] == self.dim, new.shape
        if self.keys is not None:
            assert keys is not None and len(keys) == len(new), \
                "index carries keys: add() needs one key per new row"
        new_r = np.asarray(self._rotate(jnp.asarray(new)))
        a_new = ivf_assign(new_r, self._centroids)
        c_new = np.asarray(encode_pq(
            new_r - np.asarray(self._centroids)[a_new], self.codebooks))
        a_old, c_old = unbin_ivf(self._ivf, self.n)
        ivf = bin_ivf(np.concatenate([a_old, a_new]),
                      np.concatenate([c_old, c_new]),
                      np.asarray(self._centroids),
                      slab=self._ivf.slab,
                      cap=self._ivf.vlist_tab.shape[1])
        if self._rerank_db is not None:
            r8, s8 = quantize_db(new)
            self._rerank_db = jnp.concatenate([self._rerank_db, r8])
            self._rerank_scales = jnp.concatenate(
                [self._rerank_scales, s8], axis=1)
        self._ivf = ivf
        self._coding = None      # row order changed: drop the AQE cache
        if self.keys is not None:
            self.keys.extend(keys)
        self._tomb_extend(len(new))
        self.n += len(new)

    def _compact_rows(self, keep_idx: np.ndarray) -> None:
        a_old, c_old = unbin_ivf(self._ivf, self.n)
        self._ivf = bin_ivf(np.asarray(a_old)[keep_idx],
                            np.asarray(c_old)[keep_idx],
                            np.asarray(self._centroids),
                            slab=self._ivf.slab,
                            cap=self._ivf.vlist_tab.shape[1])
        self._coding = None      # rows renumbered: drop the AQE cache
        if self._rerank_db is not None:
            gather = jnp.asarray(keep_idx)
            self._rerank_db = jnp.take(self._rerank_db, gather, axis=0)
            self._rerank_scales = jnp.take(self._rerank_scales, gather,
                                           axis=1)

    # --- persistence ----------------------------------------------------
    def save(self, path: str) -> None:
        arrays = {
            "ivf_codes": np.asarray(self._ivf.codes),
            "ivf_slab_rows": np.asarray(self._ivf.slab_rows),
            "ivf_vlist_tab": np.asarray(self._ivf.vlist_tab),
            "ivf_cell_of_v": np.asarray(self._ivf.cell_of_v),
            "ivf_centroids": np.asarray(self._centroids),
            "ivf_meta": np.asarray([self.n, self.nprobe], np.int64),
            "pq_codebooks": np.asarray(self.codebooks),
        }
        self._tomb_save(arrays)
        if self.rotation is not None:
            arrays["pq_rotation"] = np.asarray(self.rotation)
        if self._rerank_db is not None:
            arrays["descriptors_i8"] = np.asarray(self._rerank_db[: self.n])
            arrays["scales"] = np.asarray(self._rerank_scales)[:, : self.n]
        if self.keys is not None:
            arrays["keys"] = np.asarray(self.keys)
        with open(path, "wb") as f:
            np.savez(f, **arrays)

    @classmethod
    def load(cls, path: str) -> "IVFPQIndex":
        with np.load(path, allow_pickle=False) as data:
            centroids = np.asarray(data["ivf_centroids"], np.float32)
            cent_of_v = data["ivf_cell_of_v"]
            centroids_v = centroids[cent_of_v]
            ivf = IVFArrays(
                centroids_v=jnp.asarray(centroids_v),
                probe_adjust=jnp.asarray(-0.5 * np.sum(
                    np.square(centroids_v), axis=1, dtype=np.float32)),
                vlist_tab=jnp.asarray(data["ivf_vlist_tab"]),
                codes=jnp.asarray(data["ivf_codes"]),
                slab_rows=jnp.asarray(data["ivf_slab_rows"]),
                cell_of_v=jnp.asarray(cent_of_v),
            )
            n, nprobe = (int(v) for v in data["ivf_meta"])
            codebooks = jnp.asarray(data["pq_codebooks"])
            rotation = jnp.asarray(data["pq_rotation"]) \
                if "pq_rotation" in data else None
            keys = [str(k) for k in data["keys"]] if "keys" in data else None
            rdb = jnp.asarray(data["descriptors_i8"]) \
                if "descriptors_i8" in data else None
            rsc = jnp.asarray(data["scales"]) \
                if "descriptors_i8" in data else None
            removed = cls._tomb_unpack(data, n)
        dim = centroids.shape[1]
        idx = cls(None, nlist=0, nprobe=nprobe,
                  _loaded=(n, dim, keys, rotation, codebooks,
                           jnp.asarray(centroids), ivf, rdb, rsc))
        idx._tomb_restore(removed)
        return idx
