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

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .ops.qe import expand_queries_chunked
from .ops.topk_pallas import quantize_db, rank_topk_fused

__all__ = ["RetrievalIndex"]


class RetrievalIndex:
    """Dot-product top-k search over a fixed descriptor database.

    ``dtype=jnp.int8`` stores the database 8-bit quantized (per-row scales,
    :func:`dirjax.ops.topk_pallas.quantize_db`): half the HBM of bf16 —
    twice the corpus per chip and twice the streaming-QPS ceiling — at
    ~8-bit ranking noise. Composes with ``mesh=`` (rows + scales sharded
    over the "db" axis) for multi-chip corpora.
    """

    def __init__(self, descriptors, keys: Optional[Sequence[str]] = None,
                 mesh=None, dtype=jnp.float32):
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

    #: query-count buckets: under jit every distinct nq is a fresh compile
    #: (minutes on a cold cache), so search pads the batch up to the next
    #: bucket with zero queries and slices the answer back down
    NQ_BUCKETS = (1, 4, 8, 16, 32, 64, 128, 256)

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
        self._int8_queries = bool(int8_queries)
        q = np.asarray(queries)
        if q.ndim == 1:
            q = q[None, :]  # single query convenience
        assert q.shape[1] == self.dim, \
            f"query dim {q.shape[1]} != index dim {self.dim}"
        nq = len(q)
        bucket = next((b for b in self.NQ_BUCKETS if b >= nq), nq)
        if bucket != nq:
            q = np.concatenate(
                [q, np.zeros((bucket - nq, self.dim), q.dtype)])
        vals, idxs = self._search_padded(q, k, aqe)
        return vals[:nq], idxs[:nq]

    def _search_padded(self, q, k: int, aqe: Optional[dict]
                       ) -> Tuple[np.ndarray, np.ndarray]:
        if self.mesh is None:
            if self._scales is not None:  # int8, single chip
                q = jnp.asarray(q, jnp.float32)
                if aqe:
                    from .ops.qe import expand_queries_quantized

                    q = expand_queries_quantized(q, self._db, self._scales,
                                                 alpha=aqe["alpha"],
                                                 k=aqe["k"])
                vals, idxs = rank_topk_fused(
                    q, self._db, k, db_scales=self._scales,
                    quantize_queries=getattr(self, "_int8_queries", False))
                return np.asarray(vals), np.asarray(idxs)
            q = jnp.asarray(q, self.dtype)
            if aqe:
                # chunked: never materializes the (Nq, Nd) similarity matrix
                q = expand_queries_chunked(q, self._db, alpha=aqe["alpha"],
                                           k=aqe["k"]).astype(self.dtype)
            vals, idxs = rank_topk_fused(q, self._db, k)
            return np.asarray(vals), np.asarray(idxs)

        from .parallel.ranking import sharded_aqe, sharded_topk

        q = jnp.asarray(q, jnp.float32)
        if aqe:
            q = sharded_aqe(q, self._db, self.mesh, self._n_valid,
                            alpha=aqe["alpha"], k=aqe["k"],
                            db_scales=self._scales)
        if self._scales is None:
            q = q.astype(self.dtype)
        vals, idxs = sharded_topk(
            q, self._db, k, self.mesh, self._n_valid,
            db_scales=self._scales,
            quantize_queries=(self._scales is not None
                              and getattr(self, "_int8_queries", False)))
        return np.asarray(vals), np.asarray(idxs)

    def lookup(self, indices) -> list:
        """Map result indices back to image keys."""
        assert self.keys is not None, "index was built without keys"
        return [[self.keys[j] for j in row] for row in np.asarray(indices)]

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
            merged = np.concatenate(
                [np.asarray(self._db[: self.n]), new]) \
                if self._scales is None else np.concatenate(
                    [np.asarray(self._db[: self.n], np.float32)
                     * np.asarray(self._scales).T[: self.n], new])
            if self._scales is None:
                from .parallel.ranking import shard_database

                self._db, self._n_valid = shard_database(
                    jnp.asarray(merged, self.dtype), self.mesh)
            else:
                from .parallel.ranking import shard_database_quantized

                self._db, self._scales, self._n_valid = \
                    shard_database_quantized(jnp.asarray(merged), self.mesh)
        # extend keys only after the database swap succeeded, so a failed
        # concat/device_put (e.g. OOM mid-add) can't leave keys/db skewed
        if self.keys is not None:
            self.keys.extend(keys)
        self.n += len(new)

    # --- persistence ------------------------------------------------------
    def save(self, path: str) -> None:
        """int8 indexes persist quantized (rows + per-row scales: 4x
        smaller than fp32 and reload without re-quantizing); other dtypes
        persist fp32."""
        arrays = {}
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
    def load(cls, path: str, mesh=None, dtype=None) -> "RetrievalIndex":
        """``dtype=None`` keeps the stored representation (int8 archives
        reload as int8 without a quantization pass; fp32 archives as fp32)."""
        with np.load(path, allow_pickle=False) as data:
            keys = [str(k) for k in data["keys"]] if "keys" in data else None
            if "descriptors_i8" in data:
                if dtype not in (None, jnp.int8):
                    # caller wants a float index back: dequantize
                    descs = data["descriptors_i8"].astype(np.float32) \
                        * data["scales"].T
                    return cls(descs, keys=keys, mesh=mesh, dtype=dtype)
                idx = cls.__new__(cls)
                db_i8 = data["descriptors_i8"]
                scales = data["scales"]
                idx.n, idx.dim = db_i8.shape
                idx.keys = keys
                idx.mesh = mesh
                idx.dtype = jnp.int8
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
        return cls(descs, keys=keys, mesh=mesh,
                   dtype=jnp.float32 if dtype is None else dtype)
