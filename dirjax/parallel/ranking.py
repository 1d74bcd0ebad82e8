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

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["shard_database", "sharded_topk", "sharded_scores", "sharded_aqe"]


def shard_database(db, mesh: Mesh, axis: str = "db"):
    """Place a (Nd, D) descriptor matrix row-sharded over ``axis``.
    Pads Nd up to a multiple of the axis size (pad rows are all-zero, so
    they can never win a top-k over L2-normalized descriptors)."""
    n = db.shape[0]
    size = mesh.shape[axis]
    pad = (-n) % size
    if pad:
        db = jnp.concatenate([jnp.asarray(db),
                              jnp.zeros((pad, db.shape[1]), db.dtype)])
    return jax.device_put(db, NamedSharding(mesh, P(axis, None))), n


def sharded_topk(q, db_sharded, k: int, mesh: Mesh, n_valid: int,
                 axis: str = "db"):
    """(values, indices) of the global top-k per query.

    Per-shard top-k on each device, then an all-gather of the (nq, k)
    candidates over ICI and a final tiny top-k — O(devices*k) merge traffic
    instead of O(Nd)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=(P(None, axis), P(None, axis)),
        check_vma=False)
    def local_topk(q_rep, db_local):
        scores = jnp.matmul(q_rep, db_local.T,
                            preferred_element_type=jnp.float32)
        rows = db_local.shape[0]
        offset = jax.lax.axis_index(axis) * rows
        nq = scores.shape[0]
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1) + offset
        scores = jnp.where(col < n_valid, scores, -jnp.inf)
        vals, idx = jax.lax.top_k(scores, min(k, rows))
        return vals, idx + offset

    vals, idxs = local_topk(q, db_sharded)     # (nq, ndev*k)
    merged_vals, pos = jax.lax.top_k(vals, k)
    merged_idxs = jnp.take_along_axis(idxs, pos, axis=1)
    return merged_vals, merged_idxs


def sharded_scores(q, db_sharded, mesh: Mesh, n_valid: int, axis: str = "db"):
    """Full (nq, Nd) score matrix, computed shard-wise and laid out
    column-sharded over the mesh (gather to host with np.asarray)."""

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(), P(axis, None)),
        out_specs=P(None, axis),
        check_vma=False)
    def local_scores(q_rep, db_local):
        return jnp.matmul(q_rep, db_local.T,
                          preferred_element_type=jnp.float32)

    scores = local_scores(q, db_sharded)
    return scores[:, :n_valid]


def sharded_aqe(q, db_sharded, mesh: Mesh, n_valid: int, alpha: float = 3.0,
                k: int = 10, axis: str = "db"):
    """Alpha-query-expansion against a sharded database: top-k neighbors
    found shard-wise, neighbor rows gathered by global index, re-aggregated
    and re-normalized (semantics of reference test_dir.py:24-44)."""
    vals, idxs = sharded_topk(q, db_sharded, k, mesh, n_valid, axis)
    neighbors = jnp.take(db_sharded, idxs, axis=0)   # gathers across shards
    if float(alpha).is_integer():
        w = jnp.sign(vals) ** int(alpha) * jnp.power(jnp.abs(vals), alpha)
    else:
        w = jnp.power(vals, alpha)
    expanded = (q + jnp.einsum("nk,nkd->nd", w, neighbors,
                               preferred_element_type=jnp.float32)) / (k + 1.0)
    norm = jnp.linalg.norm(expanded, axis=1, keepdims=True)
    return expanded / jnp.maximum(norm, 1e-12)
