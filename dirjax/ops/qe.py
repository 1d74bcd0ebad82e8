"""Alpha query expansion (AQE) and database augmentation (ADBA).

Vectorized, device-resident reformulation of the reference's per-query
Python loop (``test_dir.py:24-44``): the new descriptor is the mean of the
original and its top-k neighbors weighted by similarity^alpha, re-L2-normed:

    q' = normalize( (q + sum_{j in topk(q)} sim(q, d_j)^alpha * d_j) / (k+1) )

For ADBA the database expands against itself with the self-similarity on the
diagonal zeroed first.

On TPU the whole expansion is two MXU matmuls plus a top-k — no host loop.
The chunked variant bounds the (Nq, Nd) similarity matrix in HBM.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .normalize import l2_normalize

__all__ = ["expand_descriptors", "expand_queries", "expand_database"]


def _expand_from_sims(descs, db_descs, sims, alpha: float, k: int):
    k = min(int(k), db_descs.shape[0])
    top_sims, top_idx = jax.lax.top_k(sims, k)  # (N, k)
    # sim^alpha exactly as numpy computes it for the reference's integer
    # alpha: negative sims keep sign^alpha (jnp.power alone would NaN there)
    if float(alpha).is_integer():
        weights = jnp.sign(top_sims) ** int(alpha) * jnp.power(jnp.abs(top_sims), alpha)
    else:
        weights = jnp.power(top_sims, alpha)
    neighbors = jnp.take(db_descs, top_idx, axis=0)  # (N, k, D)
    weighted = jnp.einsum("nk,nkd->nd", weights, neighbors,
                          precision=jax.lax.Precision.HIGHEST,
                          preferred_element_type=jnp.float32)
    out = (descs + weighted) / (k + 1.0)
    return l2_normalize(out)


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


def expand_descriptors(descs, db=None, alpha: float = 0, k: int = 0):
    """Reference-signature convenience wrapper (test_dir.py:24-44):
    ``db=None`` means ADBA-style self-expansion."""
    assert k >= 0 and alpha >= 0, "k and alpha must be non-negative"
    if k == 0:
        return jnp.asarray(descs)
    if db is None:
        return expand_database(descs, alpha=alpha, k=k)
    return expand_queries(descs, db, alpha=alpha, k=k)
