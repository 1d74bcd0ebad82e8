"""Similarity scoring and top-k ranking.

The reference ranks with one CPU numpy matmul (``utils/common.py:30-38``,
``test_dir.py:145``). Here scoring is a device matmul in fp32 (descriptors
are small enough that bf16 rounding could reorder near-ties and shift mAP),
with a chunked variant to bound HBM for million-image databases and a fused
score+top-k path for serving. The ICI-sharded version lives in
:mod:`dirjax.parallel.ranking`.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["compute_scores", "compute_scores_chunked", "rank_topk"]


@jax.jit
def compute_scores(qdescs: jnp.ndarray, db_descs: jnp.ndarray) -> jnp.ndarray:
    """(Nq, D) x (Nd, D) -> (Nq, Nd) dot-product similarity.

    Precision.HIGHEST: on TPU the default matmul precision truncates fp32
    inputs to bf16, which can reorder near-tied scores and shift mAP."""
    return jnp.matmul(qdescs.astype(jnp.float32), db_descs.astype(jnp.float32).T,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def compute_scores_chunked(qdescs, db_descs, chunk: int = 262144) -> np.ndarray:
    """Score against a database too large for one HBM buffer: stream DB
    chunks through the device, assemble the full row on host (needed for
    exact junk-aware mAP, which requires complete score rows)."""
    qdescs = jnp.asarray(qdescs, dtype=jnp.float32)
    n = db_descs.shape[0]
    out = []
    for start in range(0, n, chunk):
        block = jnp.asarray(db_descs[start:start + chunk], dtype=jnp.float32)
        out.append(np.asarray(compute_scores(qdescs, block)))
    return np.concatenate(out, axis=1)


@partial(jax.jit, static_argnames=("k",))
def rank_topk(qdescs: jnp.ndarray, db_descs: jnp.ndarray, k: int):
    """Fused score + top-k for the serving path: returns (values, indices)
    of the k best database entries per query."""
    scores = compute_scores(qdescs, db_descs)
    return jax.lax.top_k(scores, k)
