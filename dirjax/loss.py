"""Retrieval losses: differentiable AP (listwise), tie-aware AP, triplets.

Parity with reference ``dirtorch/loss.py`` (the training objectives of
"Learning with Average Precision", Revaud et al. ICCV'19):

* :class:`APLoss` — AP through score quantization. The reference builds the
  quantizer as a frozen Conv1d(1, 2*nq) (loss.py:29-41); here it is what it
  mathematically is: a bank of nq triangular kernels
  ``q_i(x) = clamp(1 - a*|x - c_i|, 0)`` over bin centers c_i, with the two
  boundary bins saturating to 1 beyond the range — expressed as vectorized
  ops that XLA fuses (no conv, no loop).
* :class:`TAPLoss` — tie-aware variant (loss.py:73-136), exact and
  simplified forms.
* :class:`TripletMarginLoss` / :class:`TripletLogExpLoss` — pairwise
  distance triplet objectives (loss.py:139-207).
* :func:`sim_to_dist` + ``*_dist`` wrappers (loss.py:210-223).

All losses are pure functions of (scores, labels) and differentiate through
``jax.grad``; shapes are static so they jit cleanly into the train step.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp

__all__ = [
    "quantize_scores", "APLoss", "TAPLoss", "APLoss_dist", "TAPLoss_dist",
    "TripletMarginLoss", "TripletLogExpLoss", "sim_to_dist",
]


def quantize_scores(x: jnp.ndarray, nq: int, min_val: float, max_val: float
                    ) -> jnp.ndarray:
    """Soft-assign scores (N, M) to nq triangular bins -> (N, nq, M).

    Replicates the reference quantizer exactly (loss.py:29-48): bin i has
    center ``c_i = max - i*gap/(nq-1)`` (descending), slope ``a=(nq-1)/gap``;
    bin 0 saturates at 1 for x >= c_0 and bin nq-1 for x <= c_{nq-1}.
    """
    gap = max_val - min_val
    a = (nq - 1) / gap
    i = jnp.arange(nq, dtype=x.dtype)
    # first half: f1_i = -a*x + a*min + (nq - i); row 0 overridden to 1
    f1 = -a * x[:, None, :] + (a * min_val + (nq - i))[None, :, None]
    f1 = f1.at[:, 0, :].set(1.0)
    # second half: f2_i = a*x + (2 - nq + i) - a*min; row nq-1 overridden to 1
    f2 = a * x[:, None, :] + ((2.0 - nq + i) - a * min_val)[None, :, None]
    f2 = f2.at[:, nq - 1, :].set(1.0)
    return jnp.clip(jnp.minimum(f1, f2), 0.0)


@dataclass(frozen=True)
class APLoss:
    """1 - mAP over quantized precision/recall (reference loss.py:43-65).

    Inputs: ``x`` (N, M) scores in [min, max]; ``label`` (N, M) in {0, 1}.
    """

    nq: int = 25
    min: float = 0.0
    max: float = 1.0

    def __post_init__(self):
        assert isinstance(self.nq, int) and 2 <= self.nq <= 100
        assert self.max - self.min > 0

    def ap(self, x, label, eps: float = 1e-16):
        q = quantize_scores(x, self.nq, self.min, self.max)  # (N, Q, M)
        label = label.astype(q.dtype)
        nbs = q.sum(axis=-1)                                  # (N, Q)
        rec = (q * label[:, None, :]).sum(axis=-1)            # (N, Q)
        prec = jnp.cumsum(rec, axis=-1) / (eps + jnp.cumsum(nbs, axis=-1))
        # safe divide: a query with no positives gets AP 0, not NaN (the
        # reference would NaN here; in-batch sampling can produce such rows)
        rec = rec / jnp.maximum(rec.sum(axis=-1, keepdims=True), eps)
        return (prec * rec).sum(axis=-1)                      # (N,)

    def __call__(self, x, label, qw=None, ret: str = "1-mAP"):
        ap = self.ap(x, label)
        if ret == "1-mAP":
            if qw is not None:
                ap = ap * qw
            return 1.0 - ap.mean()
        if ret == "AP":
            assert qw is None
            return ap
        raise ValueError(f"Bad return type for APLoss(): {ret}")

    def measures(self, x, gt, loss=None):
        if loss is None:
            loss = self(x, gt)
        return {"loss_ap": float(loss)}


@dataclass(frozen=True)
class TAPLoss(APLoss):
    """Tie-aware AP (reference loss.py:86-131)."""

    simplified: bool = False

    def ap(self, x, label, eps: float = 1e-8):
        q = quantize_scores(x, self.nq, self.min, self.max)  # (N, Q, M)
        label = label.astype(q.dtype)
        n_pos = jnp.maximum(label.sum(axis=-1, keepdims=True), eps)  # (N, 1)

        c = q.sum(axis=-1)                                    # (N, Q)
        cp = (q * label[:, None, :]).sum(axis=-1)             # (N, Q)
        C = jnp.cumsum(c, axis=-1)
        Cp = jnp.cumsum(cp, axis=-1)
        C_1d = jnp.pad(C[:, :-1], ((0, 0), (1, 0)))
        Cp_1d = jnp.pad(Cp[:, :-1], ((0, 0), (1, 0)))

        if self.simplified:
            aps = cp * (Cp_1d + Cp + 1) / (C_1d + C + 1) / n_pos
        else:
            ratio = jnp.clip(cp - 1, 0) / (jnp.clip(c - 1, 0) + eps)
            aps = (cp * (c * ratio + (Cp_1d + 1 - ratio * (C_1d + 1))
                         * jnp.log((C + 1) / (C_1d + 1)))
                   / (c + eps) / n_pos)
        return aps.sum(axis=-1)

    def measures(self, x, gt, loss=None):
        if loss is None:
            loss = self(x, gt)
        key = "loss_tap" + ("s" if self.simplified else "")
        return {key: float(loss)}


def sim_to_dist(scores):
    """Cosine similarity -> a distance (reference loss.py:210-211)."""
    return 1.0 - jnp.sqrt(2.001 - 2.0 * scores)


@dataclass(frozen=True)
class APLoss_dist(APLoss):
    def __call__(self, x, label, **kw):
        return APLoss.__call__(self, sim_to_dist(x), label, **kw)


@dataclass(frozen=True)
class TAPLoss_dist(TAPLoss):
    def __call__(self, x, label, **kw):
        return TAPLoss.__call__(self, sim_to_dist(x), label, **kw)


def _pairwise_distance(a, b, p: float = 2.0, eps: float = 1e-6):
    return jnp.power(jnp.sum(jnp.abs(a - b + eps) ** p, axis=-1), 1.0 / p)


@dataclass(frozen=True)
class TripletMarginLoss:
    """max(0, d(a,p) - d(a,n) + margin), mean over the batch
    (torch TripletMarginLoss semantics, reference loss.py:139-145)."""

    margin: float = 1.0
    p: float = 2.0
    eps: float = 1e-6
    swap: bool = False

    def __call__(self, anchor, positive, negative):
        d_p = _pairwise_distance(anchor, positive, self.p, self.eps)
        d_n = _pairwise_distance(anchor, negative, self.p, self.eps)
        if self.swap:
            d_s = _pairwise_distance(positive, negative, self.p, self.eps)
            d_n = jnp.minimum(d_n, d_s)
        return jnp.mean(jnp.clip(d_p - d_n + self.margin, 0.0))

    def from_distances(self, d_p, d_n):
        """Per-anchor loss from already-mined distances (batch-hard path)."""
        return jnp.clip(d_p - d_n + self.margin, 0.0)

    def eval_func(self, dp, dn):
        return max(0.0, dp - dn + self.margin)


@dataclass(frozen=True)
class TripletLogExpLoss:
    """log(1 + exp(d(a,p) - d(a,n))) (reference loss.py:148-207)."""

    p: float = 2.0
    eps: float = 1e-6
    swap: bool = False

    def __call__(self, anchor, positive, negative):
        assert anchor.ndim == 2
        d_p = _pairwise_distance(anchor, positive, self.p, self.eps)
        d_n = _pairwise_distance(anchor, negative, self.p, self.eps)
        if self.swap:
            d_s = _pairwise_distance(positive, negative, self.p, self.eps)
            d_n = jnp.minimum(d_n, d_s)
        return jnp.mean(jnp.log1p(jnp.exp(d_p - d_n)))

    def from_distances(self, d_p, d_n):
        """Per-anchor loss from already-mined distances (batch-hard path)."""
        return jnp.log1p(jnp.exp(d_p - d_n))

    def eval_func(self, dp, dn):
        import numpy as np

        return np.log(1 + np.exp(dp - dn))
