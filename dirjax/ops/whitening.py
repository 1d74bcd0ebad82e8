"""PCA whitening with power-scaled variance (reference ``utils/common.py:221-239``).

The reference stores an sklearn PCA object inside each checkpoint; we carry
only its arrays (mean, components, explained variance) in a
:class:`PCAParams` pytree. The transform is

    X_hat = (X - mean) @ components[:v].T / (m * variance[:v]^p)

optionally followed by L2 normalization. ``whitenp`` defaults differ by
entry point in the reference (0.25 in test_dir.py:219, 0.5 in
extract_features.py:103) — both CLIs here preserve their own default.

For the TPU extraction path, :func:`whitening_matrix` folds the whole affine
transform into a single (D_in, D_out) matrix + offset so whitening rides the
MXU as one matmul fused behind the descriptor head.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from .normalize import l2_normalize

__all__ = ["PCAParams", "fit_pca", "apply_whitening", "whitening_matrix"]


class PCAParams(NamedTuple):
    """Arrays of an sklearn-style PCA: the checkpoint interop format."""

    mean: jnp.ndarray          # (D,)
    components: jnp.ndarray    # (K, D) rows = principal axes
    variance: jnp.ndarray      # (K,) explained variance (n-1 divisor)
    #: sklearn's ``whiten`` fit flag: the reference divides by variance^p
    #: only when it is set (common.py:228-229)
    whiten: bool = True

    @staticmethod
    def from_sklearn(pca) -> "PCAParams":
        return PCAParams(
            mean=np.asarray(pca.mean_),
            components=np.asarray(pca.components_),
            variance=np.asarray(pca.explained_variance_),
            whiten=bool(getattr(pca, "whiten", True)),
        )


def fit_pca(X: np.ndarray, n_components: Optional[int] = None) -> PCAParams:
    """Fit a full PCA exactly as sklearn does (SVD of the centered matrix,
    deterministic sign via svd_flip, variance with n-1 divisor). Used when
    learning whitening from a dataset's descriptors."""
    X = np.asarray(X, dtype=np.float64)
    n, d = X.shape
    mean = X.mean(axis=0)
    Xc = X - mean
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    # svd_flip: force the largest-|.| entry of each u column positive
    max_abs = np.argmax(np.abs(U), axis=0)
    signs = np.sign(U[max_abs, range(U.shape[1])])
    Vt = Vt * signs[:, None]
    variance = (S ** 2) / (n - 1)
    k = n_components or min(n, d)
    return PCAParams(mean=mean.astype(np.float32),
                     components=Vt[:k].astype(np.float32),
                     variance=variance[:k].astype(np.float32))


def apply_whitening(X, pca: PCAParams, whitenp: float = 0.5,
                    whitenv: Optional[int] = None, whitenm: float = 1.0,
                    l2norm: bool = True):
    """Whiten descriptor rows (jit-compatible; ``whitenv`` must be static)."""
    X = jnp.asarray(X)
    comps = pca.components[:whitenv]
    var = pca.variance[:whitenv]
    import jax

    Xt = jnp.matmul(X - pca.mean, comps.T,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    if bool(pca.whiten):  # reference gates the scaling on the sklearn flag
        Xt = Xt / (whitenm * jnp.power(var, whitenp))
    return l2_normalize(Xt) if l2norm else Xt


def whitening_matrix(pca: PCAParams, whitenp: float = 0.5,
                     whitenv: Optional[int] = None, whitenm: float = 1.0):
    """Fold the whitening transform into (W, b) with X_hat = X @ W + b,
    ready to fuse behind the descriptor head's FC projection."""
    comps = np.asarray(pca.components[:whitenv], dtype=np.float64)
    var = np.asarray(pca.variance[:whitenv], dtype=np.float64)
    if bool(pca.whiten):
        scale = 1.0 / (whitenm * np.power(var, whitenp))
    else:
        scale = np.ones_like(var)
    W = comps.T * scale[None, :]
    b = -np.asarray(pca.mean, dtype=np.float64) @ W
    return W.astype(np.float32), b.astype(np.float32)
