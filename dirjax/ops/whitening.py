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

__all__ = ["PCAParams", "fit_pca", "fit_pca_device", "apply_whitening",
           "whitening_matrix"]


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


def fit_pca_device(X, n_components: Optional[int] = None) -> PCAParams:
    """Covariance-PCA for corpora too large for the host-SVD path.

    :func:`fit_pca` needs the full (N, D) matrix on the host and an
    O(N·D²) SVD there — at 1M x 2048 that is an 8 GB transfer through the
    ~8 MB/s tunnel before the maths even starts. This fit instead reduces
    on DEVICE: it accumulates the column sum and the (D, D) Gram matrix
    in fp32 (``precision=HIGHEST`` — bf16-truncated products measurably
    shift small eigenvalues), pulls only the (D, D) covariance to the
    host (16 MB at D=2048), and eigendecomposes there in fp64.

    ``X`` is either one array (device or host) or an iterable of row
    chunks (stream a corpus that never fits in HBM at once; uniform chunk
    shapes avoid recompiles). Component signs follow the same
    "largest-|entry| positive" rule as svd_flip applied to the rows, so
    fits are deterministic; retrieval is sign-invariant either way (both
    query and database rows flip together).

    Eigh of the covariance squares the condition number relative to SVD,
    but descriptor rows are L2-normalized O(1) values: fp32 accumulation
    + fp64 eigh holds component parity with :func:`fit_pca` to ~1e-4 at
    benchmark scales (tests/test_whitening.py).
    """
    import jax

    chunks = [X] if hasattr(X, "shape") else X

    @jax.jit
    def accum(c, s1, s2):
        c32 = c.astype(jnp.float32)
        return (s1 + jnp.sum(c32, axis=0),
                s2 + jnp.matmul(c32.T, c32,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32))

    s1 = s2 = None
    n = 0
    for c in chunks:
        c = jnp.asarray(c)
        if s1 is None:
            d = c.shape[1]
            s1 = jnp.zeros((d,), jnp.float32)
            s2 = jnp.zeros((d, d), jnp.float32)
        s1, s2 = accum(c, s1, s2)
        n += int(c.shape[0])
    if n < 2:
        raise ValueError(f"need at least 2 rows to fit a PCA, got {n}")

    s1 = np.asarray(s1, dtype=np.float64)
    s2 = np.asarray(s2, dtype=np.float64)
    mean = s1 / n
    cov = (s2 - n * np.outer(mean, mean)) / (n - 1)
    w, v = np.linalg.eigh(cov)                     # ascending
    order = np.argsort(w)[::-1]
    w = np.clip(w[order], 0.0, None)
    comps = v[:, order].T                          # rows = principal axes
    max_abs = np.argmax(np.abs(comps), axis=1)
    signs = np.sign(comps[np.arange(comps.shape[0]), max_abs])
    signs[signs == 0] = 1.0
    comps = comps * signs[:, None]
    # match fit_pca's SVD default: at most min(N, D) components (the
    # covariance has rank <= N-1; trailing eigenvectors are noise)
    k = n_components or min(n, comps.shape[0])
    return PCAParams(mean=mean.astype(np.float32),
                     components=comps[:k].astype(np.float32),
                     variance=w[:k].astype(np.float32))


def apply_whitening(X, pca: PCAParams, whitenp: float = 0.5,
                    whitenv: Optional[int] = None, whitenm: float = 1.0,
                    l2norm: bool = True, dead_floor: float = 0.0):
    """Whiten descriptor rows (jit-compatible; ``whitenv`` must be static).

    Rank-deficient corpora (rank < D) have trailing eigenvalues clipped
    to EXACTLY 0 by the fit: dividing by 0^p would poison those columns
    with NaN (the reference emits NaN there too — no signal exists), so
    they fold to 0. Tiny POSITIVE eigenvalues divide like the reference
    by default: any silent floor changes mAP vs dirtorch on low-rank
    fits (an early 1e-7 floor broke cross-toolbox TTA parity on a
    14-image fixture). ``dead_floor > 0`` opts into ALSO zeroing
    directions with variance below ``max(var) * dead_floor`` — the sane
    regularization for structurally rank-deficient spectra (the recall
    study uses 1e-7, the fp32 Gram noise scale), at the price of exact
    reference parity."""
    X = jnp.asarray(X)
    comps = pca.components[:whitenv]
    var = pca.variance[:whitenv]
    import jax

    Xt = jnp.matmul(X - pca.mean, comps.T,
                    precision=jax.lax.Precision.HIGHEST,
                    preferred_element_type=jnp.float32)
    if bool(pca.whiten):  # reference gates the scaling on the sklearn flag
        floor = jnp.max(var) * dead_floor
        scaled = Xt / (whitenm * jnp.power(
            jnp.maximum(var, jnp.maximum(floor, 1e-38)), whitenp))
        Xt = jnp.where(var > floor, scaled, 0.0)
    return l2_normalize(Xt) if l2norm else Xt


def whitening_matrix(pca: PCAParams, whitenp: float = 0.5,
                     whitenv: Optional[int] = None, whitenm: float = 1.0,
                     dead_floor: float = 0.0):
    """Fold the whitening transform into (W, b) with X_hat = X @ W + b,
    ready to fuse behind the descriptor head's FC projection. Same
    dead-direction contract as :func:`apply_whitening`: exact-zero
    eigenvalues fold to a 0 column (reference: NaN); positive ones
    divide unfloored unless ``dead_floor`` opts into the relative
    floor."""
    comps = np.asarray(pca.components[:whitenv], dtype=np.float64)
    var = np.asarray(pca.variance[:whitenv], dtype=np.float64)
    if bool(pca.whiten):
        floor = float(var.max()) * dead_floor
        scale = np.where(
            var > floor,
            1.0 / (whitenm * np.power(np.maximum(var, max(floor, 1e-300)),
                                      whitenp)), 0.0)
    else:
        scale = np.ones_like(var)
    W = comps.T * scale[None, :]
    b = -np.asarray(pca.mean, dtype=np.float64) @ W
    return W.astype(np.float32), b.astype(np.float32)
