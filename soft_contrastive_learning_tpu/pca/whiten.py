"""Full-batch whitening PCA for the top-N evaluation protocol.

Capability parity with ``sklearn.decomposition.PCA(whiten=True)`` as used at
reference evaluation/top-n.py:74-77, but computed with JAX so it runs on the
TPU against the HBM-resident descriptor matrix. For N samples of dimension D
the decomposition runs on the SMALLER side (N x N Gram eigh when N < D — the
usual case for 32,768-D NetVLAD descriptors), i.e. one MXU matmul + one eigh.

The dense symmetric eigendecomposition itself is dispatched to host LAPACK
above a size threshold: XLA's TPU eigh is a QR-iteration ladder that measures
~350 s at 4,400x4,400 through the relay, vs 17 s for one-core
``numpy.linalg.eigh`` (perf/_topn_profile.log) — the MXU does the two O(N·D·k)
matmuls (Gram, component back-projection) where the FLOPs are, and the host
does the small O(N^3) factorization it is better at. ``host_eigh`` overrides
the threshold in either direction.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

# At/above this matrix side, eigh runs on host LAPACK (float64) instead of
# on-device. Below it, transfers would cost more than the decomposition.
_HOST_EIGH_THRESHOLD = 1024


def _eigh(mat: jnp.ndarray, host: Optional[bool]) -> tuple:
    if host is None:
        host = mat.shape[0] >= _HOST_EIGH_THRESHOLD
    if host:
        eigvals, eigvecs = np.linalg.eigh(np.asarray(mat, np.float64))
        return jnp.asarray(eigvals, jnp.float32), jnp.asarray(
            eigvecs, jnp.float32
        )
    return jnp.linalg.eigh(mat)


class PCAWhitener(NamedTuple):
    components: jnp.ndarray  # (k, D)
    mean: jnp.ndarray  # (D,)
    explained_variance: jnp.ndarray  # (k,)

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """sklearn PCA(whiten=True).transform semantics."""
        return ((x - self.mean) @ self.components.T) / jnp.sqrt(
            self.explained_variance
        )


def fit_pca(
    features: jnp.ndarray,
    n_components: int,
    host_eigh: Optional[bool] = None,
) -> PCAWhitener:
    x = jnp.asarray(features, jnp.float32)
    n, d = x.shape
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    k = min(n_components, min(n, d))
    if n <= d:
        gram = jnp.einsum(
            "nd,md->nm", xc, xc, preferred_element_type=jnp.float32,
            precision="highest",
        )
        eigvals, eigvecs = _eigh(gram, host_eigh)  # ascending
        eigvals = eigvals[::-1][:k]
        u = eigvecs[:, ::-1][:, :k]  # (n, k)
        s = jnp.sqrt(jnp.maximum(eigvals, 1e-12))
        comps = (xc.T @ (u / s)).T  # (k, d) right singular vectors
    else:
        cov = jnp.einsum(
            "nd,ne->de", xc, xc, preferred_element_type=jnp.float32,
            precision="highest",
        )
        eigvals, eigvecs = _eigh(cov, host_eigh)
        eigvals = eigvals[::-1][:k]
        comps = eigvecs[:, ::-1][:, :k].T
        s = jnp.sqrt(jnp.maximum(eigvals, 1e-12))
    explained = jnp.maximum(s**2 / jnp.maximum(n - 1, 1), 1e-12)
    return PCAWhitener(components=comps, mean=mean, explained_variance=explained)


def whiten_features(
    fit_on: jnp.ndarray, transform: jnp.ndarray, n_components: int
) -> jnp.ndarray:
    return fit_pca(fit_on, n_components).transform(transform)
