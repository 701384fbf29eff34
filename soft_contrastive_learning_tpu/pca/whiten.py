"""Full-batch whitening PCA for the top-N evaluation protocol.

Capability parity with ``sklearn.decomposition.PCA(whiten=True)`` as used at
reference evaluation/top-n.py:74-77, but computed with JAX so it runs on the
TPU against the HBM-resident descriptor matrix. For N samples of dimension D
the decomposition runs on the SMALLER side (N x N Gram eigh when N < D — the
usual case for 32,768-D NetVLAD descriptors), i.e. one MXU matmul + one eigh.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PCAWhitener(NamedTuple):
    components: jnp.ndarray  # (k, D)
    mean: jnp.ndarray  # (D,)
    explained_variance: jnp.ndarray  # (k,)

    def transform(self, x: jnp.ndarray) -> jnp.ndarray:
        """sklearn PCA(whiten=True).transform semantics."""
        return ((x - self.mean) @ self.components.T) / jnp.sqrt(
            self.explained_variance
        )


def fit_pca(features: jnp.ndarray, n_components: int) -> PCAWhitener:
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
        eigvals, eigvecs = jnp.linalg.eigh(gram)  # ascending
        eigvals = eigvals[::-1][:k]
        u = eigvecs[:, ::-1][:, :k]  # (n, k)
        s = jnp.sqrt(jnp.maximum(eigvals, 1e-12))
        comps = (xc.T @ (u / s)).T  # (k, d) right singular vectors
    else:
        cov = jnp.einsum(
            "nd,ne->de", xc, xc, preferred_element_type=jnp.float32,
            precision="highest",
        )
        eigvals, eigvecs = jnp.linalg.eigh(cov)
        eigvals = eigvals[::-1][:k]
        comps = eigvecs[:, ::-1][:, :k].T
        s = jnp.sqrt(jnp.maximum(eigvals, 1e-12))
    explained = jnp.maximum(s**2 / jnp.maximum(n - 1, 1), 1e-12)
    return PCAWhitener(components=comps, mean=mean, explained_variance=explained)


def whiten_features(
    fit_on: jnp.ndarray, transform: jnp.ndarray, n_components: int
) -> jnp.ndarray:
    return fit_pca(fit_on, n_components).transform(transform)
