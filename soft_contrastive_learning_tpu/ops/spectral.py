"""Spectral primitives for the eigenvalue/SVD loss families, TPU-safe.

The reference calls ``tf.linalg.svd(X, compute_uv=False)`` on (T, M, D)
residual matrices (reference model/losses.py:352-353 etc.) and
``tf.linalg.eigh`` on Gram matrices (model/losses.py:650-653). On TPU, direct
SVD is slow and its gradient is undefined/unstable at repeated or zero
singular values. Since only singular VALUES are needed and M << D (tuples of
~12-25 embeddings of dim 512-32768), we compute them from the eigenvalues of
the small-side Gram matrix:

    s_i(X) = sqrt(eigvals(X X^T))     (M x M eigh instead of M x D SVD)

The Gram product is one MXU matmul; eigh on a <=64x64 (or 525x525 for the
incremental family) matrix is cheap. A relative diagonal jitter keeps the
eigh gradient finite at degenerate spectra, and products of singular values
are evaluated in log space to avoid fp32 under/overflow for high
``dimensions`` (the incremental family multiplies up to 511 values).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_JITTER = 1e-10
_TINY = 1e-30


def gram_eigvals(features: jnp.ndarray) -> jnp.ndarray:
    """Ascending eigenvalues of X X^T for batched (T, M, D) features -> (T, M).

    Matches reference ``_features2eigenvalues`` (model/losses.py:650-653).
    """
    gram = jnp.einsum(
        "tmd,tnd->tmn", features, features, preferred_element_type=jnp.float32, precision="highest"
    )
    # Symmetrize + relative jitter: keeps eigh and its VJP finite when the
    # spectrum is degenerate (e.g. duplicate tuple members).
    gram = 0.5 * (gram + jnp.swapaxes(gram, 1, 2))
    scale = jnp.mean(jnp.abs(jnp.diagonal(gram, axis1=1, axis2=2)), axis=-1)
    eye = jnp.eye(gram.shape[-1], dtype=gram.dtype)
    gram = gram + (_JITTER * (scale[:, None, None] + 1.0)) * eye
    return jnp.linalg.eigvalsh(gram)


def min_eigenvalues(features: jnp.ndarray) -> jnp.ndarray:
    """(T, M, D) -> (T,) smallest Gram eigenvalue (reference model/losses.py:693-694)."""
    return gram_eigvals(features)[:, 0]


def max_eigenvalues(features: jnp.ndarray) -> jnp.ndarray:
    """(T, M, D) -> (T,) largest Gram eigenvalue (reference model/losses.py:697-698)."""
    return gram_eigvals(features)[:, -1]


def gram_trace(features: jnp.ndarray) -> jnp.ndarray:
    """(T, M, D) -> (T,) trace of X X^T == sum ||x_i||^2 (reference model/losses.py:701-703).

    No eigendecomposition needed: tr(X X^T) = sum of squares.
    """
    return jnp.sum(jnp.square(features), axis=(1, 2))


def svdvals_descending(features: jnp.ndarray) -> jnp.ndarray:
    """Singular values of batched (T, M, D), descending, shape (T, min(M, D)).

    Equivalent to ``tf.linalg.svd(X, compute_uv=False)`` but via small-side
    Gram eigh (see module docstring). Gradients are finite everywhere thanks
    to the jitter and the sqrt clamp.
    """
    t, m, d = features.shape
    if m <= d:
        gram = jnp.einsum(
            "tmd,tnd->tmn", features, features, preferred_element_type=jnp.float32, precision="highest"
        )
    else:
        gram = jnp.einsum(
            "tmd,tme->tde", features, features, preferred_element_type=jnp.float32, precision="highest"
        )
    gram = 0.5 * (gram + jnp.swapaxes(gram, 1, 2))
    scale = jnp.mean(jnp.abs(jnp.diagonal(gram, axis1=1, axis2=2)), axis=-1)
    eye = jnp.eye(gram.shape[-1], dtype=gram.dtype)
    gram = gram + (_JITTER * (scale[:, None, None] + 1.0)) * eye
    eig = jnp.linalg.eigvalsh(gram)  # ascending
    s = jnp.sqrt(jnp.maximum(eig, _TINY))
    return s[:, ::-1]


def top_svdvals(features: jnp.ndarray, dimensions: int) -> jnp.ndarray:
    """Top-``dimensions`` singular values, descending (T, dimensions).

    Mirrors the tf.slice of the SVD output at reference model/losses.py:352-353.
    """
    s = svdvals_descending(features)
    k = min(dimensions, s.shape[-1])
    return s[:, :k]


def stable_prod(values: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """prod(values) for nonnegative values, evaluated in log space.

    Numerically equal to the reference's ``tf.reduce_prod`` over singular
    values (model/losses.py:355) but immune to fp32 intermediate
    under/overflow when many values are multiplied (the incremental family
    multiplies up to loss_dim=512 of them, reference model/losses.py:499).
    """
    return jnp.exp(jnp.sum(jnp.log(jnp.maximum(values, _TINY)), axis=axis))
