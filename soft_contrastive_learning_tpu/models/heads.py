"""Descriptor dimensionality-reduction heads.

Capability parity with the reduction options built inside the reference's
training graph (reference train/train.py:605-652): ``none``, ``1fc``/``2fc``/
``3fc`` dense stacks, streaming-``pca`` projection, and ``spp`` spatial-pyramid
pooling. ``spp`` is a reconstruction: the reference imports it from the
unpublished ``learnlarge.model.mac`` module (train/train.py:29,617), so the
implementation here is the standard max-SPP over a 2^l x 2^l pyramid, sized to
match the call site (input = VGG16's L2-normalized conv5_3 map, ``L`` levels).

Note on dropout: the reference calls ``tf.layers.dropout(x, keep_prob)``
without a ``training`` flag (train/train.py:633-641), which in TF1 silently
NEVER applies dropout. Here dropout is implemented correctly (active in
training, identity in eval); the reference's latent no-op is documented, not
replicated (SURVEY.md §7 'deciding what not to replicate').
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
import numpy as np
from flax import linen as nn


def spatial_pyramid_pool(feature_map: jnp.ndarray, levels: int = 3) -> jnp.ndarray:
    """Max spatial-pyramid pooling: concat max-pooled 2^l x 2^l grids.

    Input (B, H, W, C) -> output (B, sum_l 4^l * C), level-major then
    row-major bin order. Bin boundaries are computed with static shapes so the
    whole op lowers to gather-free slices + reductions under jit.
    """
    b, h, w, c = feature_map.shape
    pooled = []
    for level in range(levels):
        bins = 2**level
        h_edges = np.linspace(0, h, bins + 1).round().astype(int)
        w_edges = np.linspace(0, w, bins + 1).round().astype(int)
        for i in range(bins):
            for j in range(bins):
                region = feature_map[
                    :, h_edges[i] : h_edges[i + 1], w_edges[j] : w_edges[j + 1], :
                ]
                pooled.append(jnp.max(region, axis=(1, 2)))
    return jnp.concatenate(pooled, axis=-1)


def apply_pca_projection(
    features: jnp.ndarray,  # (B, D)
    components: jnp.ndarray,  # (out_dim, D) principal axes
    mean: jnp.ndarray,  # (D,)
    variance: jnp.ndarray,  # (out_dim,) explained variance
) -> jnp.ndarray:
    """Whitening PCA projection: (x - m) @ V^T / sqrt(var)
    (reference train/train.py:646-652). Pure function of streaming-PCA state so
    it lives outside the parameter pytree."""
    x = (features - mean) @ components.T
    return x / jnp.sqrt(variance)


class FCHead(nn.Module):
    """1-3 layer dense reduction head (reference train/train.py:631-644)."""

    num_layers: int  # 1, 2, or 3
    out_dim: int = 512
    hidden_dim: int = 4096
    dropout_rate: float = 0.5
    compute_dtype: Any = jnp.float32
    param_dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        assert self.num_layers in (1, 2, 3)
        x = x.astype(self.compute_dtype)
        for i in range(self.num_layers - 1):
            x = nn.Dense(
                self.hidden_dim,
                dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                name=f"fc{i + 1}",
            )(x)
            x = nn.relu(x)
            x = nn.Dropout(rate=self.dropout_rate, deterministic=not train)(x)
        x = nn.Dense(
            self.out_dim,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name=f"fc{self.num_layers}",
        )(x)
        return x.astype(jnp.float32)
