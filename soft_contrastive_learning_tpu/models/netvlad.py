"""Native NetVLAD aggregation layer, TPU-first.

The reference delegates NetVLAD to the external netvlad_tf_open dependency
(reference model/nets.py:1,67: ``layers.netVLAD(x, 64)``); this is a native
reimplementation with the same parameterization and normalization order so a
converted checkpoint reproduces descriptors to float tolerance:

* soft-assignment: bias-free 1x1 conv -> softmax over clusters,
* matconvnet convention: ``cluster_centers`` stores the *negated* centers and
  is ADDED to the features,
* intra-normalization over the descriptor dim per cluster (eps 1e-12),
* flatten in (D-major, cluster-minor) order, final L2 normalization.

TPU-first formulation: instead of materializing the (B, H, W, D, K) residual
tensor (what the TF implementation does), the aggregation is algebraically
refactored into one MXU matmul plus a rank-1 correction:

    V[b,k,d] = sum_n a[b,n,k] * (x[b,n,d] + C[d,k])
             = einsum('bnk,bnd->bkd', a, x)  +  (sum_n a[b,n,k]) * C[d,k]

which is O(B*N*K*D) FLOPs on the MXU and O(B*K*D) memory. The optional Pallas
path (ops/pallas/netvlad_kernel.py) fuses softmax + aggregation + intra-norm.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-12


def vlad_aggregate(
    features: jnp.ndarray,  # (B, N, D) channel-L2-normalized descriptors
    assign_logits: jnp.ndarray,  # (B, N, K)
    neg_centers: jnp.ndarray,  # (D, K), matconvnet sign convention (added)
) -> jnp.ndarray:
    """Aggregate to an L2-normalized (B, D*K) VLAD descriptor (d-major layout)."""
    a = jax.nn.softmax(assign_logits.astype(jnp.float32), axis=-1)
    x = features.astype(jnp.float32)
    # (B, K, D) soft-assigned feature mass — the only big matmul.
    agg = jnp.einsum("bnk,bnd->bkd", a, x, preferred_element_type=jnp.float32, precision="highest")
    mass = jnp.sum(a, axis=1)  # (B, K)
    v = agg + mass[:, :, None] * neg_centers.T[None, :, :]  # (B, K, D)
    # Intra-normalization over D per cluster (matconvnet eps inside the sqrt).
    v = v / jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True) + _EPS)
    # Flatten d-major: descriptor index = d * K + k (netvlad_tf_open layout).
    v = jnp.transpose(v, (0, 2, 1)).reshape(v.shape[0], -1)
    v = v / jnp.sqrt(jnp.sum(jnp.square(v), axis=-1, keepdims=True) + _EPS)
    return v


class NetVLAD(nn.Module):
    """NetVLAD head over a (B, H, W, D) feature map -> (B, D*K) descriptor."""

    num_clusters: int = 64
    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    use_pallas: bool = False

    @nn.compact
    def __call__(self, feature_map: jnp.ndarray) -> jnp.ndarray:
        b, h, w, d = feature_map.shape
        k = self.num_clusters
        logits = nn.Conv(
            features=k,
            kernel_size=(1, 1),
            use_bias=False,
            dtype=self.compute_dtype,
            param_dtype=self.param_dtype,
            name="assignment",
        )(feature_map.astype(self.compute_dtype))
        neg_centers = self.param(
            "cluster_centers",
            nn.initializers.normal(stddev=1.0 / jnp.sqrt(d)),
            (d, k),
            self.param_dtype,
        )
        x = feature_map.reshape(b, h * w, d)
        s = logits.reshape(b, h * w, k)
        if self.use_pallas:
            from soft_contrastive_learning_tpu.ops.pallas.netvlad_kernel import (
                vlad_aggregate_fused,
            )

            return vlad_aggregate_fused(x, s, neg_centers)
        return vlad_aggregate(x, s, neg_centers)
