"""VGG16 convolutional backbone (ImageNet topology, NetVLAD-checkpoint layout).

Capability parity with reference model/nets.py:72-131 (``vgg16``) and the
backbone part of ``vgg16Netvlad`` (model/nets.py:7-69):

* optional grayscale->RGB promotion for 1-channel inputs,
* mean-image subtraction via a learned 3-vector ``average_rgb``,
* 13 3x3 'same' convs in 5 blocks with 2x2 max-pools,
* the last conv of each block has no activation and ReLU is applied after the
  pool (equivalent to pre-pool ReLU since max-pool and ReLU commute),
* conv5_3 output is NOT ReLU'd; it is channel-wise L2-normalized.

TPU-first details: activations run in ``compute_dtype`` (bfloat16 by default)
so the convs hit the MXU at full rate; parameters stay float32; the final L2
normalization is done in float32 for numerical parity. Optional
``jax.checkpoint`` rematerialization (per conv block) trades FLOPs for HBM.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

# (name, out_channels, relu_inside) per conv; pool after each block's last conv.
_VGG_BLOCKS = (
    (("conv1_1", 64, True), ("conv1_2", 64, False)),
    (("conv2_1", 128, True), ("conv2_2", 128, False)),
    (("conv3_1", 256, True), ("conv3_2", 256, True), ("conv3_3", 256, False)),
    (("conv4_1", 512, True), ("conv4_2", 512, True), ("conv4_3", 512, False)),
    (("conv5_1", 512, True), ("conv5_2", 512, True), ("conv5_3", 512, False)),
)


def l2_normalize(x: jnp.ndarray, axis: int = -1, epsilon: float = 1e-12) -> jnp.ndarray:
    """tf.nn.l2_normalize semantics: x / sqrt(max(sum(x^2), eps))."""
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(jnp.maximum(sq, epsilon))


class _ConvParams(nn.Module):
    """Parameter-only conv declaration with nn.Conv-compatible tree paths and
    initializers; used by the packed-stem fast path so checkpoints are
    interchangeable with the standard block."""

    cin: int
    cout: int
    param_dtype: Any

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.cin, self.cout),
            self.param_dtype,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.cout,), self.param_dtype
        )
        return kernel, bias


class _PackedStem(nn.Module):
    """block1 + pool + ReLU via the exact packed-width rewrite
    (ops/packed_stem.py): ~1.5x faster on the MXU than the 64-lane convs."""

    compute_dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from soft_contrastive_learning_tpu.ops.packed_stem import packed_stem_block

        k1, b1 = _ConvParams(3, 64, self.param_dtype, name="conv1_1")()
        k2, b2 = _ConvParams(64, 64, self.param_dtype, name="conv1_2")()
        dt = self.compute_dtype
        return packed_stem_block(
            x.astype(dt), k1.astype(dt), b1.astype(dt), k2.astype(dt), b2.astype(dt)
        )


class _ConvBlock(nn.Module):
    """One VGG block: a sequence of 3x3 convs (ReLU on all but the last).

    With ``winograd=True``, convs whose input channel count is a multiple
    of 128 run through the fused Pallas Winograd F(2x2,3x3) kernel (2.25x
    fewer MXU multiplies, ops/pallas/winograd_kernel.py); parameters keep
    nn.Conv's tree paths so checkpoints are interchangeable. conv1_1,
    conv1_2, and conv2_1 (3/64/64 input channels) stay direct convs: Mosaic
    needs lane-aligned (128) DMA extents, and the stem is substantially
    HBM-bound anyway."""

    specs: Sequence[Tuple[str, int, bool]]
    compute_dtype: Any
    param_dtype: Any
    winograd: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for name, feats, relu in self.specs:
            if self.winograd and x.shape[-1] % 128 == 0:
                from soft_contrastive_learning_tpu.ops.pallas.winograd_kernel import (
                    winograd_conv,
                )

                k, b = _ConvParams(
                    x.shape[-1], feats, self.param_dtype, name=name
                )()
                dt = self.compute_dtype
                x = winograd_conv(x.astype(dt), k, b, relu)
            else:
                x = nn.Conv(
                    features=feats,
                    kernel_size=(3, 3),
                    strides=(1, 1),
                    padding="SAME",
                    dtype=self.compute_dtype,
                    param_dtype=self.param_dtype,
                    name=name,
                )(x)
                if relu:
                    x = jax.nn.relu(x)
        return x


class VGG16(nn.Module):
    """Backbone producing the channel-L2-normalized conv5_3 feature map.

    Returns ``(features, grad_in)`` where ``grad_in`` is the pre-normalization
    conv5_3 activation — the extra output of the reference's grad_nets variants
    (reference model/grad_nets.py:63-69,129-134).
    """

    compute_dtype: Any = jnp.bfloat16
    param_dtype: Any = jnp.float32
    remat: bool = False
    packed_stem: bool = False  # exact packed-width block1 (ops/packed_stem.py)
    winograd: bool = False  # fused Pallas Winograd convs for >=64-ch layers

    @nn.compact
    def __call__(self, images: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        assert images.ndim == 4, "expected NHWC input"
        x = images.astype(self.compute_dtype)
        if x.shape[-1] == 1:
            # Grayscale -> RGB by replicating the channel (the reference's
            # fixed ones-valued 1x1 conv, model/nets.py:14-16).
            x = jnp.concatenate([x, x, x], axis=-1)
        assert x.shape[-1] == 3

        average_rgb = self.param(
            "average_rgb", nn.initializers.zeros_init(), (3,), self.param_dtype
        )
        x = x - average_rgb.astype(self.compute_dtype)

        use_packed = (
            self.packed_stem
            and x.shape[1] % 2 == 0
            and x.shape[2] % 2 == 0
        )
        block_cls = nn.remat(_ConvBlock) if self.remat else _ConvBlock
        num_blocks = len(_VGG_BLOCKS)
        for bi, specs in enumerate(_VGG_BLOCKS):
            if bi == 0 and use_packed:
                # block1 + pool + relu, fused in packed layout (same params).
                x = _PackedStem(
                    compute_dtype=self.compute_dtype,
                    param_dtype=self.param_dtype,
                    name="block1",
                )(x)
                continue
            x = block_cls(
                specs=specs,
                compute_dtype=self.compute_dtype,
                param_dtype=self.param_dtype,
                winograd=self.winograd,
                name=f"block{bi + 1}",
            )(x)
            if bi < num_blocks - 1:
                x = nn.max_pool(x, window_shape=(2, 2), strides=(2, 2))
                x = jax.nn.relu(x)
        # conv5_3 output: no pool, no ReLU (reference model/nets.py:63-66).
        grad_in = x
        features = l2_normalize(x.astype(jnp.float32), axis=-1)
        return features, grad_in
