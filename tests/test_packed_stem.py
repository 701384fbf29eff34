"""Exactness tests for the packed-width VGG stem rewrite."""

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.models.vgg16 import VGG16
from soft_contrastive_learning_tpu.ops.packed_stem import (
    pack_input,
    pack_kernel,
    packed_stem_block,
    repack_shifted,
)


def test_packed_stem_block_exact(rng):
    from flax import linen as nn

    b, h, w = 2, 12, 16
    x = jnp.asarray(rng.standard_normal((b, h, w, 3)), jnp.float32)
    k1 = jnp.asarray(rng.standard_normal((3, 3, 3, 8)), jnp.float32) * 0.2
    b1 = jnp.asarray(rng.standard_normal(8), jnp.float32)
    k2 = jnp.asarray(rng.standard_normal((3, 3, 8, 8)), jnp.float32) * 0.2
    b2 = jnp.asarray(rng.standard_normal(8), jnp.float32)

    def conv(x, k, bias):
        return (
            jax.lax.conv_general_dilated(
                x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            + bias
        )

    y = jax.nn.relu(conv(x, k1, b1))
    y = conv(y, k2, b2)
    want = jax.nn.relu(nn.max_pool(y, (2, 2), (2, 2)))
    got = packed_stem_block(x, k1, b1, k2, b2)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_pack_shapes(rng):
    x = jnp.asarray(rng.standard_normal((1, 6, 8, 3)), jnp.float32)
    xp = pack_input(x)
    assert xp.shape == (1, 8, 5, 6)
    k = jnp.asarray(rng.standard_normal((3, 3, 3, 4)), jnp.float32)
    kp = pack_kernel(k)
    assert kp.shape == (3, 2, 6, 8)
    yp = jnp.asarray(rng.standard_normal((1, 6, 4, 8)), jnp.float32)
    assert repack_shifted(yp).shape == (1, 8, 5, 8)


def test_vgg16_packed_stem_matches_standard(rng):
    """Full backbone: packed_stem=True equals packed_stem=False with the SAME
    parameter tree (checkpoint interchangeability)."""
    x = jnp.asarray(rng.standard_normal((2, 32, 48, 3)) * 50 + 100, jnp.float32)
    std = VGG16(compute_dtype=jnp.float32, packed_stem=False)
    fast = VGG16(compute_dtype=jnp.float32, packed_stem=True)
    params = std.init(jax.random.key(0), x)
    # identical param trees
    params_fast = fast.init(jax.random.key(0), x)
    t1 = jax.tree_util.tree_structure(params)
    t2 = jax.tree_util.tree_structure(params_fast)
    assert t1 == t2

    f_std, _ = std.apply(params, x)
    f_fast, _ = fast.apply(params, x)
    np.testing.assert_allclose(np.asarray(f_fast), np.asarray(f_std), atol=2e-5)


def test_vgg16_packed_stem_odd_width_fallback(rng):
    # odd spatial dims: fall back to the standard block silently
    x = jnp.asarray(rng.standard_normal((1, 33, 47, 3)), jnp.float32)
    fast = VGG16(compute_dtype=jnp.float32, packed_stem=True)
    params = fast.init(jax.random.key(0), x)
    f, _ = fast.apply(params, x)
    assert f.shape[-1] == 512
