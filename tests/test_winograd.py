"""Winograd F(2x2,3x3) convolution: XLA reference and fused Pallas kernel.

The XLA reference (ops/winograd.py) is checked in fp32 against
jax.lax.conv_general_dilated to float tolerance — the transform matrices are
exact in binary floating point. The Pallas kernel (interpret mode here; the
on-chip run is exercised by the bench/parity paths) is checked against the
bf16 direct conv at bf16-rounding tolerance, for even/odd spatial sizes,
multi-row grids, image groups, and the fused-ReLU and custom-vjp paths.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_contrastive_learning_tpu.ops.winograd import (
    weight_transform,
    winograd_conv,
)
from soft_contrastive_learning_tpu.ops.pallas.winograd_kernel import (
    winograd_conv_pallas,
    winograd_conv as winograd_conv_op,
)


def _direct(x, k, b, bf16=False):
    dt = jnp.bfloat16 if bf16 else jnp.float32
    y = jax.lax.conv_general_dilated(
        x.astype(dt), k.astype(dt), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32,
    )
    return y + b


def test_weight_transform_reconstructs_identity(rng):
    # G @ g @ G^T applied to a delta filter reproduces the closed-form U.
    k = jnp.asarray(rng.standard_normal((3, 3, 2, 3)), jnp.float32)
    u = weight_transform(k)
    assert u.shape == (4, 4, 2, 3)
    # direct check of one entry: U[1,1] = mean-ish combination
    g = np.array([[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]])
    expect = np.einsum("ai,bj,ijcf->abcf", g, g, np.asarray(k))
    np.testing.assert_allclose(np.asarray(u), expect, atol=1e-6)


@pytest.mark.parametrize("hw", [(8, 8), (11, 15), (22, 30), (9, 9)])
def test_xla_reference_matches_direct_fp32(rng, hw):
    h, w = hw
    x = jnp.asarray(rng.standard_normal((2, h, w, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 8, 16)), jnp.float32) * 0.1
    b = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    ref = _direct(x, k, b)
    got = winograd_conv(x, k, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


@pytest.mark.parametrize(
    "shape",
    [
        (2, 8, 8, 128, 128),  # even, single c-chunk
        (2, 11, 15, 256, 128),  # odd H and W (padding + crop)
        (4, 22, 30, 128, 256),  # multi-image groups
        (2, 45, 60, 128, 64),  # f < 128 output
    ],
)
def test_pallas_kernel_matches_direct_bf16(rng, shape):
    bsz, h, w, c, f = shape
    x = jnp.asarray(rng.standard_normal((bsz, h, w, c)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)), jnp.float32) * 0.05
    b = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    ref = _direct(x, k, b, bf16=True)
    got = winograd_conv_pallas(x, k, b, out_dtype=jnp.float32, interpret=True)
    scale = float(jnp.max(jnp.abs(ref)))
    rel = float(jnp.max(jnp.abs(got - ref))) / scale
    assert rel < 0.02, rel  # bf16-rounding scale


def test_pallas_kernel_fused_relu(rng):
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 128)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 128)), jnp.float32) * 0.05
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    got = winograd_conv_pallas(x, k, b, relu=True, out_dtype=jnp.float32,
                               interpret=True)
    assert float(jnp.min(got)) >= 0.0
    ref = jnp.maximum(_direct(x, k, b, bf16=True), 0.0)
    scale = float(jnp.max(jnp.abs(ref))) + 1e-6
    assert float(jnp.max(jnp.abs(got - ref))) / scale < 0.02


def test_custom_vjp_gradients_match_direct(rng):
    """winograd_conv's backward must equal the direct conv's gradients."""
    x = jnp.asarray(rng.standard_normal((1, 8, 8, 128)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, 128, 128)), jnp.float32) * 0.05
    b = jnp.asarray(rng.standard_normal((128,)), jnp.float32)

    def loss_w(kk, bb):
        return jnp.sum(winograd_conv_op(x, kk, bb, True).astype(jnp.float32) ** 2)

    def loss_d(kk, bb):
        y = jax.lax.conv_general_dilated(
            x, kk.astype(x.dtype), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bb.astype(x.dtype)
        y = jnp.maximum(y, jnp.zeros((), x.dtype))
        return jnp.sum(y.astype(jnp.float32) ** 2)

    gw = jax.grad(loss_w, argnums=(0, 1))(k, b)
    gd = jax.grad(loss_d, argnums=(0, 1))(k, b)
    # The vjp re-derives from the direct formulation, but the cotangent comes
    # from the (slightly different) winograd forward — compare loosely.
    for a, bb_ in zip(gw, gd):
        na = np.asarray(a, np.float32)
        nb = np.asarray(bb_, np.float32)
        denom = np.maximum(np.abs(nb).max(), 1e-3)
        assert np.max(np.abs(na - nb)) / denom < 0.05


def test_vgg16_winograd_flag_matches_standard(rng):
    """EmbeddingNet with winograd=True reuses the same checkpoint tree and
    matches the standard model's descriptor."""
    from soft_contrastive_learning_tpu.core.config import ModelConfig
    from soft_contrastive_learning_tpu.models.model import create_model, init_params

    cfg = ModelConfig(
        vlad_cores=4, reduction="none", image_height=32, image_width=32,
        compute_dtype="float32", use_pallas=False,
    )
    cfg_w = ModelConfig(
        vlad_cores=4, reduction="none", image_height=32, image_width=32,
        compute_dtype="float32", use_pallas=False, winograd=True,
    )
    params = init_params(cfg, jax.random.key(0))
    x = jnp.asarray(rng.random((2, 32, 32, 3)) * 255.0, jnp.float32)
    out_s, _ = create_model(cfg).apply({"params": params}, x)
    out_w, _ = create_model(cfg_w).apply({"params": params}, x)
    # descriptors are unit-normalized; winograd path runs bf16 matmuls
    assert np.max(np.abs(np.asarray(out_s) - np.asarray(out_w))) < 0.05
    cos = float(jnp.sum(out_s * out_w, axis=-1).min())
    assert cos > 0.999, cos
