"""int8 quantized inference path: parity with the float model.

The quantized conv stack must preserve the retrieval geometry: descriptor
cosine vs the float path ~1 and identical top-k neighbors. On-chip the same
path measures 1.6-1.7x over bf16 end-to-end (PARITY.md "quantized
serving"); these tests pin correctness on any backend.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.models.quant import (
    CONV_NAMES,
    QuantizedEmbedder,
    calibrate_scales,
    load_scales,
    quantized_embed,
    save_scales,
)


def _setup(reduction="none", vlad=8, hw=(48, 64)):
    cfg = ModelConfig(
        vlad_cores=vlad,
        reduction=reduction,
        image_height=hw[0],
        image_width=hw[1],
        compute_dtype="float32",
        use_pallas=False,
        out_dim=16,
    )
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((6, hw[0], hw[1], 3), np.float32) * 255.0)
    return cfg, model, params, x


def test_calibration_covers_all_convs():
    cfg, model, params, x = _setup()
    scales = calibrate_scales(params, x)
    assert set(scales) == set(CONV_NAMES)
    assert all(s > 0 for s in scales.values())


@pytest.mark.slow
def test_descriptor_cosine_parity():
    cfg, model, params, x = _setup()
    ref, ref_full = model.apply({"params": params}, x)
    scales = calibrate_scales(params, x)
    out, full = jax.jit(
        lambda p, a: quantized_embed(cfg, p, scales, a)
    )(params, x)
    ref, out = np.asarray(ref, np.float32), np.asarray(out, np.float32)
    cos = np.sum(ref * out, -1) / (
        np.linalg.norm(ref, axis=-1) * np.linalg.norm(out, axis=-1)
    )
    assert cos.min() > 0.999, cos
    assert out.shape == ref.shape


@pytest.mark.slow
def test_topk_retrieval_parity():
    """The quantized embeddings retrieve the same nearest neighbors."""
    cfg, model, params, _ = _setup()
    rng = np.random.default_rng(1)
    refs = jnp.asarray(rng.random((12, 48, 64, 3), np.float32) * 255.0)
    queries = jnp.asarray(rng.random((4, 48, 64, 3), np.float32) * 255.0)
    emb = QuantizedEmbedder(cfg, params, refs)

    def nn_idx(q, r):
        d = ((q[:, None] - r[None]) ** 2).sum(-1)
        return np.argsort(d, axis=1)[:, :3]

    f_ref = np.asarray(model.apply({"params": params}, refs)[0], np.float32)
    f_q = np.asarray(model.apply({"params": params}, queries)[0], np.float32)
    q_ref = np.asarray(emb(refs), np.float32)
    q_q = np.asarray(emb(queries), np.float32)
    np.testing.assert_array_equal(nn_idx(f_q, f_ref)[:, 0], nn_idx(q_q, q_ref)[:, 0])


@pytest.mark.slow
def test_grayscale_and_spp_and_fc_variants():
    # spp needs a conv5_3 map of at least 4x4 for the level-3 pyramid
    for reduction, vlad, hw in (("spp", 0, (96, 128)), ("1fc", 8, (48, 64))):
        cfg, model, params, x = _setup(reduction=reduction, vlad=vlad, hw=hw)
        scales = calibrate_scales(params, x)
        out, _ = quantized_embed(cfg, params, scales, x)
        ref, _ = model.apply({"params": params}, x)
        assert out.shape == ref.shape
        err = float(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)).max())
        rel = err / (float(jnp.abs(ref).max()) + 1e-9)
        assert rel < 0.05, (reduction, rel)
    # grayscale input promotion
    cfg, model, params, _ = _setup()
    g = jnp.asarray(np.random.default_rng(2).random((2, 48, 64, 1), np.float32) * 255.0)
    scales = calibrate_scales(params, g)
    out, _ = quantized_embed(cfg, params, scales, g)
    ref, _ = model.apply({"params": params}, g)
    cos = float(
        (out[0] @ ref[0]) / (jnp.linalg.norm(out[0]) * jnp.linalg.norm(ref[0]))
    )
    assert cos > 0.999


def test_scales_roundtrip(tmp_path):
    cfg, model, params, x = _setup()
    scales = calibrate_scales(params, x)
    p = str(tmp_path / "scales.json")
    save_scales(scales, p)
    assert load_scales(p) == pytest.approx(scales)


@pytest.mark.slow
def test_packed_stem_bit_exact():
    """The width-packed int8 stem is pure reindexing of the same int8
    values + the same int32 sums + the same dequant scalars, so it must be
    BIT-identical to the direct stack — not just close."""
    import dataclasses

    from soft_contrastive_learning_tpu.models.quant import quantized_conv_stack

    cfg, model, params, x = _setup(hw=(48, 64))  # H even, W % 4 == 0
    scales = calibrate_scales(params, x)
    direct = jax.jit(
        lambda p, a: quantized_conv_stack(p["vgg16"], scales, a)
    )(params, x)
    packed = jax.jit(
        lambda p, a: quantized_conv_stack(p["vgg16"], scales, a, packed_stem=True)
    )(params, x)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(direct))

    # and through the full embed via the config flag
    cfg_p = dataclasses.replace(cfg, packed_stem=True)
    e_direct = jax.jit(lambda p, a: quantized_embed(cfg, p, scales, a))(params, x)
    e_packed = jax.jit(lambda p, a: quantized_embed(cfg_p, p, scales, a))(params, x)
    np.testing.assert_array_equal(np.asarray(e_packed[0]), np.asarray(e_direct[0]))


@pytest.mark.slow
def test_packed_stem_odd_width_fallback():
    """W % 4 != 0 falls back to the direct stack (same result, no crash)."""
    from soft_contrastive_learning_tpu.models.quant import quantized_conv_stack

    cfg, model, params, x = _setup(hw=(48, 66))
    scales = calibrate_scales(params, x)
    direct = quantized_conv_stack(params["vgg16"], scales, x)
    packed = quantized_conv_stack(params["vgg16"], scales, x, packed_stem=True)
    np.testing.assert_array_equal(np.asarray(packed), np.asarray(direct))


def test_calibration_zero_activation_guard():
    """A dead layer (all-zero activations on the calibration batch) must
    calibrate to scale 1.0 — not 0.0, which would divide by zero inside
    _requant at trace time (mirrors _quantize_weight's s_safe guard)."""
    cfg, model, params, x = _setup()
    # zero conv1_2's kernel AND bias: after its ReLU the activation map is
    # identically zero, so conv2_1's calibrated input absmax is 0
    blk1 = dict(params["vgg16"]["block1"])
    blk1["conv1_2"] = {
        "kernel": jnp.zeros_like(blk1["conv1_2"]["kernel"]),
        "bias": jnp.zeros_like(blk1["conv1_2"]["bias"]),
    }
    vgg = dict(params["vgg16"])
    vgg["block1"] = blk1
    params = dict(params)
    params["vgg16"] = vgg

    scales = calibrate_scales(params, x)
    assert scales["block2/conv2_1"] == 1.0
    assert all(np.isfinite(s) and s > 0 for s in scales.values())

    # the quantized stack must trace and produce finite values (zero input
    # quantizes to zeros; downstream convs emit their biases)
    from soft_contrastive_learning_tpu.models.quant import quantized_conv_stack

    out = jax.jit(
        lambda p, a: quantized_conv_stack(p["vgg16"], scales, a)
    )(params, x)
    assert np.isfinite(np.asarray(out)).all()
