"""Model tests: shapes, normalization invariants, NetVLAD math, Pallas parity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.heads import (
    apply_pca_projection,
    spatial_pyramid_pool,
)
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.models.netvlad import vlad_aggregate
from soft_contrastive_learning_tpu.models.vgg16 import VGG16, l2_normalize


def _cfg(**kw):
    base = dict(compute_dtype="float32", use_pallas=False)
    base.update(kw)
    return ModelConfig(**base)


def test_vgg16_map_shape_and_norm():
    model = VGG16(compute_dtype=jnp.float32)
    x = jnp.ones((2, 180, 240, 3))
    params = model.init(jax.random.key(0), x)
    feats, grad_in = model.apply(params, x)
    # 4 pools of stride 2: 180/16=11 (floor), 240/16=15.
    assert feats.shape == (2, 11, 15, 512)
    assert grad_in.shape == (2, 11, 15, 512)
    norms = jnp.linalg.norm(feats, axis=-1)
    # channel-L2-normalized (allow zero rows from relu dead zones)
    ok = (jnp.abs(norms - 1.0) < 1e-4) | (norms < 1e-4)
    assert bool(jnp.all(ok))


def test_vgg16_grayscale_input():
    model = VGG16(compute_dtype=jnp.float32)
    x = jnp.ones((1, 64, 64, 1))
    params = model.init(jax.random.key(0), x)
    feats, _ = model.apply(params, x)
    assert feats.shape == (1, 4, 4, 512)


def test_netvlad_descriptor():
    cfg = _cfg(vlad_cores=64, reduction="none")
    model = create_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, 96, 128, 3)), jnp.float32)
    params = init_params(cfg, jax.random.key(1))
    out, full = model.apply({"params": params}, x)
    assert out.shape == (2, 64 * 512)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(full))


def test_vlad_aggregate_matches_naive():
    """The refactored matmul+rank-1 form equals the naive residual sum."""
    rng = np.random.default_rng(0)
    b, n, d, k = 2, 7, 6, 4
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, n, k)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((d, k)), jnp.float32)

    got = vlad_aggregate(x, s, c)

    # Naive reference semantics (netvlad_tf_open layout, + convention),
    # computed in float64 to isolate the algebra from summation-order noise.
    a = np.asarray(jax.nn.softmax(s, axis=-1), np.float64)  # (b,n,k)
    xs = np.asarray(x, np.float64)
    cs = np.asarray(c, np.float64)
    v = (xs[:, :, :, None] + cs[None, None, :, :]) * a[:, :, None, :]  # (b,n,d,k)
    v = v.sum(axis=1)  # (b,d,k)

    # 1) raw aggregation algebra: matmul + rank-1 form == naive residual sum
    agg = np.einsum("bnk,bnd->bkd", a, xs) + a.sum(axis=1)[:, :, None] * cs.T[None]
    np.testing.assert_allclose(agg, np.transpose(v, (0, 2, 1)), atol=1e-6)

    # 2) full normalized descriptor (intra-norm amplifies near-zero rows,
    #    so float32 reordering noise allows a looser tolerance)
    v = np.transpose(v, (0, 2, 1))  # (b,k,d)
    v = v / np.sqrt((v**2).sum(-1, keepdims=True) + 1e-12)
    v = np.transpose(v, (0, 2, 1)).reshape(b, -1)  # d-major flatten
    want = v / np.sqrt((v**2).sum(-1, keepdims=True) + 1e-12)
    np.testing.assert_allclose(np.asarray(got), want, atol=2e-3)


def test_vlad_pallas_interpret_matches_xla():
    from soft_contrastive_learning_tpu.ops.pallas.netvlad_kernel import (
        vlad_aggregate_pallas,
    )

    rng = np.random.default_rng(1)
    b, n, d, k = 2, 24, 128, 8
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, n, k)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((d, k)), jnp.float32)
    got = vlad_aggregate_pallas(x, s, c, interpret=True)
    want = vlad_aggregate(x, s, c)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_vlad_fused_gradients_match():
    from soft_contrastive_learning_tpu.ops.pallas.netvlad_kernel import (
        vlad_aggregate_fused,
    )

    rng = np.random.default_rng(2)
    b, n, d, k = 1, 16, 32, 4
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)
    s = jnp.asarray(rng.standard_normal((b, n, k)), jnp.float32)
    c = jnp.asarray(rng.standard_normal((d, k)), jnp.float32)

    g_fused = jax.grad(lambda *a: vlad_aggregate_fused(*a).sum(), argnums=(0, 1, 2))(x, s, c)
    g_xla = jax.grad(lambda *a: vlad_aggregate(*a).sum(), argnums=(0, 1, 2))(x, s, c)
    for gf, gx in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), atol=1e-4)


def test_spp_head():
    cfg = _cfg(vlad_cores=0, reduction="spp", spp_levels=3)
    model = create_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).random((2, 180, 240, 3)), jnp.float32)
    params = init_params(cfg, jax.random.key(0))
    out, full = model.apply({"params": params}, x)
    assert out.shape == (2, 21 * 512)


def test_spp_level_one_is_global_max():
    fm = jnp.asarray(np.random.default_rng(0).random((2, 11, 15, 8)), jnp.float32)
    out = spatial_pyramid_pool(fm, levels=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(fm.max(axis=(1, 2))), rtol=1e-6)


@pytest.mark.parametrize(
    "reduction,n_out",
    [("1fc", 256),
     # 2fc/3fc re-trace the full backbone+head twice each (~50 s on the
     # 1-core host) — slow lane; 1fc keeps head coverage in the fast lane
     pytest.param("2fc", 256, marks=pytest.mark.slow),
     pytest.param("3fc", 256, marks=pytest.mark.slow)],
)
def test_fc_heads(reduction, n_out):
    cfg = _cfg(vlad_cores=64, reduction=reduction, out_dim=n_out)
    model = create_model(cfg)
    x = jnp.ones((2, 64, 64, 3))
    params = init_params(cfg, jax.random.key(0))
    out, full = model.apply({"params": params}, x)
    assert out.shape == (2, n_out)
    assert full.shape == (2, 64 * 512)
    # train=True requires a dropout rng for 2fc/3fc
    out_t, _ = model.apply(
        {"params": params}, x, train=True, rngs={"dropout": jax.random.key(1)}
    )
    assert out_t.shape == (2, n_out)


def test_pca_projection():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((5, 16)), jnp.float32)
    comps = jnp.asarray(rng.standard_normal((4, 16)), jnp.float32)
    mean = jnp.asarray(rng.standard_normal((16,)), jnp.float32)
    var = jnp.abs(jnp.asarray(rng.standard_normal((4,)), jnp.float32)) + 0.5
    got = apply_pca_projection(x, comps, mean, var)
    want = ((np.asarray(x) - np.asarray(mean)) @ np.asarray(comps).T) / np.sqrt(np.asarray(var))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_l2_normalize_zero_safe():
    x = jnp.zeros((3, 4))
    out = l2_normalize(x)
    assert bool(jnp.all(jnp.isfinite(out)))
