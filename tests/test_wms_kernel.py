"""Fused wms Pallas kernel: interpret-mode parity with the XLA formulation."""

import jax
import jax.numpy as jnp
import pytest
import numpy as np

from soft_contrastive_learning_tpu.losses.ms import wms_loss
from soft_contrastive_learning_tpu.ops.pallas.wms_kernel import (
    wms_loss_fused,
    wms_loss_pallas,
)


def _data(rng, b=16, d=64):
    emb = jnp.asarray(rng.standard_normal((b, d)), jnp.float32)
    geo = jnp.abs(jnp.asarray(rng.standard_normal((b, b)), jnp.float32)) * 25
    geo = 0.5 * (geo + geo.T)
    geo = geo.at[jnp.arange(b), jnp.arange(b)].set(0.0)
    return geo, emb


def test_wms_pallas_matches_xla(rng):
    geo, emb = _data(rng)
    for mining in (True, False):
        got = float(
            wms_loss_pallas(geo, emb, 0.8, 15.0, ms_mining=mining, interpret=True)
        )
        want = float(
            wms_loss(geo, emb, 0.8, 15.0, ms_mining=mining,
                     wfunction="exp", sumfunction="ms")
        )
        np.testing.assert_allclose(got, want, rtol=1e-5)


@pytest.mark.slow
def test_wms_fused_gradients_match(rng):
    geo, emb = _data(rng, b=8, d=32)
    g_fused = jax.grad(lambda e: wms_loss_fused(geo, e, 0.8, 15.0), 0)(emb)
    g_xla = jax.grad(
        lambda e: wms_loss(geo, e, 0.8, 15.0, wfunction="exp", sumfunction="ms"),
        0,
    )(emb)
    np.testing.assert_allclose(np.asarray(g_fused), np.asarray(g_xla), atol=1e-5)
