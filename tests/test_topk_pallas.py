"""Pallas streaming top-k (ops/pallas/topk_kernel.py): exact agreement with
sklearn KDTree / the XLA paths, in interpret mode on CPU."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from soft_contrastive_learning_tpu.ops.pallas.topk_kernel import topk_l2_pallas
from soft_contrastive_learning_tpu.ops.topk import topk_l2, topk_l2_streamed


@pytest.mark.parametrize(
    "q_n,r_n,d,k,tile",
    [
        (6, 100, 16, 5, 32),  # multi-tile
        (3, 33, 8, 7, 16),  # ragged last tile
        (5, 50, 12, 25, 64),  # k > tile fraction, single+ tiles
        (1, 200, 4, 1, 64),  # k=1
    ],
)
def test_matches_sklearn(rng, q_n, r_n, d, k, tile):
    from sklearn.neighbors import KDTree

    q = rng.standard_normal((q_n, d)).astype(np.float32)
    r = rng.standard_normal((r_n, d)).astype(np.float32)
    dist, idx = topk_l2_pallas(jnp.asarray(q), jnp.asarray(r), k, tile=tile,
                               interpret=True)
    d_ref, i_ref = KDTree(r).query(q, k=k)
    np.testing.assert_array_equal(np.asarray(idx), i_ref)
    np.testing.assert_allclose(np.asarray(dist), d_ref, atol=1e-4)


def test_fewer_refs_than_k(rng):
    q = rng.standard_normal((4, 8)).astype(np.float32)
    r = rng.standard_normal((10, 8)).astype(np.float32)
    dist, idx = topk_l2_pallas(jnp.asarray(q), jnp.asarray(r), 12, tile=16,
                               interpret=True)
    assert dist.shape == (4, 12) and idx.shape == (4, 12)
    d_dense, i_dense = topk_l2(jnp.asarray(q), jnp.asarray(r), 10)
    np.testing.assert_array_equal(np.asarray(idx)[:, :10], np.asarray(i_dense))
    assert np.all(np.asarray(idx)[:, 10:] == -1)
    assert np.all(np.isinf(np.asarray(dist)[:, 10:]))


def test_streamed_dispatcher_cpu_fallback(rng):
    """Off-TPU the dispatcher must route to the scan-tiled implementation
    and agree with the dense path."""
    q = jnp.asarray(rng.standard_normal((4, 8)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((300, 8)), jnp.float32)
    d1, i1 = topk_l2_streamed(q, r, 6)
    d2, i2 = topk_l2(q, r, 6)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)


def test_duplicate_rows_tie_break(rng):
    """Exact duplicate reference rows: smallest index wins, like lax.top_k."""
    base = rng.standard_normal((5, 8)).astype(np.float32)
    r = np.concatenate([base, base])  # rows i and i+5 identical
    q = base[:2] + 1e-3
    _, idx = topk_l2_pallas(jnp.asarray(q), jnp.asarray(r), 2, tile=8,
                            interpret=True)
    idx = np.asarray(idx)
    # the duplicate pair (j, j+5) must appear with the low index first
    for row in range(2):
        assert idx[row, 0] == row and idx[row, 1] == row + 5


def test_stream_tile_fit_budget():
    from soft_contrastive_learning_tpu.ops.topk import _stream_tile_fit

    # 512-D descriptors: a useful (>=1024) tile fits alongside the queries
    assert _stream_tile_fit(512, 256) >= 1024
    # 32768-D raw descriptors: no tile fits -> dispatcher must fall back
    assert _stream_tile_fit(32768, 512) == 0
    # 4096-D (largest PCA sweep dim): a reduced tile still fits
    fit = _stream_tile_fit(4096, 512)
    assert fit == 0 or fit % 512 == 0


def test_tb_reexport_does_not_duplicate(tmp_path):
    from soft_contrastive_learning_tpu.core import tb_export
    from soft_contrastive_learning_tpu.core.logging import MetricsWriter

    mw = MetricsWriter(str(tmp_path), role="local")
    mw.scalar("loss", 1.0, 0)
    tb_export.export_run(str(tmp_path))
    tb_export.export_run(str(tmp_path))  # re-export must replace, not append
    d = os.path.join(str(tmp_path), "tb", "local")
    files = [f for f in os.listdir(d) if f.startswith("events.out.tfevents.")]
    assert len(files) == 1


def test_streamed_chunked_query_path(rng):
    """The dispatcher's query-chunking (Q > 256) concatenates per-chunk
    results in order; forced through the kernel in interpret mode on CPU."""
    q = jnp.asarray(rng.standard_normal((300, 64)), jnp.float32)
    r = jnp.asarray(rng.standard_normal((1000, 64)), jnp.float32)
    d1, i1 = topk_l2_streamed(q, r, 5, _force_interpret=True)
    d2, i2 = topk_l2(q, r, 5)
    assert i1.shape == (300, 5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-4)
