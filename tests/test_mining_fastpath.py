"""Order-only mining refresh (the relay-friendly fast path).

The sampler consumes nothing from the mining cache but ``sorted_neighbors``
(sampling/tuples.py:107-108), so when no host-side state needs the embedded
window (no streaming PCA, loss-PCA already initialized) the refresh keeps the
features in HBM and ships only the (C, C) int32 neighbor order to the host —
~30x fewer bytes than the f32 features at flagship width (reference refresh
semantics: train/train.py:1012-1068). These tests pin: the cache's order-only
mode, the trainer engaging/leaving the fast path depending on host-state
needs, and fast==slow equality of the resulting sampler answers.
"""

import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import (
    LossConfig,
    ModelConfig,
    TrainConfig,
    TupleConfig,
)
from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
from soft_contrastive_learning_tpu.sampling.mining import MiningCache, neighbor_order
from soft_contrastive_learning_tpu.train.trainer import Trainer


def test_cache_order_only_refresh():
    rng = np.random.default_rng(7)
    feats = rng.standard_normal((12, 9)).astype(np.float32)
    idx = np.arange(200, 212)
    order = np.asarray(neighbor_order(feats))

    full = MiningCache()
    full.refresh(feats, idx, order=order)
    lean = MiningCache()
    lean.refresh(None, idx, order=order)

    assert lean.ready
    for q in (200, 205, 211):
        np.testing.assert_array_equal(
            lean.sorted_neighbors(q), full.sorted_neighbors(q)
        )
    assert lean.sorted_neighbors(999) is None  # uncached index

    with pytest.raises(ValueError):
        MiningCache().refresh(None, idx)  # neither features nor order


def test_cache_not_ready_without_content():
    cache = MiningCache()
    assert not cache.ready
    assert cache.sorted_neighbors(0) is None


def _cfg(loss="triplet", **kw):
    defaults = dict(
        model=ModelConfig(
            vlad_cores=8, reduction="none", out_dim=16, image_height=64,
            image_width=80, compute_dtype="float32", use_pallas=False,
        ),
        tuples=TupleConfig(
            positives_per_tuple=3, negatives_per_tuple=3,
            hard_positives_per_tuple=1, hard_negatives_per_tuple=1,
        ),
        loss=LossConfig(name=loss, loss_dim=8),
        tuples_per_batch=1, max_epoch=1, base_lr=1e-4,
        mining_step=6, mining_cache_size=10,
        eval_step=10**9, save_step=10**9, num_eval_queries=4, eval_ref_r=4,
        seed=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _snapshot(cache):
    with cache._lock:
        return (
            None if cache._features is None else cache._features.copy(),
            cache._indices.copy(),
            None if cache._order is None else cache._order.copy(),
        )


class _DummyLossPCA:
    """Stands in for an uninitialized incremental-loss PCA: its presence must
    force the slow (host-features) refresh until it initializes."""

    def __init__(self):
        self.initialized = False
        self.init_feats = None

    def init(self, feats):
        self.init_feats = np.asarray(feats)
        self.initialized = True


@pytest.mark.slow
def test_trainer_fast_path_engages_and_matches_slow(tmp_path):
    cfg = _cfg()
    src = ToyCitySource(num_points=24, radius=30.0, img_h=64, img_w=80, seed=3)
    tr = Trainer(cfg, src, out_dir=str(tmp_path / "run"))
    meta = tr.source.epoch_meta(cfg.local_ref_set, 0)
    anchors = np.asarray(
        tr.source.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, 0), int
    )
    tr._ensure_image_pool(meta)

    # triplet / reduction=none / no loss-PCA -> order-only fast path
    tr._mining_refresh(0, 6, 1, meta, anchors)
    fast_feats, fast_idx, fast_order = _snapshot(tr.mining_cache)
    assert fast_feats is None and fast_order is not None
    assert tr.mining_cache.ready
    fast_answers = {int(i): tr.mining_cache.sorted_neighbors(int(i))
                    for i in fast_idx[:4]}

    # an uninitialized loss-PCA needs the host features -> slow path; same
    # params, same window => identical order and identical sampler answers
    tr.loss_pca = _DummyLossPCA()
    tr._mining_refresh(0, 6, 1, meta, anchors)
    slow_feats, slow_idx, slow_order = _snapshot(tr.mining_cache)
    assert slow_feats is not None and tr.loss_pca.initialized
    assert tr.loss_pca.init_feats.shape == slow_feats.shape
    np.testing.assert_array_equal(fast_idx, slow_idx)
    np.testing.assert_array_equal(fast_order, slow_order)
    for q, want in fast_answers.items():
        np.testing.assert_array_equal(tr.mining_cache.sorted_neighbors(q), want)

    # once the loss-PCA is initialized the fast path re-engages
    tr._mining_refresh(0, 6, 1, meta, anchors)
    feats3, _, order3 = _snapshot(tr.mining_cache)
    assert feats3 is None
    np.testing.assert_array_equal(order3, fast_order)
    tr.close()


@pytest.mark.slow
def test_refresh_window_is_static_shape_at_epoch_tail(tmp_path):
    """len(mine_idx) must not depend on how many anchors remain: a shrunken
    tail window would hand the jitted (C, C) neighbor-order a fresh shape —
    a full remote recompile per distinct tail on TPU. The rolling window is
    extended to keep the cache size fixed."""
    cfg = _cfg()
    src = ToyCitySource(num_points=24, radius=30.0, img_h=64, img_w=80, seed=3)
    tr = Trainer(cfg, src, out_dir=str(tmp_path / "run"))
    meta = tr.source.epoch_meta(cfg.local_ref_set, 0)
    anchors = np.asarray(
        tr.source.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, 0), int
    )[:20]  # 20 anchors, mining_step=6 -> tail at step 18 has only 2 left
    tr._ensure_image_pool(meta)
    want = cfg.mining_cache_size + cfg.mining_step

    tr._mining_refresh(0, 18, 0, meta, anchors)
    _, tail_idx, tail_order = _snapshot(tr.mining_cache)
    assert len(tail_idx) == want and tail_order.shape == (want, want)
    # the 2 remaining anchors are still in the window
    assert set(anchors[18:]).issubset(set(tail_idx))

    tr._mining_refresh(0, 0, 0, meta, anchors)
    _, full_idx, full_order = _snapshot(tr.mining_cache)
    assert len(full_idx) == want and full_order.shape == (want, want)
    tr.close()


@pytest.mark.slow
def test_device_only_extraction_is_float32_under_bf16(tmp_path):
    """spp / flattened-map configs with bf16 compute emit bf16 embeddings;
    device_only extraction must cast to float32 before any sum-of-squares
    distance math (bf16 accumulation over thousands of dims corrupts the
    neighbor ranking the old host path got for free via astype)."""
    import jax.numpy as jnp

    cfg = _cfg(model=ModelConfig(
        vlad_cores=8, reduction="spp", out_dim=16, image_height=64,
        image_width=80, compute_dtype="bfloat16", use_pallas=False,
    ))
    src = ToyCitySource(num_points=24, radius=30.0, img_h=64, img_w=80, seed=3)
    tr = Trainer(cfg, src, out_dir=str(tmp_path / "run"))
    meta = tr.source.epoch_meta(cfg.local_ref_set, 0)
    tr._ensure_image_pool(meta)
    dev = tr.extract_features(meta, np.arange(5), device_only=True)
    assert dev.dtype == jnp.float32
    assert dev.shape[0] == 5  # padding truncated inside extract_features
    host = tr.extract_features(meta, np.arange(5))
    np.testing.assert_allclose(np.asarray(dev), host, rtol=0, atol=0)
    tr.close()


@pytest.mark.slow
def test_fast_path_host_fallback_on_device_order_failure(tmp_path):
    """If the device neighbor-order computation fails on an order-only
    refresh, the trainer must still land a queryable cache (host features
    fetched after the fact, matvec fallback)."""
    cfg = _cfg()
    src = ToyCitySource(num_points=24, radius=30.0, img_h=64, img_w=80, seed=3)
    tr = Trainer(cfg, src, out_dir=str(tmp_path / "run"))
    meta = tr.source.epoch_meta(cfg.local_ref_set, 0)
    anchors = np.asarray(
        tr.source.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, 0), int
    )
    tr._ensure_image_pool(meta)

    def boom(_):
        raise RuntimeError("synthetic device failure")

    tr._neighbor_order = boom
    tr._mining_refresh(0, 6, 1, meta, anchors)
    feats, idx, order = _snapshot(tr.mining_cache)
    assert order is None and feats is not None
    assert len(feats) == len(idx)
    assert tr.mining_cache.ready
    # matvec fallback answers: a permutation of the cached indices with the
    # queried anchor nearest to itself (exact order is fp-formulation
    # dependent, so only the structure is pinned here)
    for q in idx[:3]:
        got = tr.mining_cache.sorted_neighbors(int(q))
        assert got is not None and len(got) == len(idx)
        np.testing.assert_array_equal(np.sort(got), np.sort(idx))
        assert got[0] == q
    tr.close()
