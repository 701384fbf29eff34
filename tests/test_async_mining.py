"""Async mining refresh (``TrainConfig.async_mining``).

The reference's refresh is a pipeline barrier — drain the queues, re-embed
the mining window, resume (reference train/train.py:1014-1018). The opt-in
async mode dispatches the refresh's device work at the boundary and keeps
training on the previous window while a worker thread lands the new one
(trainer._spawn_mining_refresh / MiningCache.refresh under its lock).
These tests pin the semantics: boundary-params pinning (async == sync
content), the synchronous fallbacks (first boundary of an epoch, streaming
PCA in play), worker error propagation, and a full training run.
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
from soft_contrastive_learning_tpu.train.trainer import Trainer


def _cfg(loss="triplet", reduction="none", **kw):
    defaults = dict(
        model=ModelConfig(
            vlad_cores=8, reduction=reduction, out_dim=16, image_height=64,
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
        async_mining=True, seed=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _source():
    return ToyCitySource(num_points=24, radius=30.0, img_h=64, img_w=80, seed=3)


def _cache_snapshot(cache):
    with cache._lock:
        return (
            None if cache._features is None else cache._features.copy(),
            None if cache._indices is None else cache._indices.copy(),
            None if cache._order is None else cache._order.copy(),
        )


@pytest.mark.slow
def test_async_mining_trains_and_refreshes(tmp_path):
    """Full epoch with async_mining=True: the first boundary runs sync (it
    defines the window for this epoch's meta), every later one async; the
    run completes with finite losses, a settled cache, and no live worker."""
    cfg = _cfg()
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    spawned, refreshed = [], []
    orig_spawn, orig_refresh = tr._spawn_mining_refresh, tr._mining_refresh

    def spy_spawn(epoch, step0, count, meta, anchors):
        spawned.append(step0)
        return orig_spawn(epoch, step0, count, meta, anchors)

    def spy_refresh(epoch, step, count, meta, anchors, **kw):
        refreshed.append(step)
        return orig_refresh(epoch, step, count, meta, anchors, **kw)

    tr._spawn_mining_refresh = spy_spawn
    tr._mining_refresh = spy_refresh
    tr.train_one_epoch(0)
    # 24 anchors, tpb=1, mining_step=6 -> boundaries 0,6,12,18
    assert refreshed == [0, 6, 12, 18]
    assert spawned == [6, 12, 18]  # step 0: no previous cache -> sync
    assert tr._mining_thread is None and tr._mining_error is None
    assert tr.mining_cache.ready
    losses = [r["value"] for r in tr.writers["local"].read_all() if r["tag"] == "loss"]
    assert losses and all(np.isfinite(losses))
    tr.close()


@pytest.mark.slow
def test_async_refresh_matches_sync_content(tmp_path):
    """Params pinning: an async refresh produces byte-identical cache content
    to a synchronous refresh run with the same boundary params."""
    cfg = _cfg()
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    meta = tr.source.epoch_meta(cfg.local_ref_set, 0)
    anchors = np.asarray(
        tr.source.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, 0), int
    )
    tr._ensure_image_pool(meta)

    tr._mining_refresh(0, 6, 1, meta, anchors)
    sync_feats, sync_idx, sync_order = _cache_snapshot(tr.mining_cache)

    tr.mining_cache.refresh(np.zeros((1, 1), np.float32), np.asarray([0]))
    tr._spawn_mining_refresh(0, 6, 1, meta, anchors)
    tr._join_mining()
    async_feats, async_idx, async_order = _cache_snapshot(tr.mining_cache)

    np.testing.assert_array_equal(sync_idx, async_idx)
    np.testing.assert_array_equal(sync_feats, async_feats)
    if sync_order is not None or async_order is not None:
        np.testing.assert_array_equal(sync_order, async_order)
    tr.close()


def test_async_worker_error_surfaces(tmp_path):
    """A worker failure must raise at the next join, not vanish."""
    cfg = _cfg()
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))

    def boom(*a, **kw):
        raise ValueError("synthetic refresh failure")

    tr._mining_refresh = boom
    tr._spawn_mining_refresh(0, 6, 1, {}, np.asarray([0]))
    with pytest.raises(RuntimeError, match="async mining refresh failed"):
        tr._join_mining()
    # unwind variant: logged, not raised, and the error slot is cleared
    tr._mining_refresh = boom
    tr._spawn_mining_refresh(0, 6, 1, {}, np.asarray([0]))
    tr._join_mining(raise_error=False)
    assert tr._mining_error is None and tr._mining_thread is None

    # cooperative cancel: a worker parked on the cancel event is aborted by
    # the unwind join (not an error), and the join does not hang
    import threading

    started = threading.Event()

    def slow(*a, cancel=None, **kw):
        started.set()
        assert cancel is not None
        cancel.wait(timeout=30)
        from soft_contrastive_learning_tpu.train.trainer import _MiningCancelled

        raise _MiningCancelled()

    tr._mining_refresh = slow
    tr._spawn_mining_refresh(0, 6, 1, {}, np.asarray([0]))
    assert started.wait(timeout=10)
    t0 = __import__("time").perf_counter()
    tr._join_mining(raise_error=False)
    assert __import__("time").perf_counter() - t0 < 10
    assert tr._mining_error is None and tr._mining_thread is None
    tr.close()


@pytest.mark.slow
def test_multihost_falls_back_to_barrier(tmp_path, monkeypatch):
    """process_count > 1 must force the synchronous refresh: a worker thread
    racing the main loop would make the cross-process collective enqueue
    order scheduler-dependent (SPMD deadlock hazard)."""
    import soft_contrastive_learning_tpu.train.trainer as trainer_mod

    cfg = _cfg()
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    spawned, refreshed = [], []
    tr._spawn_mining_refresh = lambda *a, **kw: spawned.append(a)
    tr._mining_refresh = lambda *a, **kw: refreshed.append(a)
    # step-0 eval/part saves lazily build orbax managers, which demand a
    # real distributed client under the patched process count — stub both
    tr._run_eval = lambda *a, **kw: None
    tr.ckpts.save = lambda *a, **kw: None
    # patch scoped to the epoch: orbax's close-time barriers also consult
    # jax.process_count and would demand a real distributed client
    with monkeypatch.context() as m:
        m.setattr(trainer_mod.jax, "process_count", lambda: 2)
        tr.train_one_epoch(0)
    assert spawned == []
    assert len(refreshed) == 4  # boundaries 0,6,12,18 all synchronous
    tr.close()


@pytest.mark.slow
def test_async_mining_with_fused_dispatch(tmp_path):
    """async_mining composes with K-step fused dispatch: the worker's embeds
    interleave with the scanned train-step groups in the device stream.

    Shapes are the 32x32/vlad-4 tiny regime: XLA:CPU compiles AND executes
    the scan-of-K conv train step orders of magnitude slower than K singles
    at the usual 64x80 test size (measured ~10 min compile + ~2 min/call on
    the 1-core host vs seconds for singles — a CPU-backend cliff; the real
    TPU runs K=16 at full flagship shape in 51 ms/step, docs/TRAINBENCH.md)."""
    cfg = _cfg(
        steps_per_dispatch=3,
        model=ModelConfig(
            vlad_cores=4, reduction="none", out_dim=16, image_height=32,
            image_width=32, compute_dtype="float32", use_pallas=False,
        ),
    )
    tr = Trainer(
        cfg,
        ToyCitySource(num_points=24, radius=30.0, img_h=32, img_w=32, seed=3),
        out_dir=str(tmp_path / "run"),
    )
    assert tr.train_step_scan is not None
    spawned = []
    orig_spawn = tr._spawn_mining_refresh
    tr._spawn_mining_refresh = (
        lambda *a: (spawned.append(a[1]), orig_spawn(*a))[1]
    )
    tr.train_one_epoch(0)
    assert spawned == [6, 12, 18]
    assert tr._mining_thread is None and tr._mining_error is None
    losses = [r["value"] for r in tr.writers["local"].read_all() if r["tag"] == "loss"]
    assert len(losses) == 24 and all(np.isfinite(losses))
    tr.close()


@pytest.mark.slow
def test_pca_path_stays_synchronous(tmp_path):
    """reduction='pca' keeps the reference barrier even with async_mining on
    (streaming-PCA update order is part of the training semantics)."""
    cfg = _cfg("triplet", reduction="pca")
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    spawned = []
    tr._spawn_mining_refresh = lambda *a, **kw: spawned.append(a)
    tr.train_one_epoch(0)
    assert spawned == []
    assert tr.pca is not None and tr.pca.initialized
    tr.close()
