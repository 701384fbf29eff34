"""Decoded-uint8 cache (data/decoded_cache.py): correctness vs the decode
path, idempotency, extension, fallback; AsyncScalarLogger ordering."""

import os

import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import (
    LossConfig, ModelConfig, TrainConfig, TupleConfig,
)
from soft_contrastive_learning_tpu.core.logging import AsyncScalarLogger
from soft_contrastive_learning_tpu.data.decoded_cache import (
    CachedDecodedSource, build_decoded_cache, cache_training_sets,
)
from soft_contrastive_learning_tpu.data.pipeline import (
    ToyCitySource, load_images_standard,
)


@pytest.fixture
def src():
    return ToyCitySource(num_points=24, radius=30.0, img_h=32, img_w=40, seed=3)


def _keys(meta, n=None):
    ks = list(zip(meta["date"], meta["folder"], meta["t"]))
    return ks if n is None else ks[:n]


def test_cache_matches_decode_path(tmp_path, src):
    cfg = TrainConfig(
        model=ModelConfig(vlad_cores=8, image_height=32, image_width=40),
        tuples=TupleConfig(), loss=LossConfig(name="wms"),
    )
    meta = src.epoch_meta("train_ref", 0)
    keys = _keys(meta, 6)
    cache_dir = str(tmp_path / "cache")
    build_decoded_cache(src, keys, 32, 40, True, cache_dir, log=lambda *_: None)

    cached_src = CachedDecodedSource(src, cache_dir)
    got = load_images_standard(cached_src, keys, cfg)
    want = load_images_standard(src, keys, cfg)
    assert got.dtype == np.uint8
    np.testing.assert_array_equal(got, want)


def test_cache_missing_key_falls_back(tmp_path, src):
    cfg = TrainConfig(
        model=ModelConfig(vlad_cores=8, image_height=32, image_width=40),
        tuples=TupleConfig(), loss=LossConfig(name="wms"),
    )
    meta = src.epoch_meta("train_ref", 0)
    keys = _keys(meta)
    cache_dir = str(tmp_path / "cache")
    build_decoded_cache(src, keys[:4], 32, 40, True, cache_dir, log=lambda *_: None)
    cached_src = CachedDecodedSource(src, cache_dir)
    got = load_images_standard(cached_src, keys[:8], cfg)  # 4 cached + 4 not
    want = load_images_standard(src, keys[:8], cfg)
    np.testing.assert_array_equal(got, want)


def test_cache_geometry_mismatch_returns_none(tmp_path, src):
    meta = src.epoch_meta("train_ref", 0)
    keys = _keys(meta, 4)
    cache_dir = str(tmp_path / "cache")
    build_decoded_cache(src, keys, 32, 40, True, cache_dir, log=lambda *_: None)
    cached_src = CachedDecodedSource(src, cache_dir)
    assert cached_src.load_images_normalized(keys, 64, 80, True) is None
    assert cached_src.load_images_normalized(keys, 32, 40, False) is None


def test_cache_idempotent_and_extends(tmp_path, src):
    meta = src.epoch_meta("train_ref", 0)
    keys = _keys(meta)
    cache_dir = str(tmp_path / "cache")
    side = build_decoded_cache(src, keys[:4], 32, 40, True, cache_dir,
                               log=lambda *_: None)
    mtime = os.path.getmtime(side)
    # same keys: untouched
    build_decoded_cache(src, keys[:4], 32, 40, True, cache_dir,
                        log=lambda *_: None)
    assert os.path.getmtime(side) == mtime
    # superset: extends, old rows still correct
    build_decoded_cache(src, keys[:8], 32, 40, True, cache_dir,
                        log=lambda *_: None)
    cached_src = CachedDecodedSource(src, cache_dir)
    got = cached_src.load_images_normalized(keys[:8], 32, 40, True)
    cfg = TrainConfig(
        model=ModelConfig(vlad_cores=8, image_height=32, image_width=40),
        tuples=TupleConfig(), loss=LossConfig(name="wms"),
    )
    want = load_images_standard(src, keys[:8], cfg)
    np.testing.assert_array_equal(got, want)


def test_cache_training_sets_covers_cluster_sets(tmp_path, src):
    cache_dir = str(tmp_path / "cache")
    cache_training_sets(
        src, ["train_ref", "test_ref"], 32, 40, True, cache_dir,
        cluster_sets=[("train_ref", 4)], log=lambda *_: None,
    )
    cached_src = CachedDecodedSource(src, cache_dir)
    cm = src.cluster_meta("train_ref", 4)
    got = cached_src.load_images_normalized(_keys(cm), 32, 40, True)
    assert got is not None and len(got) == len(cm["t"])


def test_source_delegation(tmp_path, src):
    cache_dir = str(tmp_path / "cache")
    build_decoded_cache(src, _keys(src.epoch_meta("train_ref", 0), 2),
                        32, 40, True, cache_dir, log=lambda *_: None)
    cached_src = CachedDecodedSource(src, cache_dir)
    # meta/anchor APIs pass through to the wrapped source
    assert cached_src.epoch_meta("train_ref", 1) == src.epoch_meta("train_ref", 1)
    np.testing.assert_array_equal(
        cached_src.anchor_indices("train_ref", 1, 0),
        src.anchor_indices("train_ref", 1, 0),
    )


# ------------------------------------------------------------ async logger
def test_async_scalar_logger_order_and_values():
    written = []
    log = AsyncScalarLogger(lambda step, vals: written.append((step, vals)),
                            max_chunk=4)
    for i in range(1, 11):
        log.submit(i, {"loss": np.float32(i * 0.5), "learning_rate": 1e-3})
    log.drain()
    assert [s for s, _ in written] == list(range(1, 11))
    assert written[3][1]["loss"] == pytest.approx(2.0)
    log.close()


def test_async_scalar_logger_surfaces_errors():
    def boom(step, vals):
        raise RuntimeError("sink failed")

    log = AsyncScalarLogger(boom)
    log.submit(1, {"loss": 1.0})
    with pytest.raises(RuntimeError, match="sink failed"):
        log.drain()
    log.close(drain=False)


def test_async_scalar_logger_fetch_stats_and_env_interval(monkeypatch):
    """fetch_count/fetch_seconds track worker-thread fetch activity, and
    SCL_SCALAR_FETCH_INTERVAL overrides the throttle (the bench's
    defer-to-drain measurement knob)."""
    monkeypatch.setenv("SCL_SCALAR_FETCH_INTERVAL", "3600")
    written = []
    log = AsyncScalarLogger(lambda step, vals: written.append((step, vals)))
    assert log._min_interval == 3600.0
    assert log.fetch_count == 0 and log.fetch_seconds == 0.0
    for i in range(6):
        log.submit(i, {"loss": np.float32(i)})
    log.drain()  # drain bypasses the throttle
    log.close()
    assert [s for s, _ in written] == list(range(6))
    assert log.fetch_count >= 1
    assert log.fetch_seconds >= 0.0


def test_async_scalar_logger_device_scalars():
    import jax.numpy as jnp

    written = []
    log = AsyncScalarLogger(lambda step, vals: written.append((step, vals)))
    for i in range(5):
        log.submit(i, {"loss": jnp.float32(i), "learning_rate": jnp.float32(0.1)})
    log.drain()
    log.close()
    assert [v["loss"] for _, v in written] == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_cache_empty_keys_is_noop(tmp_path, src):
    """No keys + no existing cache: the builder must be a no-op (np.memmap
    refuses zero-size mappings), and readers fall back to the decode path."""
    cache_dir = str(tmp_path / "cache")
    side = build_decoded_cache(src, [], 32, 40, True, cache_dir,
                               log=lambda *_: None)
    assert not os.path.exists(side)  # nothing written
    cached_src = CachedDecodedSource(src, cache_dir)
    assert cached_src.load_images_normalized(
        _keys(src.epoch_meta("train_ref", 0), 2), 32, 40, True
    ) is None  # falls back, no crash
