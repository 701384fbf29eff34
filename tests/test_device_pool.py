"""Device-resident image pool (data/device_pool.py + pooled train step):
pooled and host-fed steps must be numerically identical."""

import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import (
    LossConfig, ModelConfig, TrainConfig, TupleConfig,
)
from soft_contrastive_learning_tpu.data.device_pool import (
    DeviceImagePool, build_pool,
)
from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
from soft_contrastive_learning_tpu.losses.registry import build_loss
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.sampling.mining import (
    MiningCache, neighbor_order,
)
from soft_contrastive_learning_tpu.train.step import (
    build_embed_pool_step, build_embed_step, build_train_step,
    init_train_state,
)


@pytest.fixture(scope="module")
def tiny_cfg():
    return TrainConfig(
        model=ModelConfig(vlad_cores=4, reduction="none", image_height=32,
                          image_width=32, compute_dtype="float32",
                          use_pallas=False),
        tuples=TupleConfig(positives_per_tuple=2, negatives_per_tuple=2),
        loss=LossConfig(name="wms"),
        tuples_per_batch=1,
        seed=0,
    )


def _setup(tiny_cfg):
    import jax

    model = create_model(tiny_cfg.model)
    params = init_params(tiny_cfg.model, jax.random.key(0))
    loss_fn = build_loss(tiny_cfg.loss, tiny_cfg.tuples, tiny_cfg.tuples_per_batch)
    return model, params, loss_fn


def test_pooled_step_matches_host_step(tiny_cfg):
    import jax

    model, params, loss_fn = _setup(tiny_cfg)
    b = tiny_cfg.images_per_batch
    rng = np.random.default_rng(0)
    images = rng.integers(0, 256, (b + 2, 32, 32, 3)).astype(np.uint8)
    geo = np.abs(rng.random((b, b))).astype(np.float32) * 30.0

    host_step = build_train_step(tiny_cfg, model, loss_fn)
    pool_step = build_train_step(tiny_cfg, model, loss_fn, image_pool=True)

    idx = np.arange(1, b + 1, dtype=np.int32)  # offset: gather must matter
    batch_host = {
        "images": images[idx], "epoch": np.float32(0.0), "geo_dist_matrix": geo,
    }
    batch_pool = {
        "image_idx": idx, "epoch": np.float32(0.0), "geo_dist_matrix": geo,
    }
    import jax.numpy as jnp

    # fresh param copies per state: the steps donate their state argument,
    # which deletes the donated buffers
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    s1 = init_train_state(tiny_cfg, copy(params))
    s2 = init_train_state(tiny_cfg, copy(params))
    s1, m1 = host_step(s1, batch_host)
    s2, m2 = pool_step(s2, batch_pool, images)
    np.testing.assert_array_equal(
        np.asarray(m1["loss"]), np.asarray(m2["loss"])
    )
    a = jax.tree_util.tree_leaves(s1.params)
    c = jax.tree_util.tree_leaves(s2.params)
    for x, y in zip(a, c):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.slow
def test_fused_scan_matches_sequential_singles(tiny_cfg):
    import dataclasses

    import jax
    import jax.numpy as jnp

    from soft_contrastive_learning_tpu.train.step import build_train_step_scan

    cfg = dataclasses.replace(tiny_cfg, steps_per_dispatch=3)
    model, params, loss_fn = _setup(cfg)
    b = cfg.images_per_batch
    rng = np.random.default_rng(3)
    images = rng.integers(0, 256, (b * 3 + 1, 32, 32, 3)).astype(np.uint8)

    single = build_train_step(cfg, model, loss_fn, image_pool=True)
    fused = build_train_step_scan(cfg, model, loss_fn, image_pool=True)

    def mk_batch(i):
        idx = np.arange(i, i + b, dtype=np.int32)
        geo = np.abs(np.random.default_rng(i).random((b, b))).astype(np.float32) * 30
        return {"image_idx": idx, "epoch": np.float32(0.0),
                "geo_dist_matrix": geo}

    batches = [mk_batch(i) for i in range(3)]
    copy = lambda t: jax.tree_util.tree_map(jnp.copy, t)
    s1 = init_train_state(cfg, copy(params))
    losses_seq = []
    for bt in batches:
        s1, m = single(s1, bt, images)
        losses_seq.append(np.asarray(m["loss"]))

    s2 = init_train_state(cfg, copy(params))
    stacked = {k: np.stack([bt[k] for bt in batches]) for k in batches[0]}
    s2, ms = fused(s2, stacked, images)

    np.testing.assert_array_equal(np.asarray(ms["loss"]), np.stack(losses_seq))
    assert int(s2.step) == 3
    # params agree to float reassociation (XLA schedules the Adam update
    # slightly differently inside scan; losses above are bitwise equal)
    for x, y in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
        )


def test_fused_scan_refuses_incremental(tiny_cfg):
    import dataclasses

    from soft_contrastive_learning_tpu.train.step import build_train_step_scan

    cfg = dataclasses.replace(
        tiny_cfg, loss=LossConfig(name="incremental_det"), steps_per_dispatch=4
    )
    model, params, _ = _setup(tiny_cfg)
    loss_fn = build_loss(cfg.loss, cfg.tuples, cfg.tuples_per_batch)
    with pytest.raises(AssertionError):
        build_train_step_scan(cfg, model, loss_fn)


def test_embed_pool_step_matches_embed_step(tiny_cfg):
    model, params, loss_fn = _setup(tiny_cfg)
    rng = np.random.default_rng(1)
    images = rng.integers(0, 256, (7, 32, 32, 3)).astype(np.uint8)
    idx = np.asarray([3, 0, 6], np.int32)
    embed = build_embed_step(tiny_cfg, model)
    embed_pool = build_embed_pool_step(tiny_cfg, model)
    o1, f1 = embed(params, images[idx])
    o2, f2 = embed_pool(params, idx, images)
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))


def test_build_pool_and_row_mapping(tiny_cfg):
    src = ToyCitySource(num_points=16, radius=20.0, img_h=32, img_w=32, seed=5)
    meta0 = src.epoch_meta("train_ref", 0)
    pool = build_pool(src, meta0, tiny_cfg, max_bytes=10**9, log=lambda *_: None)
    assert pool is not None and pool.array.shape == (16, 32, 32, 3)
    # epoch 1 permutes rows; mapping must follow keys, not positions
    meta1 = src.epoch_meta("train_ref", 1)
    rows = pool.rows_for_meta(meta1)
    assert rows is not None
    want = np.asarray(
        src.load_image((meta1["date"][4], meta1["folder"][4], meta1["t"][4]))
    )
    # pool rows are at the model geometry; toy images already are 32x32
    got = np.asarray(pool.array[rows[4]])
    np.testing.assert_array_equal(got, want)
    # unknown key -> None
    bad = dict(meta1)
    bad["t"] = list(bad["t"])
    bad["t"][0] = "999"
    assert pool.rows_for_meta(bad) is None


def test_build_pool_respects_budget(tiny_cfg):
    src = ToyCitySource(num_points=16, radius=20.0, img_h=32, img_w=32, seed=5)
    meta = src.epoch_meta("train_ref", 0)
    assert build_pool(src, meta, tiny_cfg, max_bytes=100, log=lambda *_: None) is None


def test_neighbor_order_matches_host():
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((20, 33)).astype(np.float32)
    order = np.asarray(neighbor_order(feats))
    d = ((feats[:, None, :] - feats[None, :, :]) ** 2).sum(-1)
    want = np.argsort(d, axis=1)
    np.testing.assert_array_equal(order, want)

    cache = MiningCache()
    idx = np.arange(100, 120)
    cache.refresh(feats, idx, order=order)
    got = cache.sorted_neighbors(105)
    cache2 = MiningCache()
    cache2.refresh(feats, idx)  # host fallback
    np.testing.assert_array_equal(got, cache2.sorted_neighbors(105))
