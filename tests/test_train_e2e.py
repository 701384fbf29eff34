"""End-to-end smoke training on the synthetic toy city (SURVEY.md §4/§7:
the 'minimum end-to-end slice' milestone), plus unit tests of the train-step
building blocks."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import (
    LossConfig,
    ModelConfig,
    TrainConfig,
    TupleConfig,
)
from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
from soft_contrastive_learning_tpu.ops.topk import topk_l2, topk_l2_sharded
from soft_contrastive_learning_tpu.parallel.mesh import make_mesh, pad_to_multiple, shard_batch
from soft_contrastive_learning_tpu.train.schedule import learning_rate
from soft_contrastive_learning_tpu.train.trainer import Trainer


def _tiny_cfg(loss="wms", **kw):
    model = ModelConfig(
        vlad_cores=8,
        reduction="none",
        image_height=64,
        image_width=80,
        compute_dtype="float32",
        use_pallas=False,
    )
    tuples = TupleConfig(
        positives_per_tuple=3,
        negatives_per_tuple=3,
        hard_positives_per_tuple=1,
        hard_negatives_per_tuple=1,
    )
    defaults = dict(
        model=model,
        tuples=tuples,
        loss=LossConfig(name=loss, loss_dim=8),
        tuples_per_batch=1,
        max_epoch=1,
        base_lr=1e-4,
        mining_step=6,
        mining_cache_size=10,
        eval_step=8,
        save_step=8,
        num_eval_queries=4,
        eval_ref_r=4,
        seed=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _source(num_points=24):
    # ~8 m spacing on a 30 m-radius loop: neighbors fall inside the 15 m
    # positive radius, negatives exist beyond it.
    return ToyCitySource(
        num_points=num_points, radius=30.0 * num_points / 24, img_h=64, img_w=80,
        seed=3,
    )


def test_learning_rate_schedule():
    cfg = TrainConfig(base_lr=5e-6, lr_down_factor=0.5, lr_down_frequency=1,
                      minimal_lr=5e-12)
    np.testing.assert_allclose(float(learning_rate(cfg, jnp.asarray(0.0))), 5e-6)
    np.testing.assert_allclose(float(learning_rate(cfg, jnp.asarray(2.0))), 1.25e-6)
    np.testing.assert_allclose(float(learning_rate(cfg, jnp.asarray(100.0))), 5e-12)


def test_pad_to_multiple():
    x = np.arange(5)
    out = pad_to_multiple(x, 4)
    assert out.shape == (8,)
    np.testing.assert_array_equal(out[5:], [0, 0, 0])
    np.testing.assert_array_equal(pad_to_multiple(x, 5), x)


def test_shard_batch_on_mesh(mesh8):
    batch = {
        "images": np.zeros((16, 4, 4, 3), np.float32),
        "epoch": np.float32(1.0),
        "odd": np.zeros((3, 2), np.float32),  # not divisible -> replicated
    }
    out = shard_batch(batch, mesh8)
    assert out["images"].sharding.spec == jax.sharding.PartitionSpec("data")
    assert out["odd"].sharding.spec == jax.sharding.PartitionSpec()


def test_topk_matches_sklearn(rng):
    from sklearn.neighbors import KDTree

    q = rng.standard_normal((6, 8)).astype(np.float32)
    r = rng.standard_normal((40, 8)).astype(np.float32)
    d, i = topk_l2(jnp.asarray(q), jnp.asarray(r), 5)
    tree = KDTree(r)
    d_ref, i_ref = tree.query(q, k=5)
    np.testing.assert_array_equal(np.asarray(i), i_ref)
    np.testing.assert_allclose(np.asarray(d), d_ref, atol=1e-3)


def test_topk_tiled_matches_dense(rng):
    from soft_contrastive_learning_tpu.ops.topk import topk_l2_tiled

    q = rng.standard_normal((5, 12)).astype(np.float32)
    r = rng.standard_normal((103, 12)).astype(np.float32)  # non-multiple of tile
    d1, i1 = topk_l2(jnp.asarray(q), jnp.asarray(r), 7)
    d2, i2 = topk_l2_tiled(jnp.asarray(q), jnp.asarray(r), 7, tile=16)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), atol=1e-5)
    # k larger than one tile still correct
    d3, i3 = topk_l2_tiled(jnp.asarray(q), jnp.asarray(r), 20, tile=8)
    d4, i4 = topk_l2(jnp.asarray(q), jnp.asarray(r), 20)
    np.testing.assert_array_equal(np.asarray(i3), np.asarray(i4))


def test_topk_sharded(mesh8, rng):
    q = rng.standard_normal((4, 8)).astype(np.float32)
    r = rng.standard_normal((64, 8)).astype(np.float32)
    d1, i1 = topk_l2(jnp.asarray(q), jnp.asarray(r), 6)
    d2, i2 = topk_l2_sharded(jnp.asarray(q), jnp.asarray(r), 6, mesh8)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


@pytest.mark.slow
def test_e2e_toycity_wms(tmp_path):
    cfg = _tiny_cfg("wms")
    trainer = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    trainer.train()

    # steps advanced and loss was logged
    assert trainer.global_step > 10
    local = trainer.writers["local"].read_all()
    losses = [r["value"] for r in local if r["tag"] == "loss"]
    assert len(losses) > 10
    assert all(np.isfinite(losses))

    # localization eval produced sane scalars on both regions
    other = trainer.writers["other"].read_all()
    aucs = [r for r in other if r["tag"] == "25m-auc@Top1"]
    assert aucs, "no localization eval ran"
    for r in aucs:
        assert 0.0 <= r["value"] <= 100.0 * 25

    # checkpoints exist; a fresh trainer resumes the FINAL state exactly
    assert trainer.ckpts.latest("rolling") is not None
    final_step = trainer.global_step
    trainer.ckpts.save(
        "part", final_step, trainer.state, extras=trainer._extras()
    )
    trainer.ckpts.wait()
    cfg2 = _tiny_cfg("wms")
    trainer2 = Trainer(cfg2, _source(), out_dir=str(tmp_path / "run"))
    assert trainer2.resume_latest("part")
    assert trainer2.global_step == final_step
    # sampler RNG stream resumes exactly
    assert trainer2.rng.bit_generator.state == trainer.rng.bit_generator.state
    np.testing.assert_array_equal(
        trainer2.rng.integers(1000, size=5), trainer.rng.integers(1000, size=5)
    )
    for p1, p2 in zip(
        jax.tree_util.tree_leaves(trainer.state.params),
        jax.tree_util.tree_leaves(trainer2.state.params),
    ):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), atol=0)
    trainer.close()
    trainer2.close()


@pytest.mark.slow
def test_e2e_learning_signal(tmp_path):
    """Training on the toy city should reduce the wms loss over the epoch —
    the 'recall improves' smoke criterion scaled to CI."""
    cfg = _tiny_cfg(
        "wms", base_lr=3e-4, mining_step=50, eval_step=10**9, save_step=10**9,
    )
    src = _source(num_points=48)
    trainer = Trainer(cfg, src, out_dir=str(tmp_path / "run"))
    trainer.train()
    losses = [
        r["value"] for r in trainer.writers["local"].read_all() if r["tag"] == "loss"
    ]
    assert len(losses) >= 40
    first = float(np.mean(losses[:8]))
    last = float(np.mean(losses[-8:]))
    assert last < first, (first, last)
    trainer.close()


@pytest.mark.slow
def test_e2e_quadruplet_and_incremental(tmp_path):
    """Exercise the structurally different paths: quadruplet tuple shape and
    the incremental loss's streaming PCA feed."""
    for loss in ("lazy_quadruplet", "incremental_residual_det"):
        cfg = _tiny_cfg(loss, eval_step=10**9, save_step=10**9, mining_step=6)
        trainer = Trainer(cfg, _source(), out_dir=str(tmp_path / f"run_{loss}"))
        trainer.train()
        losses = [
            r["value"] for r in trainer.writers["local"].read_all() if r["tag"] == "loss"
        ]
        assert losses and all(np.isfinite(losses)), loss
        if loss == "incremental_residual_det":
            assert trainer.loss_pca is not None and trainer.loss_pca.initialized
        trainer.close()
