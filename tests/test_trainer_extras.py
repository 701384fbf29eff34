"""Trainer extras: pca reduction path, triptych artifacts, fc-head training."""

import glob
import os

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
        seed=0,
    )
    defaults.update(kw)
    return TrainConfig(**defaults)


def _source():
    return ToyCitySource(num_points=24, radius=30.0, img_h=64, img_w=80, seed=3)


@pytest.mark.slow
def test_pca_reduction_training(tmp_path):
    """reduction='pca': streaming PCA initializes at the first mining refresh,
    the train step projects through it, and it updates every step."""
    cfg = _cfg("triplet", reduction="pca")
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    tr.train()
    assert tr.pca is not None and tr.pca.initialized
    assert tr.pca.v.shape == (16, 8 * 512)
    assert tr.pca.true_seen > 10  # per-step updates accumulated
    losses = [r["value"] for r in tr.writers["local"].read_all() if r["tag"] == "loss"]
    assert losses and all(np.isfinite(losses))
    # eval-time features go through whitening: output dim == out_dim
    meta = tr.source.epoch_meta("train_ref", 0)
    feats = tr.extract_features(meta, [0, 1, 2])
    assert feats.shape == (3, 16)
    # checkpoint carries the PCA state
    tr.ckpts.save("part", tr.global_step, tr.state, tr._pca_sd())
    tr.ckpts.wait()
    tr2 = Trainer(_cfg("triplet", reduction="pca"), _source(), out_dir=str(tmp_path / "run"))
    assert tr2.resume_latest("part")
    assert tr2.pca.initialized
    np.testing.assert_allclose(tr2.pca.m, tr.pca.m, atol=1e-6)
    tr.close()
    tr2.close()


@pytest.mark.slow
def test_fc_head_training(tmp_path):
    cfg = _cfg("lazy_triplet", reduction="2fc")
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"))
    tr.train()
    losses = [r["value"] for r in tr.writers["local"].read_all() if r["tag"] == "loss"]
    assert losses and all(np.isfinite(losses))
    meta = tr.source.epoch_meta("train_ref", 0)
    feats = tr.extract_features(meta, [0, 1])
    assert feats.shape == (2, 16)
    tr.close()


@pytest.mark.slow
def test_mining_cadence_with_nondividing_batch(tmp_path):
    """Mining refresh must fire at every step divisible by mining_step even
    when tuples_per_batch does not divide mining_step (regression: fixed-size
    segmenting refreshed only once per epoch)."""
    cfg = _cfg("triplet", tuples_per_batch=3, mining_step=6, mining_cache_size=6)
    src = _source()  # 24 points -> 24 anchors -> steps 0,3,...,21
    tr = Trainer(cfg, src, out_dir=str(tmp_path / "run"))
    refreshed_at = []
    orig = tr._mining_refresh

    def spy(epoch, step, count, meta, anchors, **kw):
        refreshed_at.append(step)
        return orig(epoch, step, count, meta, anchors, **kw)

    tr._mining_refresh = spy
    tr.train_one_epoch(0)
    assert refreshed_at == [0, 6, 12, 18]
    tr.close()


@pytest.mark.slow
def test_mid_epoch_exact_resume(tmp_path, monkeypatch):
    """A run resumed from a mid-epoch 'part' checkpoint must consume the SAME
    remaining batch sequence as the uninterrupted run (sampler-stream
    exactness via the pre-spawn rng snapshot + consumed-count replay)."""
    import soft_contrastive_learning_tpu.train.trainer as trainer_mod

    def cfg():
        # Host feed path: the recording hook is assemble_batch, which the
        # device-image-pool path bypasses by design (batches become (B,)
        # indices, data/device_pool.py). The exactness machinery under test
        # (pre-spawn rng snapshot + consumed-count replay) runs in the
        # sampler, BEFORE the feed-path split, so one path pins it for both.
        return _cfg("triplet", tuples_per_batch=1, mining_step=6,
                    mining_cache_size=6, save_step=6, eval_step=10**9,
                    device_image_pool=False)

    orig = trainer_mod.assemble_batch  # capture once: spies must not nest

    def record_batches(records):
        def spy(cfg_, source, meta, indices, payload, epoch, pool=None):
            records.append(tuple(indices.reshape(-1).tolist()))
            return orig(cfg_, source, meta, indices, payload, epoch, pool)

        return spy

    # Run A: uninterrupted (eval disabled: its batches would interleave
    # nondeterministically with the producer's in the recording)
    rec_a = []
    monkeypatch.setattr(trainer_mod, "assemble_batch", record_batches(rec_a))
    tr_a = Trainer(cfg(), _source(), out_dir=str(tmp_path / "a"))
    tr_a._run_eval = lambda *a, **k: None
    tr_a.train()
    assert len(rec_a) == 24
    tr_a.ckpts.wait()
    latest = tr_a.ckpts.latest("part")
    assert latest is not None

    # Run B: resume from A's latest mid-epoch part checkpoint
    rec_b = []
    monkeypatch.setattr(trainer_mod, "assemble_batch", record_batches(rec_b))
    tr_b = Trainer(cfg(), _source(), out_dir=str(tmp_path / "a"))
    tr_b._run_eval = lambda *a, **k: None
    assert tr_b.resume_latest("part")
    assert tr_b._resume_ctx is not None
    resume_at = tr_b._resume_ctx["seg_step0"] + tr_b._resume_ctx["consumed"]
    tr_b.train()
    # B consumed exactly A's tail from the resume point on
    assert rec_b == rec_a[resume_at:]
    # and B's final step count matches A's
    assert tr_b.global_step == tr_a.global_step
    tr_a.close()
    tr_b.close()


@pytest.mark.slow
def test_resume_does_not_double_count_pca(tmp_path):
    """Mid-segment resume must not re-apply the mining window's streaming-PCA
    update that the restored state already contains: the resumed run's final
    PCA state must match the uninterrupted run's."""
    def cfg():
        return _cfg("triplet", reduction="pca", tuples_per_batch=1,
                    mining_step=6, mining_cache_size=6, save_step=6,
                    eval_step=10**9)

    tr_a = Trainer(cfg(), _source(), out_dir=str(tmp_path / "a"))
    tr_a._run_eval = lambda *a, **k: None
    tr_a.train()
    tr_a.ckpts.wait()

    tr_b = Trainer(cfg(), _source(), out_dir=str(tmp_path / "a"))
    tr_b._run_eval = lambda *a, **k: None
    assert tr_b.resume_latest("part")
    seen_at_resume = tr_b.pca.seen
    tr_b.train()
    assert tr_b.global_step == tr_a.global_step
    # identical effective sample counts and statistics
    np.testing.assert_allclose(tr_b.pca.seen, tr_a.pca.seen, rtol=1e-6)
    np.testing.assert_allclose(tr_b.pca.true_seen, tr_a.pca.true_seen, rtol=1e-6)
    np.testing.assert_allclose(tr_b.pca.m, tr_a.pca.m, atol=1e-4)
    assert tr_b.pca.seen > seen_at_resume  # per-step updates continued
    tr_a.close()
    tr_b.close()


@pytest.mark.slow
def test_eval_artifacts_with_plots(tmp_path):
    cfg = _cfg("triplet", eval_step=6, save_step=10**9, num_eval_queries=3)
    tr = Trainer(cfg, _source(), out_dir=str(tmp_path / "run"), save_plots=True)
    tr.train_one_epoch(0)
    pdfs = glob.glob(str(tmp_path / "run" / "*_25.pdf"))
    assert pdfs, "no tolerance-curve PDFs saved"
    example_dirs = glob.glob(str(tmp_path / "run" / "*_examples"))
    assert example_dirs, "no triptych directories saved"
    imgs = glob.glob(os.path.join(example_dirs[0], "*.png"))
    assert imgs, "no triptych images saved"
    from soft_contrastive_learning_tpu.utils.io import load_img

    trip = load_img(imgs[0])
    assert trip.shape[1] >= 3 * 60  # three panels side by side
    tr.close()


def test_load_run_params_restores_typed_and_rejects_stale_arch(tmp_path):
    """load_run_params must restore against a typed target tree (no orbax
    'generally UNSAFE' untyped restore) and fail LOUDLY when the checkpoint's
    params don't match the run's own ModelConfig (round-4 verdict #3)."""
    import dataclasses

    import jax

    from soft_contrastive_learning_tpu.checkpoints.manager import (
        RunCheckpoints,
        load_run_params,
    )
    from soft_contrastive_learning_tpu.models.model import init_params
    from soft_contrastive_learning_tpu.train.step import init_train_state

    cfg = _cfg()
    run_dir = str(tmp_path / "run")
    cfg.save(os.path.join(run_dir, "config.json"))

    # Matching save -> typed restore round-trips exactly.
    params = init_params(cfg.model, jax.random.key(0))
    ck = RunCheckpoints(run_dir)
    ck.save("part", 3, init_train_state(cfg, params))
    ck.wait()
    ck.close()
    mcfg, restored = load_run_params(run_dir)
    assert mcfg == cfg.model
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored,
        params,
    )

    # Stale architecture (different vlad_cores than config.json) fails loudly.
    stale_dir = str(tmp_path / "stale")
    cfg.save(os.path.join(stale_dir, "config.json"))
    stale_model = dataclasses.replace(cfg.model, vlad_cores=4)
    stale_params = init_params(stale_model, jax.random.key(0))
    ck = RunCheckpoints(stale_dir)
    ck.save("part", 3, init_train_state(cfg, stale_params))
    ck.wait()
    ck.close()
    with pytest.raises(ValueError, match="stale architecture"):
        load_run_params(stale_dir)


def test_load_run_params_closes_managers_on_error(tmp_path, monkeypatch):
    """The stale-architecture raise path must still close the read-only
    RunCheckpoints (orbax managers own non-daemon worker threads; a caller
    that catches the ValueError must not accumulate leaked managers)."""
    import dataclasses

    import jax

    from soft_contrastive_learning_tpu.checkpoints import manager as mgr_mod
    from soft_contrastive_learning_tpu.models.model import init_params
    from soft_contrastive_learning_tpu.train.step import init_train_state

    cfg = _cfg()
    stale_dir = str(tmp_path / "stale")
    cfg.save(os.path.join(stale_dir, "config.json"))
    stale_model = dataclasses.replace(cfg.model, vlad_cores=4)
    stale_params = init_params(stale_model, jax.random.key(0))
    ck = mgr_mod.RunCheckpoints(stale_dir)
    ck.save("part", 3, init_train_state(cfg, stale_params))
    ck.wait()
    ck.close()

    closed = []
    orig_close = mgr_mod.RunCheckpoints.close

    def counting_close(self):
        closed.append(True)
        orig_close(self)

    monkeypatch.setattr(mgr_mod.RunCheckpoints, "close", counting_close)
    with pytest.raises(ValueError, match="stale architecture"):
        mgr_mod.load_run_params(stale_dir)
    assert closed, "load_run_params leaked its CheckpointManager on the error path"
