"""Tests for config derivation, logging, and foundation utils."""

import os

import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import (
    LossConfig,
    ModelConfig,
    TrainConfig,
    unique_out_dir,
)
from soft_contrastive_learning_tpu.core.logging import MetricsWriter, RunLogger, StepTimer
from soft_contrastive_learning_tpu.utils import io as uio
from soft_contrastive_learning_tpu.utils.cv import merge_images, resize_img, standard_size
from soft_contrastive_learning_tpu.utils.meta import get_xy
from soft_contrastive_learning_tpu.utils.sampling import greedy


# ---------------------------------------------------------------- config
@pytest.mark.parametrize(
    "loss,expected",
    [
        ("triplet", "none"),
        ("lazy_quadruplet", "none"),
        ("pairwise_distance_neg_eigenvalue", "pairwise"),
        ("huber_distance_lazy_triplet", "anchor"),
        ("swrd", "swrd"),
        ("wrd", "wrd"),
        ("prodwrd", "wrd"),
        ("sumwrd", "wrd"),
        ("wms", "wms"),
        ("logratio", "logratio"),
        ("ms_loss", "none"),
        ("residual_det", "none"),
    ],
)
def test_distance_type_derivation(loss, expected):
    # Mirrors reference train/train.py:1378-1391
    assert LossConfig(name=loss).distance_type == expected


def test_pn_loss_and_quadruplet_flags():
    assert LossConfig(name="pairwise_distance_neg_eigenvalue").pn_loss
    assert not LossConfig(name="wms").pn_loss
    assert LossConfig(name="quadruplet").needs_other_neg
    assert LossConfig(name="lazy_quadruplet").needs_other_neg
    assert not LossConfig(name="triplet").needs_other_neg


def test_tuple_shape_quadruplet_steals_negative():
    # Reference train/train.py:589-594: quadruplets reuse the last negative.
    cfg = TrainConfig(loss=LossConfig(name="quadruplet"))
    assert cfg.tuple_shape == (1, 12, 11, 1)
    assert sum(cfg.tuple_shape) == 25
    cfg = TrainConfig(loss=LossConfig(name="triplet"))
    assert cfg.tuple_shape == (1, 12, 12)
    assert cfg.images_per_batch == 2 * 25


def test_model_config_dims():
    assert ModelConfig(vlad_cores=64).descriptor_dim == 64 * 512
    assert ModelConfig(vlad_cores=0, reduction="spp", spp_levels=3).descriptor_dim == 21 * 512
    assert ModelConfig(vlad_cores=0, reduction="none").descriptor_dim == 11 * 15 * 512
    assert ModelConfig(reduction="1fc", out_dim=256).output_dim == 256


def test_config_roundtrip(tmp_path):
    cfg = TrainConfig(loss=LossConfig(name="wms", alpha=1.5))
    p = os.path.join(tmp_path, "cfg.json")
    cfg.save(p)
    cfg2 = TrainConfig.load(p)
    assert cfg2 == cfg
    assert "wms" in cfg.encode_name()


def test_unique_out_dir(tmp_path):
    d0 = unique_out_dir(str(tmp_path), "run")
    assert d0.endswith("run")
    os.makedirs(d0)
    d1 = unique_out_dir(str(tmp_path), "run")
    assert d1.endswith("run_000")


# ---------------------------------------------------------------- logging
def test_run_logger_and_metrics(tmp_path):
    logger = RunLogger(str(tmp_path))
    logger.log("hello")
    logger.close()
    with open(os.path.join(tmp_path, "train_log.txt")) as f:
        assert "hello" in f.read()

    mw = MetricsWriter(str(tmp_path), role="other")
    mw.scalar("loss", 1.25, step=3)
    mw.scalars({"a": 1.0, "b": 2.0}, step=4)
    recs = mw.read_all()
    assert len(recs) == 3
    assert recs[0] == {**recs[0], "tag": "loss", "value": 1.25, "step": 3}

    timer = StepTimer()
    with timer.span("stage"):
        pass
    assert timer.summary()["stage"]["count"] == 1


# ---------------------------------------------------------------- io
def test_csv_roundtrip(tmp_path):
    data = {"easting": [1.5, 2.5], "northing": [3.0, 4.0], "name": ["a", "b"]}
    p = os.path.join(tmp_path, "t.csv")
    uio.save_csv(data, p)
    loaded = uio.load_csv(p)
    assert loaded["name"] == ["a", "b"]
    xy = get_xy(loaded)
    np.testing.assert_allclose(xy, [[1.5, 3.0], [2.5, 4.0]])


def test_csv_header_only_returns_keys(tmp_path):
    p = os.path.join(tmp_path, "empty.csv")
    uio.save_txt("a,b,c", p)
    assert uio.load_csv(p) == ["a", "b", "c"]


def test_csv_scalar_row(tmp_path):
    p = os.path.join(tmp_path, "s.csv")
    uio.save_csv({"k": 7, "v": "x"}, p)
    loaded = uio.load_csv(p)
    assert loaded["k"] == ["7"] and loaded["v"] == ["x"]


def test_pickle_txt_roundtrip(tmp_path):
    p = os.path.join(tmp_path, "o.pickle")
    uio.save_pickle({"x": np.arange(3)}, p)
    np.testing.assert_array_equal(uio.load_pickle(p)["x"], np.arange(3))
    t = os.path.join(tmp_path, "o.txt")
    uio.save_txt("abc", t)
    assert uio.load_txt(t) == "abc"


def test_img_roundtrip(tmp_path):
    img = (np.random.default_rng(0).random((16, 24, 3)) * 255).astype(np.uint8)
    p = os.path.join(tmp_path, "i.png")
    uio.save_img(img, p)
    loaded = uio.load_img(p)
    np.testing.assert_array_equal(loaded, img)  # png is lossless


# ---------------------------------------------------------------- cv
def test_resize_img_max_side():
    img = np.zeros((100, 200, 3), np.uint8)
    out = resize_img(img, 240)
    assert max(out.shape[:2]) == 240
    assert out.shape[0] == 120  # aspect preserved


def test_standard_size_cover_and_crop():
    # Mirrors reference util/cv.py:12-20: scale to cover, center crop.
    img = np.zeros((100, 400, 3), np.uint8)
    out = standard_size(img, h=180, w=240)
    assert out.shape == (180, 240, 3)
    img = np.zeros((400, 100, 3), np.uint8)
    out = standard_size(img, h=180, w=240)
    assert out.shape == (180, 240, 3)


def test_merge_images():
    a = np.zeros((100, 50, 3), np.uint8)
    b = np.zeros((200, 80, 3), np.uint8)
    out = merge_images(a, b)
    assert out.shape[0] == 100
    assert out.shape[1] == 50 + 40


# ---------------------------------------------------------------- sampling
def test_greedy_coverage(rng):
    xy = rng.random((200, 2)) * 100
    sel = greedy(xy, d_max=20.0, rng=rng)
    assert len(sel) >= 1
    sel_xy = xy[sel]
    # every point within d_max of a selected point
    d = np.linalg.norm(xy[:, None, :] - sel_xy[None, :, :], axis=-1).min(axis=1)
    assert d.max() < 20.0
    # no duplicates
    assert len(set(sel)) == len(sel)
