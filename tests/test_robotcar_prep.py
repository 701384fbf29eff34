"""End-to-end test of the RobotCar prep pipeline (stages 001-014) on a
synthetic mini-dataset with the exact raw-input layout."""

import math
import os
import tarfile

import numpy as np
import pytest

from soft_contrastive_learning_tpu.data.robotcar import prep
from soft_contrastive_learning_tpu.data.robotcar.analysis import scale_factor
from soft_contrastive_learning_tpu.data.robotcar.downsize import (
    decode_raw_image,
    downsize_images,
)
from soft_contrastive_learning_tpu.data.robotcar.stages import (
    PrepContext,
    run_all,
)
from soft_contrastive_learning_tpu.utils.io import load_csv, save_csv, save_txt
from soft_contrastive_learning_tpu.utils.meta import get_xy

DATE_REF = "2019-01-01-10-00-00"
DATE_QUERY = "2019-02-02-11-00-00"

GRID_E, GRID_N = prep.GRID_ORIGIN_E, prep.GRID_ORIGIN_N


def _write_raw_date(root, date, xs, y, t0):
    """INS csv + stereo.timestamps + one tar of Bayer frames."""
    import cv2

    n = len(xs)
    ts = [t0 + 100000 * i for i in range(n)]
    # stereo.timestamps: "t folder" rows
    os.makedirs(os.path.join(root, "raw", date), exist_ok=True)
    save_txt(
        "\n".join(f"{t} 1" for t in ts),
        os.path.join(root, "raw", date, "stereo.timestamps"),
    )
    # INS at 3x frequency
    ins_ts, e_l, n_l, yaw_l, st = [], [], [], [], []
    for i in range(n * 3):
        frac = i / 3.0
        ins_ts.append(t0 + int(100000 * frac))
        x = np.interp(frac, np.arange(n), xs)
        e_l.append(GRID_E + x)
        n_l.append(GRID_N - y)
        yaw_l.append(math.pi / 2)
        st.append("INS_SOLUTION_GOOD")
    os.makedirs(os.path.join(root, "raw", date, "gps"), exist_ok=True)
    save_csv(
        {"timestamp": ins_ts, "northing": n_l, "easting": e_l, "yaw": yaw_l,
         "ins_status": st},
        os.path.join(root, "raw", date, "gps", "ins.csv"),
    )
    # raw Bayer tar
    tar_dir = os.path.join(root, "tars")
    os.makedirs(tar_dir, exist_ok=True)
    tmp = os.path.join(root, "tmp_frames")
    os.makedirs(tmp, exist_ok=True)
    rng = np.random.default_rng(7)
    tar_path = os.path.join(tar_dir, f"{date}_stereo_centre_01.tar")
    with tarfile.open(tar_path, "w") as tar:
        for t in ts:
            raw = rng.integers(40, 200, size=(64, 96), dtype=np.uint8)
            p = os.path.join(tmp, f"{t}.png")
            cv2.imwrite(p, raw)
            tar.add(p, arcname=f"{date}/stereo/centre/{t}.png")
    return ts


def _write_masks(root):
    import cv2

    masks = {}
    for name, (x0, x1) in (
        ("full", (0, 360)), ("train", (0, 150)), ("test", (160, 310)),
        ("val", (320, 360)),
    ):
        grid = np.zeros((40, 380, 3), np.uint8)
        grid[:, x0:x1] = 255
        p = os.path.join(root, f"mask_{name}.png")
        cv2.imwrite(p, grid)
        masks[name] = p
    return masks


@pytest.fixture(scope="module")
def prep_ctx(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("robotcar"))
    _write_raw_date(root, DATE_REF, np.arange(360, dtype=float), 10.0, 10**15)
    _write_raw_date(
        root, DATE_QUERY, np.arange(5, 355, dtype=float), 10.3, 2 * 10**15
    )
    masks = _write_masks(root)
    ctx = PrepContext(
        root=os.path.join(root, "data"),
        raw_img_root=os.path.join(root, "raw"),
        ins_root=os.path.join(root, "raw"),
        tar_root=os.path.join(root, "tars"),
        img_root=os.path.join(root, "downsized"),
        grid_masks=masks,
        max_epochs=2,
        ref_dates={"train": DATE_REF, "test": DATE_REF, "val": DATE_REF},
        query_dates=(DATE_QUERY,),
        bad_dates=(),
        cluster_r=5,
    )
    return ctx


@pytest.mark.slow
def test_full_prep_pipeline(prep_ctx):
    ctx = prep_ctx
    # 001: untar + demosaic + downsize + exposure
    for date in (DATE_REF, DATE_QUERY):
        downsize_images(ctx, date)
        info = load_csv(
            os.path.join(ctx.dir(f"img_info_{ctx.max_side}"), f"{date}.csv")
        )
        assert len(info["t"]) > 0
        assert all(float(e) > 0 for e in info["exposure"])
        img_dir = os.path.join(ctx.img_root, f"{date}_stereo_centre_01")
        assert len(os.listdir(img_dir)) == len(info["t"])
        # idempotent
        downsize_images(ctx, date)

    # 002: xy interpolation
    for date in (DATE_REF, DATE_QUERY):
        prep.interpolate_image_xy(ctx, date)
        xy_meta = load_csv(os.path.join(ctx.dir("xy"), f"{date}.csv"))
        assert set(xy_meta) >= {"northing", "easting", "yaw", "ins_good"}
        assert all(int(g) == 1 for g in xy_meta["ins_good"])
        e = np.asarray(xy_meta["easting"], float)
        assert e.min() >= GRID_E and e.max() <= GRID_E + 360

    # 003: split assignment from masks
    for date in (DATE_REF, DATE_QUERY):
        prep.assign_splits(ctx, date)
        sp = load_csv(os.path.join(ctx.dir("splits"), f"{date}.csv"))
        tr = np.asarray(sp["train"], int)
        te = np.asarray(sp["test"], int)
        va = np.asarray(sp["val"], int)
        assert tr.sum() > 0 and te.sum() > 0
        assert (tr + te + va).max() <= 1

    # 004-014 through the stage framework (idempotent, ordered)
    stages = prep.metadata_stages(ctx)
    executed = run_all(stages, ctx, log=lambda s: None)
    assert len(executed) == len(stages)
    executed2 = run_all(stages, ctx, log=lambda s: None)
    assert executed2 == []  # all complete -> skipped

    # clean sets exist and are geographically disjoint between folds
    train = load_csv(os.path.join(ctx.dir("merged"), "clean_train.csv"))
    test = load_csv(os.path.join(ctx.dir("merged"), "clean_test.csv"))
    tx = get_xy(train)[:, 0] - GRID_E
    sx = get_xy(test)[:, 0] - GRID_E
    assert tx.max() < 150 and sx.min() >= 160

    # 005: geodesic l grows along the trajectory
    geo = load_csv(
        os.path.join(ctx.dir("parametrized"), f"train_{DATE_REF}_geodesic.csv")
    )
    l = np.asarray(geo["l"], float)
    assert (np.diff(l) >= 0).all()
    # the query date was aligned onto the reference parametrization
    q_geo_path = os.path.join(
        ctx.dir("parametrized"), f"train_{DATE_QUERY}_geodesic.csv"
    )
    assert os.path.exists(q_geo_path)
    q_geo = load_csv(q_geo_path)
    ql = np.asarray(q_geo["l"], float)
    qx = get_xy(q_geo)[:, 0] - GRID_E
    # l of a query point should be close to its x offset from the ref start
    np.testing.assert_allclose(ql, qx - tx.min(), atol=2.0)

    # 007: query/ref split by date
    ref = load_csv(
        os.path.join(ctx.dir("merged_parametrized"), "train_ref.csv")
    )
    qry = load_csv(
        os.path.join(ctx.dir("merged_parametrized"), "train_query.csv")
    )
    assert set(ref["date"]) == {DATE_REF}
    assert set(qry["date"]) == {DATE_QUERY}

    # 012: epoch shuffles are permutations of the same set
    s0 = load_csv(os.path.join(ctx.dir("shuffled"), "train_ref_000.csv"))
    s1 = load_csv(os.path.join(ctx.dir("shuffled"), "train_ref_001.csv"))
    assert sorted(s0["t"]) == sorted(s1["t"])
    assert s0["t"] != s1["t"]

    # 013: clusters are >= r apart along the trajectory
    clusters = load_csv(os.path.join(ctx.dir("clusters"), "train_ref_5.csv"))
    cx = np.sort(get_xy(clusters)[:, 0])
    assert (np.diff(cx) > 5.0 - 1e-6).all()

    # 014: anchors index into the shuffled set, near cluster centers
    anchors = load_csv(os.path.join(ctx.dir("anchors"), "train_ref_1_000.csv"))
    idx = np.asarray(anchors["idx"], int)
    assert len(idx) > 0
    shuffled_xy = get_xy(s0)
    cluster_xy = get_xy(clusters)
    d = np.abs(shuffled_xy[idx][:, None, 0] - cluster_xy[None, :, 0]).min(1)
    assert d.max() <= 1.0 + 1e-6

    # 011: fixed localization refs are r-spaced in l
    loc = load_csv(
        os.path.join(ctx.dir("localization_references"), "train_ref_l_5.csv")
    )
    ll = np.asarray(loc["l"], float)
    assert len(ll) > 10


def test_decode_raw_image_roundtrip(tmp_path):
    import cv2

    raw = np.zeros((16, 24), np.uint8)
    raw[::2, ::2] = 100  # G sites (GBRG row 0: G B G B...)
    ok, buf = cv2.imencode(".png", raw)
    rgb = decode_raw_image(buf.tobytes())
    assert rgb.shape == (16, 24, 3)


def test_scale_factor(tmp_path, rng):
    feats = rng.standard_normal((10, 4)).astype(np.float32)
    xy = rng.random((10, 2)) * 10
    positives = [[j for j in range(10) if j != i][:3] for i in range(10)]
    stats = scale_factor(feats, xy, positives, str(tmp_path))
    assert stats["f_max"] >= stats["f_med"] >= 0
    assert os.path.exists(tmp_path / "scale_factor.pickle")


@pytest.mark.slow
def test_train_from_prep_artifacts(prep_ctx):
    """The prep -> train seam: FilesystemSource reads the REAL artifact tree
    written by stages 001-014 (CSV contracts + downsized images) and the
    Trainer runs steps from it — the reference's actual data path
    (train/train.py:1002-1009 reading shuffled/ + anchors/), previously only
    exercised via the in-memory toy city."""
    from soft_contrastive_learning_tpu.core.config import (
        LossConfig, ModelConfig, TrainConfig, TupleConfig,
    )
    from soft_contrastive_learning_tpu.data.pipeline import FilesystemSource
    from soft_contrastive_learning_tpu.train.trainer import Trainer

    ctx = prep_ctx
    source = FilesystemSource(
        img_root=ctx.img_root,
        shuffled_root=ctx.dir("shuffled"),
        anchor_root=ctx.dir("anchors"),
        loc_ref_root=ctx.dir("clusters"),
    )
    # sanity: the source resolves real image files written by stage 001
    meta = source.epoch_meta("train_ref", 0)
    assert {"date", "folder", "t", "easting", "northing"} <= set(meta)
    img = source.load_image((meta["date"][0], meta["folder"][0], meta["t"][0]))
    assert img.ndim == 3 and img.shape[2] == 3

    cfg = TrainConfig(
        model=ModelConfig(
            vlad_cores=4, reduction="none", image_height=48, image_width=64,
            compute_dtype="float32", use_pallas=False,
        ),
        tuples=TupleConfig(
            positives_per_tuple=2, negatives_per_tuple=2,
            hard_positives_per_tuple=0, hard_negatives_per_tuple=0,
        ),
        loss=LossConfig(name="wms"),
        tuples_per_batch=1,
        max_epoch=1,
        mining_step=10**9,
        mining_cache_size=4,
        eval_step=10**9,
        save_step=10**9,
        num_eval_queries=2,
        train_ref_r=1,
        seed=0,
    )
    import tempfile

    with tempfile.TemporaryDirectory() as out_dir:
        trainer = Trainer(cfg, source, out_dir=out_dir)
        trainer.train()
        assert trainer.global_step > 0
        losses = [
            r["value"] for r in trainer.writers["local"].read_all()
            if r["tag"] == "loss"
        ]
        assert losses and all(np.isfinite(losses))
        trainer.close()
