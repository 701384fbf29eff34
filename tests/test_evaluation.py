"""Evaluation-suite tests: inference dump, top-N sweep vs sklearn, ROC compile,
experiment registry."""

import os

import jax
import numpy as np
import pytest

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.data.toycity import ToyCity
from soft_contrastive_learning_tpu.evaluation.inference import (
    DescriptorExtractor,
    run_inference,
)
from soft_contrastive_learning_tpu.evaluation.metrics import (
    cumulative_min_topn,
    fixed_split_recall,
    localization_summary,
)
from soft_contrastive_learning_tpu.evaluation.roc import (
    RocSeries,
    compile_roc,
    correctly_localized_curve,
    load_top1_dists,
)
from soft_contrastive_learning_tpu.evaluation.topn import (
    get_top_n,
    spatial_subsample,
    top_n_single,
)
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.utils.experiments import (
    checkpoint_code_name,
    get_checkpoints,
    register_checkpoint,
)
from soft_contrastive_learning_tpu.utils.io import load_pickle, save_csv, save_pickle


def test_spatial_subsample():
    xy = np.stack([np.arange(10.0), np.zeros(10)], axis=1)  # 1 m spacing
    assert spatial_subsample(xy, 0.0) == list(range(10))
    keep = spatial_subsample(xy, 2.0)
    assert keep == [0, 2, 4, 6, 8]
    keep = spatial_subsample(xy, 3.5)
    assert keep == [0, 4, 8]


def test_top_n_single_matches_sklearn(rng):
    from sklearn.neighbors import KDTree

    r, q, d = 60, 7, 16
    ref_f = rng.standard_normal((r, d)).astype(np.float32)
    query_f = rng.standard_normal((q, d)).astype(np.float32)
    ref_xy = rng.random((r, 2)) * 100
    query_xy = rng.random((q, 2)) * 100

    out = top_n_single(ref_f, query_f, ref_xy, query_xy, spacing=0.0, n=5)
    top_i, top_g, top_f, gt_i, gt_g, ref_idx = out
    tree = KDTree(ref_f)
    d_ref, i_ref = tree.query(query_f, k=5)
    np.testing.assert_array_equal(np.asarray(top_i), i_ref)
    np.testing.assert_allclose(np.asarray(top_f), d_ref, atol=1e-3)
    # ground truth is the geographically nearest reference
    xy_d = np.linalg.norm(query_xy[:, None] - ref_xy[None], axis=-1)
    np.testing.assert_array_equal(gt_i, xy_d.argmin(1))
    np.testing.assert_allclose(gt_g, xy_d.min(1), atol=1e-6)
    # retrieval geo dists consistent
    np.testing.assert_allclose(
        np.asarray(top_g), np.take_along_axis(xy_d, i_ref, axis=1), atol=1e-5
    )


def test_top_n_few_refs_returns_none(rng):
    ref_f = rng.standard_normal((3, 4)).astype(np.float32)
    out = top_n_single(ref_f, ref_f, np.zeros((3, 2)), np.zeros((3, 2)), 0.0, n=5)
    assert out is None


def test_get_top_n_sweep(tmp_path, rng):
    r, q, d_full = 50, 5, 32
    pca_f = rng.standard_normal((200, d_full)).astype(np.float32)
    ref_f = rng.standard_normal((r, d_full)).astype(np.float32)
    query_f = rng.standard_normal((q, d_full)).astype(np.float32)
    ref_xy = np.stack([np.arange(r, dtype=float), np.zeros(r)], 1)
    query_xy = rng.random((q, 2)) * 50
    out = get_top_n(
        pca_f, ref_f, query_f, ref_xy, query_xy, str(tmp_path), "toyq_modelA",
        n=5, spacings=(0.0, 2.0), dims=(8, 16),
    )
    assert set(out) == {"l0.0_dim8", "l2.0_dim8", "l0.0_dim16", "l2.0_dim16"}
    payload = load_pickle(out["l2.0_dim8"])
    assert len(payload) == 6
    ref_idx = payload[5]
    assert ref_idx == list(range(0, r, 2))
    # skip_existing: second call reuses files
    out2 = get_top_n(
        pca_f, ref_f, query_f, ref_xy, query_xy, str(tmp_path), "toyq_modelA",
        n=5, spacings=(0.0, 2.0), dims=(8, 16),
    )
    assert out2 == out


def test_whitened_projection_nests(rng):
    """get_top_n's dim sweep slices ONE full-dim whitened projection; that is
    exact only because each whitened output column (x - mean) @ c_j / s_j is
    independent of the requested dim — pin the slice against a fresh per-dim
    transform AND against sklearn's per-dim fit (up to component sign)."""
    import jax.numpy as jnp
    from sklearn.decomposition import PCA

    from soft_contrastive_learning_tpu.pca.whiten import PCAWhitener, fit_pca

    fit_on = rng.standard_normal((60, 24)).astype(np.float32)
    x = rng.standard_normal((9, 24)).astype(np.float32)
    full = fit_pca(jnp.asarray(fit_on), 16)
    sliced = np.asarray(full.transform(jnp.asarray(x)))[:, :6]
    per_dim = PCAWhitener(
        components=full.components[:6],
        mean=full.mean,
        explained_variance=full.explained_variance[:6],
    )
    np.testing.assert_allclose(
        sliced, np.asarray(per_dim.transform(jnp.asarray(x))), atol=1e-6
    )
    skl = PCA(n_components=6, whiten=True).fit(fit_on).transform(x)
    np.testing.assert_allclose(np.abs(sliced), np.abs(skl), atol=2e-4)


def test_roc_compile(tmp_path, rng):
    # synthesize two models' top-n pickles for two query sets
    setting = "l0.0_dim8"
    os.makedirs(tmp_path / "topn" / setting)
    for q in ("oxford_night", "oxford_snow"):
        for model, scale in (("wms", 5.0), ("triplet", 15.0)):
            top_g = np.abs(rng.standard_normal((30, 5))) * scale
            gt = np.abs(rng.standard_normal(30)) * 2.0
            save_pickle(
                [np.zeros((30, 5), int).tolist(), top_g.tolist(),
                 np.zeros((30, 5)), [0] * 30, gt, list(range(40))],
                str(tmp_path / "topn" / setting / f"{q}_{model}.pickle"),
            )
    queries = (("oxford_night", "night", 0), ("oxford_snow", "snow", 0))
    series = (RocSeries("wms", "Ours"), RocSeries("triplet", "Triplet"))
    pdf = compile_roc(
        str(tmp_path / "topn"), str(tmp_path / "figs"), setting, queries, series
    )
    assert pdf is not None and os.path.exists(pdf)
    # curve math: lower distances localize more
    top1, gt2 = load_top1_dists(
        str(tmp_path / "topn" / setting / "oxford_night_wms.pickle")
    )
    x, y = correctly_localized_curve(top1)
    assert y[-1] >= y[0]
    assert 0 <= y.min() and y.max() <= 100


def test_roc_compile_many_queries(tmp_path, rng):
    """More query conditions than the reference's fixed 2x3 sheet holds
    (5 panels + legend) must grow the grid by columns, not crash with an
    IndexError or let the legend overdraw the sixth panel."""
    setting = "l0.0_dim8"
    os.makedirs(tmp_path / "topn" / setting)
    names = [f"cond{i}" for i in range(7)]
    for q in names:
        top_g = np.abs(rng.standard_normal((12, 5))) * 5.0
        gt = np.abs(rng.standard_normal(12)) * 2.0
        save_pickle(
            [np.zeros((12, 5), int).tolist(), top_g.tolist(),
             np.zeros((12, 5)), [0] * 12, gt, list(range(20))],
            str(tmp_path / "topn" / setting / f"{q}_wms.pickle"),
        )
    queries = tuple((q, q, 0) for q in names)
    series = (RocSeries("wms", "Ours"),)
    pdf = compile_roc(
        str(tmp_path / "topn"), str(tmp_path / "figs"), setting, queries, series
    )
    assert pdf is not None and os.path.exists(pdf)


def test_roc_compile_empty(tmp_path):
    assert compile_roc(str(tmp_path / "none"), str(tmp_path / "figs")) is None


def test_localization_summary_perfect_retrieval():
    ref_xy = np.stack([np.arange(20.0) * 5, np.zeros(20)], 1)
    query_xy = ref_xy[:4] + 0.5
    retrieved = np.stack([np.arange(4), (np.arange(4) + 1) % 20], 1)
    opt = np.full(4, 0.5)
    scalars, curves = localization_summary(query_xy, ref_xy, retrieved, opt)
    assert scalars["%<10m@Top1"] == 100.0
    assert scalars["10m-auc@Top1"] > 0
    top_n = cumulative_min_topn(np.asarray([[5.0, 2.0, 7.0]]))
    np.testing.assert_allclose(top_n, [[5.0, 2.0, 2.0]])


def test_fixed_split_recall():
    """The quality-evidence protocol (perf/quality_eval.py +
    perf/async_quality.py): every stride-th row queries the rest."""
    # 12 points on a line, 5 m apart; descriptors = one-hot of position
    # bucket so each query's nearest-inner-product ref is its 5 m neighbor
    n = 12
    xy = np.stack([np.arange(n) * 5.0, np.zeros(n)], 1)
    feats = np.zeros((n, n))
    feats[np.arange(n), np.arange(n)] = 1.0
    feats += 0.5 * np.roll(np.eye(n), 1, axis=1)  # overlap with next point
    rec = fixed_split_recall(feats, xy, stride=3)
    assert rec["n_query"] == 4 and rec["n_ref"] == 8
    assert rec["%<10m"] == 100.0  # retrieved = adjacent point, 5 m away
    assert rec["%<25m"] == 100.0
    # orthogonal descriptors: retrieval is argmax over ~zero sims -> far
    # misses are possible; protocol still returns well-formed percentages
    rec2 = fixed_split_recall(np.eye(n), xy, stride=3)
    assert set(rec2) == {"%<10m", "%<25m", "%<50m", "n_query", "n_ref"}
    assert all(0.0 <= rec2[k] <= 100.0 for k in rec2 if k.startswith("%<"))


def test_inference_end_to_end(tmp_path):
    city = ToyCity(num_points=6, seed=0, img_h=64, img_w=80)
    city.write_to_disk(str(tmp_path / "imgs"))
    meta = city.meta()
    rel = [
        f"{city.date}_stereo_centre_01/{t}.png" for t in meta["t"]
    ]
    save_csv({"path": rel}, str(tmp_path / "lists" / "toy_ref.csv")) if os.path.isdir(
        tmp_path / "lists"
    ) else None
    os.makedirs(tmp_path / "lists", exist_ok=True)
    save_csv({"path": rel}, str(tmp_path / "lists" / "toy_ref.csv"))

    cfg = ModelConfig(vlad_cores=8, reduction="none", image_height=64,
                      image_width=80, compute_dtype="float32", use_pallas=False)
    params = init_params(cfg, jax.random.key(0))
    out_path = run_inference(
        cfg, params, "toy_ref", str(tmp_path / "lists"), str(tmp_path / "imgs"),
        str(tmp_path / "lv"), "modelA", batch_size=4,
    )
    feats = np.asarray(load_pickle(out_path))
    assert feats.shape == (6, 8 * 512)
    # matches a direct forward of the same image
    model = create_model(cfg)
    direct, _ = model.apply(
        {"params": params}, city.image(0)[None].astype(np.float32)
    )
    np.testing.assert_allclose(feats[0], np.asarray(direct)[0], atol=1e-4)


def test_extractor_padding(rng):
    cfg = ModelConfig(vlad_cores=0, reduction="none", image_height=32,
                      image_width=32, compute_dtype="float32", use_pallas=False)
    params = init_params(cfg, jax.random.key(0))
    ex = DescriptorExtractor(cfg, params, batch_size=4)
    imgs = [rng.random((32, 32, 3)).astype(np.float32) * 255 for _ in range(6)]
    feats = ex.extract_images(imgs)
    assert feats.shape[0] == 6  # padding removed


def test_experiments_registry(tmp_path):
    reg = str(tmp_path / "experiments.json")
    assert get_checkpoints("obm", reg) == []
    register_checkpoint("obm", "/runs/al0.8_be15_lowms_000/epoch-checkpoint-2", reg)
    register_checkpoint("obm", "/runs/triplet_000/epoch-checkpoint-1", reg)
    register_checkpoint("obm", "/runs/triplet_000/epoch-checkpoint-1", reg)  # dedup
    assert len(get_checkpoints("obm", reg)) == 2
    assert checkpoint_code_name("/runs/al0.8_be15_lowms_000/epoch-checkpoint-2") == (
        "al08_be15_lowms_000_e2"
    )


def test_inference_float16_dump_roundtrip(tmp_path):
    """dump_dtype='float16' stores the dump at half size; loaded values match
    the float32 dump to f16 rounding, and the top-N sweep on the f16 dump
    reproduces the float32 retrieval at toy scale (the flagship-scale
    characterization lives in docs/REHEARSAL.md)."""
    city = ToyCity(num_points=6, seed=0, img_h=64, img_w=80)
    city.write_to_disk(str(tmp_path / "imgs"))
    rel = [f"{city.date}_stereo_centre_01/{t}.png" for t in city.meta()["t"]]
    os.makedirs(tmp_path / "lists", exist_ok=True)
    save_csv({"path": rel}, str(tmp_path / "lists" / "toy_ref.csv"))
    cfg = ModelConfig(vlad_cores=8, reduction="none", image_height=64,
                      image_width=80, compute_dtype="float32",
                      use_pallas=False)
    params = init_params(cfg, jax.random.key(0))
    common = (cfg, params, "toy_ref", str(tmp_path / "lists"),
              str(tmp_path / "imgs"))
    p32 = run_inference(*common, str(tmp_path / "lv32"), "m", batch_size=4)
    p16 = run_inference(*common, str(tmp_path / "lv16"), "m", batch_size=4,
                        dump_dtype="float16")
    f32 = np.asarray(load_pickle(p32))
    f16 = np.asarray(load_pickle(p16))
    assert f16.dtype == np.float16
    assert os.path.getsize(p16) < 0.6 * os.path.getsize(p32)
    np.testing.assert_allclose(f16.astype(np.float32), f32, atol=1e-3)
    with pytest.raises(ValueError, match="dump_dtype"):
        run_inference(*common, str(tmp_path / "lvbad"), "m",
                      dump_dtype="bfloat16")

    # retrieval equivalence through the real sweep (pca set = ref set here)
    xy = np.stack([city.meta()["northing"], city.meta()["easting"]], 1).astype(
        np.float64
    )
    outs = {}
    for tag, feats in (("f32", f32), ("f16", f16)):
        outs[tag] = get_top_n(
            feats, feats, feats, xy, xy, str(tmp_path / f"topn_{tag}"),
            "toy", n=3, spacings=(0.0,), dims=(4,),
        )
    a = load_pickle(outs["f32"]["l0.0_dim4"])
    b = load_pickle(outs["f16"]["l0.0_dim4"])
    assert a[0] == b[0]  # same retrieved indices
    np.testing.assert_allclose(a[1], b[1])  # same geo distances
