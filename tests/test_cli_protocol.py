"""Full paper-protocol integration through the CLI, on synthetic data:

    scl-tpu train (toy city) -> orbax run dir
    scl-tpu infer --checkpoint <run dir>  (train -> infer seam)
    scl-tpu topn -> scl-tpu roc

This is the reference's §3.4 path (train/train.py -> evaluation/inference.py
-> top-n.py -> roc.py) executed end-to-end via the CLI surface, with the
trained run's own checkpoint — the workflow a user actually runs.
"""

import os

import numpy as np
import pytest

from soft_contrastive_learning_tpu.cli import main as cli_main
from soft_contrastive_learning_tpu.utils.io import load_pickle, save_csv, save_img

pytestmark = pytest.mark.slow


def test_full_protocol_via_cli(tmp_path):
    out_root = str(tmp_path / "runs")
    rc = cli_main([
        "train", "--toy_city", "--loss", "wms",
        "--vlad_cores", "4", "--reduction", "none",
        "--image_height", "48", "--image_width", "64",
        "--tuples_per_batch", "1",
        "--positives_per_tuple", "2", "--negatives_per_tuple", "2",
        "--hard_positives_per_tuple", "0", "--hard_negatives_per_tuple", "0",
        "--max_epoch", "1", "--base_lr", "1e-4",
        "--mining_step", "1000000", "--mining_cache_size", "6",
        "--eval_step", "1000000", "--save_step", "1000000",
        "--num_eval_queries", "2", "--out_root", out_root,
        "--out_folder", "run", "--seed", "0",
    ])
    assert rc == 0
    run_dir = os.path.join(out_root, "run")
    assert os.path.exists(os.path.join(run_dir, "config.json"))
    ckpt_root = os.path.join(run_dir, "checkpoints")
    assert any(
        os.listdir(os.path.join(ckpt_root, role))
        for role in os.listdir(ckpt_root)
    ), "training wrote no checkpoints"

    # --- images + CSV lists for inference (the offline-eval contract) ---
    rng = np.random.default_rng(7)
    img_root = tmp_path / "imgs"
    csv_root = tmp_path / "lists"
    img_root.mkdir(), csv_root.mkdir()
    n_ref, n_query = 12, 4
    for split, n in (("toy_ref", n_ref), ("toy_query", n_query)):
        paths = []
        for i in range(n):
            p = f"{split}_{i}.png"
            save_img((rng.random((48, 64, 3)) * 255).astype(np.uint8),
                     str(img_root / p))
            paths.append(p)
        save_csv(
            {
                "path": paths,
                "easting": np.arange(n) * 5.0,
                "northing": np.zeros(n),
            },
            str(csv_root / f"{split}.csv"),
        )

    lv = str(tmp_path / "lv")
    for split in ("toy_ref", "toy_query"):
        rc = cli_main([
            "infer", "--set", split, "--csv_root", str(csv_root),
            "--img_root", str(img_root), "--checkpoint", run_dir,
            "--out_name", "m", "--out_root", lv, "--images_per_pass", "4",
        ])
        assert rc == 0
    ref_pickle = os.path.join(lv, "toy_ref_m.pickle")
    query_pickle = os.path.join(lv, "toy_query_m.pickle")
    feats = np.asarray(load_pickle(ref_pickle))
    assert feats.shape == (n_ref, 4 * 512)  # vlad_cores=4 descriptor
    norms = np.linalg.norm(feats, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)

    # --- topn + roc over the trained descriptors ---
    rc = cli_main([
        "topn",
        "--pca_lv_pickle", ref_pickle,
        "--ref_lv_pickle", ref_pickle,
        "--query_lv_pickle", query_pickle,
        "--ref_csv", str(csv_root / "toy_ref.csv"),
        "--query_csv", str(csv_root / "toy_query.csv"),
        "--out_root", str(tmp_path / "top_n"), "--N", "3",
        "--dims", "8", "--spacings", "0.0",
    ])
    assert rc == 0
    out = tmp_path / "top_n" / "l0.0_dim8" / "toy_query_m.pickle"
    assert out.exists()
    payload = load_pickle(str(out))
    assert len(payload) == 6  # reference pickle contract (top-n.py:119)
    os.rename(out, out.parent / "oxford_night_wms.pickle")
    rc = cli_main([
        "roc", "--top_n_root", str(tmp_path / "top_n"),
        "--out_root", str(tmp_path / "figs"), "--l", "0.0", "--d", "8",
    ])
    assert rc == 0
    assert (tmp_path / "figs" / "l00_dim8_roc.pdf").exists()
