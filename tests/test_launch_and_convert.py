"""Tests: job launcher scripts, local array runs, multihost bootstrap no-op,
TF1 checkpoint conversion into a working model."""

import os

import jax
import numpy as np

from soft_contrastive_learning_tpu.checkpoints.manager import warm_start_params
from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.launch.jobs import local_array_run, run_one_job
from soft_contrastive_learning_tpu.launch.multihost import (
    initialize_multihost,
    is_primary,
)
from soft_contrastive_learning_tpu.models.convert_tf1 import (
    convert_tf1_variables,
    load_tf1_variables,
)
from soft_contrastive_learning_tpu.models.model import create_model, init_params


def test_run_one_job_renders_sge(tmp_path):
    script = tmp_path / "train.py"
    script.write_text("print('hi')\n")
    submitted = []
    out = run_one_job(
        str(script), [("loss", "wms"), ("alpha", 0.8)],
        out_dir=str(tmp_path / "job"), array=True, num_jobs=4,
        memory=25, queue="48h", submit=submitted.append,
    )
    assert out and os.path.exists(out)
    text = open(out).read()
    assert "#$ -t 1-4" in text
    assert "--loss wms --alpha 0.8" in text
    assert "--task_id $SGE_TASK_ID" in text
    assert "-l gpu=1" in text
    assert submitted == [out]
    # frozen copy of the script exists
    assert os.path.exists(tmp_path / "job" / "train.py")
    # no-overwrite semantics
    assert run_one_job(str(script), out_dir=str(tmp_path / "job")) is None


def test_run_one_job_slurm_cpu(tmp_path):
    script = tmp_path / "prep.py"
    script.write_text("pass\n")
    out = run_one_job(
        str(script), out_dir=str(tmp_path / "job2"), cpu_only=True,
        backend="slurm", array=True, num_jobs=2, submit=lambda p: 0,
    )
    text = open(out).read()
    assert "#SBATCH --array=1-2" in text
    assert "gres" not in text
    assert "$SLURM_ARRAY_TASK_ID" in text


def test_local_array_run():
    seen = []
    local_array_run(seen.append, 5)
    assert seen == [1, 2, 3, 4, 5]


def test_multihost_noop():
    info = initialize_multihost()
    assert info["process_count"] == 1
    assert info["global_device_count"] >= 1
    assert is_primary()


def test_convert_tf1_roundtrip(tmp_path, rng):
    """Synthesize TF1-named variables, convert, warm-start a model, and check
    the forward pass actually consumes the converted weights."""
    cfg = ModelConfig(vlad_cores=4, reduction="none", image_height=32,
                      image_width=32, compute_dtype="float32", use_pallas=False)
    fresh = init_params(cfg, jax.random.key(0))

    tf_vars = {"vgg16_netvlad_pca/average_rgb": rng.standard_normal(3)}
    specs = [(1, 1, 3, 64), (1, 2, 64, 64), (2, 1, 64, 128), (2, 2, 128, 128),
             (3, 1, 128, 256), (3, 2, 256, 256), (3, 3, 256, 256),
             (4, 1, 256, 512), (4, 2, 512, 512), (4, 3, 512, 512),
             (5, 1, 512, 512), (5, 2, 512, 512), (5, 3, 512, 512)]
    for b, i, cin, cout in specs:
        tf_vars[f"vgg16_netvlad_pca/conv{b}_{i}/kernel"] = (
            rng.standard_normal((3, 3, cin, cout)).astype(np.float32) * 0.01
        )
        tf_vars[f"vgg16_netvlad_pca/conv{b}_{i}/bias"] = np.zeros(cout, np.float32)
    tf_vars["vgg16_netvlad_pca/assignment/kernel"] = (
        rng.standard_normal((1, 1, 512, 4)).astype(np.float32)
    )
    tf_vars["vgg16_netvlad_pca/cluster_centers"] = (
        rng.standard_normal((1, 1, 1, 512, 4)).astype(np.float32)
    )
    tf_vars["Variable"] = np.asarray(7)  # global step: must be skipped

    # npz path
    npz = str(tmp_path / "ckpt.npz")
    np.savez(npz, **tf_vars)
    loaded = load_tf1_variables(npz)
    converted, mapping = convert_tf1_variables(loaded)
    assert "vgg16" in converted and "netvlad" in converted
    assert converted["netvlad"]["cluster_centers"].shape == (512, 4)
    assert "Variable" not in mapping

    # structural match with freshly-initialized params
    merged, copied = warm_start_params(fresh, converted)
    assert set(copied) == {"vgg16", "netvlad"}
    model = create_model(cfg)
    x = np.ones((1, 32, 32, 3), np.float32) * 120
    out_fresh, _ = model.apply({"params": fresh}, x)
    out_conv, _ = model.apply({"params": merged}, x)
    assert out_conv.shape == (1, 4 * 512)
    assert not np.allclose(np.asarray(out_fresh), np.asarray(out_conv))
    # average_rgb landed where the model reads it
    np.testing.assert_allclose(
        np.asarray(merged["vgg16"]["average_rgb"]),
        tf_vars["vgg16_netvlad_pca/average_rgb"],
        rtol=1e-6,
    )
