"""int8 serving pipeline: `scl-tpu quant` calibration -> DescriptorService
with quant_scales -> descriptors close to the float path."""

import os

import numpy as np
import pytest

from soft_contrastive_learning_tpu.cli import main as cli_main
from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import init_params
from soft_contrastive_learning_tpu.models.quant import load_scales
from soft_contrastive_learning_tpu.serving import DescriptorService

pytestmark = pytest.mark.slow  # several VGG compiles on the CI CPU


def _tiny_cfg():
    return ModelConfig(
        vlad_cores=4, reduction="none", image_height=32, image_width=32,
        compute_dtype="float32", use_pallas=False,
    )


def test_quant_cli_and_service(tmp_path):
    import cv2
    import jax

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    for i in range(4):
        img = (rng.random((40, 52, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(img_dir / f"{i}.png"), img)

    scales_path = str(tmp_path / "scales.json")
    # without a checkpoint the CLI refuses (random-weight scales are wrong
    # for real models) ...
    rc_refused = cli_main([
        "quant", "--image_dir", str(img_dir), "--out", scales_path,
        "--num_images", "4", "--vlad_cores", "4",
    ])
    assert rc_refused == 1 and not os.path.exists(scales_path)
    # ... unless --allow_random opts in (smoke calibration)
    rc = cli_main([
        "quant", "--image_dir", str(img_dir), "--out", scales_path,
        "--num_images", "4", "--vlad_cores", "4", "--allow_random",
    ])
    # The CLI's default geometry is 180x240; our test wants the tiny config,
    # so only check the CLI wrote a well-formed file, then recalibrate small.
    assert rc == 0 and os.path.exists(scales_path)
    scales = load_scales(scales_path)
    assert len(scales) == 13 and all(v > 0 for v in scales.values())

    cfg = _tiny_cfg()
    params = init_params(cfg, jax.random.key(0))
    imgs = [(rng.random((32, 32, 3)) * 255).astype(np.uint8) for _ in range(3)]

    from soft_contrastive_learning_tpu.models.quant import calibrate_scales

    calib = np.stack(imgs).astype(np.float32)
    small_scales = calibrate_scales(params, calib)

    svc_f = DescriptorService(cfg, params, batch_size=4)
    svc_q = DescriptorService(cfg, params, batch_size=4,
                              quant_scales=small_scales)
    df = svc_f.embed(imgs)
    dq = svc_q.embed(imgs)
    assert df.shape == dq.shape
    cos = np.sum(df * dq, axis=1) / (
        np.linalg.norm(df, axis=1) * np.linalg.norm(dq, axis=1) + 1e-9
    )
    assert cos.min() > 0.99, cos
