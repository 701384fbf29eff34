"""Stage 001: untar raw Bayer images, demosaic(+undistort), downsize, record
exposure.

Capability parity with reference prepare_data/001_downsize_images.py:21-79.
The reference delegates demosaic/undistort to the external robotcar-dataset-sdk
(oxford_camera.CameraModel / oxford_image.load_image); here demosaicing is
native via OpenCV (RobotCar's stereo camera is GBRG Bayer) and undistortion
uses the SDK's LUT files when a camera-models dir is supplied (they ship with
the dataset), degrading gracefully to demosaic-only otherwise.

Per-image 'exposure' is the sum of all pixel values of the DOWNSIZED image
(reference :66), used by stage 004 to drop over/under-exposed frames.
"""

from __future__ import annotations

import os
import tarfile
from typing import Dict, List, Optional

import numpy as np

from soft_contrastive_learning_tpu.data.robotcar.stages import PrepContext
from soft_contrastive_learning_tpu.utils.cv import resize_img
from soft_contrastive_learning_tpu.utils.io import load_csv, save_csv, save_img, save_txt


def demosaic_gbrg(raw: np.ndarray) -> np.ndarray:
    """GBRG Bayer -> RGB (the RobotCar stereo pattern)."""
    import cv2

    return cv2.cvtColor(raw, cv2.COLOR_BayerGR2RGB)


class UndistortLUT:
    """Bilinear undistortion from a robotcar-sdk LUT file (one row of
    interleaved u then v source coordinates per destination pixel)."""

    def __init__(self, lut_path: str, shape):
        lut = np.fromfile(lut_path, np.double)
        lut = lut.reshape(2, -1)
        self.u = lut[0].reshape(shape).astype(np.float32)
        self.v = lut[1].reshape(shape).astype(np.float32)

    def __call__(self, img: np.ndarray) -> np.ndarray:
        import cv2

        return cv2.remap(img, self.u, self.v, cv2.INTER_LINEAR)


def decode_raw_image(
    data: bytes, undistort: Optional[UndistortLUT] = None
) -> np.ndarray:
    import cv2

    raw = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE)
    if raw is None:
        raise ValueError("undecodable image")
    rgb = demosaic_gbrg(raw)
    if undistort is not None:
        rgb = undistort(rgb)
    return rgb


def find_undistort_lut(models_dir: str, h: int, w: int) -> Optional[UndistortLUT]:
    if not models_dir:
        return None
    lut_path = os.path.join(models_dir, "stereo_narrow_left_distortion_lut.bin")
    if not os.path.exists(lut_path):
        return None
    try:
        return UndistortLUT(lut_path, (h, w))
    except Exception:
        return None


def downsize_images(ctx: PrepContext, date: str) -> None:
    """Process one date's tar archives -> downsized PNGs + img_info CSV."""
    out_dir = ctx.dir(f"img_info_{ctx.max_side}")
    out_file = os.path.join(out_dir, f"{date}.csv")
    if os.path.exists(out_file):
        return

    ts_file = os.path.join(ctx.raw_img_root, date, "stereo.timestamps")
    imgs = load_csv(ts_file, has_header=False, delimiter=" ", keys=["t", "folder"])
    timestamps: List[str] = list(imgs["t"])
    folders: List[str] = list(imgs["folder"])
    exposures: Dict[str, float] = {}
    kept: Dict[str, bool] = {}

    max_folder = max(int(f) for f in folders)
    undistort = None
    for folder in range(1, max_folder + 1):
        tar_path = os.path.join(
            ctx.tar_root, f"{date}_stereo_centre_{folder:02d}.tar"
        )
        if not os.path.exists(tar_path):
            save_txt(
                tar_path + "\n", os.path.join(ctx.dir(""), "missing.txt"), mode="a"
            )
            continue
        out_img_dir = os.path.join(
            ctx.img_root, f"{date}_stereo_centre_{folder:02d}"
        )
        os.makedirs(out_img_dir, exist_ok=True)
        with tarfile.open(tar_path) as archive:
            for entry in archive.getmembers():
                name = os.path.basename(entry.name)
                if not name.endswith(".png"):
                    continue
                ts = name.split(".")[0]
                try:
                    with archive.extractfile(entry) as fh:
                        data = fh.read()
                    if undistort is None and ctx.camera_models:
                        import cv2

                        probe = cv2.imdecode(
                            np.frombuffer(data, np.uint8), cv2.IMREAD_GRAYSCALE
                        )
                        undistort = find_undistort_lut(
                            ctx.camera_models, probe.shape[0], probe.shape[1]
                        )
                    rgb = decode_raw_image(data, undistort)
                    small = resize_img(rgb, ctx.max_side)
                    exposures[ts] = float(np.sum(small, dtype=np.float64))
                    kept[ts] = True
                    save_img(small, os.path.join(out_img_dir, name))
                except Exception:
                    kept[ts] = False  # unreadable image: drop the row

    rows = [
        (t, f) for t, f in zip(timestamps, folders) if kept.get(t, False)
    ]
    save_csv(
        {
            "t": [t for t, _ in rows],
            "folder": [f for _, f in rows],
            "exposure": [exposures[t] for t, _ in rows],
        },
        out_file,
    )
