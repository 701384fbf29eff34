"""Metadata helpers over the CSV dict-of-lists contract."""

from __future__ import annotations

from typing import Dict, List

import numpy as np


def get_xy(meta: Dict[str, List[str]]) -> np.ndarray:
    """(N, 2) float array of (easting, northing) from a meta CSV dict
    (reference util/meta.py:4-5; duplicated at train/train.py:1152-1153)."""
    return np.stack(
        [
            np.asarray(meta["easting"], dtype=float),
            np.asarray(meta["northing"], dtype=float),
        ],
        axis=1,
    )


def get_yaw(meta: Dict[str, List[str]]) -> np.ndarray:
    """(N,) float yaw array (reference train/train.py:236)."""
    return np.asarray(meta["yaw"], dtype=float)


def image_keys(meta: Dict[str, List[str]], indices) -> List[tuple]:
    """(date, folder, t) triples identifying images (reference train/train.py:579-580)."""
    return [(meta["date"][i], meta["folder"][i], meta["t"][i]) for i in indices]
