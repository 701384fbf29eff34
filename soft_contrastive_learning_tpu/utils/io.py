"""Filesystem IO: CSV <-> dict-of-lists, pickle, txt, RGB images, tar extraction.

Capability parity with reference util/io.py (load/save_{img,csv,pickle,txt},
unzip). The CSV dict-of-lists layout is the cross-stage contract of the whole
data pipeline (SURVEY.md §3.5), so its semantics are preserved exactly:
columns keyed by header, all values kept as strings.
"""

from __future__ import annotations

import csv
import os
import pickle
import tarfile
from typing import Any, Dict, List, Optional, Sequence

import numpy as np

try:  # OpenCV is present in the baked image; degrade gracefully without it.
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    cv2 = None
    _HAS_CV2 = False


# ---------------------------------------------------------------- images
def load_img(path: str) -> np.ndarray:
    """Read an image file as an RGB uint8 array (reference util/io.py:16-20)."""
    if not _HAS_CV2:  # pragma: no cover
        raise RuntimeError("cv2 unavailable; cannot decode images")
    bgr = cv2.imread(str(path))
    if bgr is None:
        raise FileNotFoundError(f"could not read image: {path}")
    return cv2.cvtColor(np.asarray(bgr, dtype=np.uint8), cv2.COLOR_BGR2RGB)


def save_img(img: np.ndarray, path: str) -> None:
    """Write an RGB array to disk (reference util/io.py:10-13)."""
    if not _HAS_CV2:  # pragma: no cover
        raise RuntimeError("cv2 unavailable; cannot encode images")
    bgr = cv2.cvtColor(np.asarray(img, dtype=np.uint8), cv2.COLOR_RGB2BGR)
    cv2.imwrite(str(path), bgr)


# ---------------------------------------------------------------- text
def load_txt(path: str) -> str:
    with open(path, "r") as f:
        return f.read()


def save_txt(text: str, path: str, mode: str = "w") -> None:
    with open(path, mode) as f:
        f.write(text)


# ---------------------------------------------------------------- pickle
def load_pickle(path: str) -> Any:
    with open(path, "rb") as f:
        return pickle.load(f)


def save_pickle(obj: Any, path: str) -> None:
    with open(path, "wb") as f:
        pickle.dump(obj, f)


# ---------------------------------------------------------------- csv
def load_csv(
    path: str,
    delimiter: str = ",",
    has_header: bool = True,
    keys: Optional[Sequence[Any]] = None,
) -> Dict[Any, List[str]]:
    """Read a CSV into a dict of column-name -> list-of-strings.

    Contract parity with reference util/io.py:46-102, including the quirk that a
    header-only file returns the key list instead of an empty dict (callers in
    the prep pipeline rely on it to detect empty stages).
    """
    with open(path, newline="") as f:
        reader = csv.reader(f, delimiter=delimiter)
        rows = iter(reader)
        try:
            first = next(rows)
        except StopIteration:
            return {}
        if has_header:
            cols: List[Any] = list(first)
        else:
            cols = list(keys) if keys and len(keys) == len(first) else list(range(len(first)))
        out: Dict[Any, List[str]] = {k: [] for k in cols}
        if not has_header:
            for k, v in zip(cols, first):
                out[k].append(v)
        for row in rows:
            for k, v in zip(cols, row):
                out[k].append(v)
        if any(len(v) > 0 for v in out.values()):
            return out
        return cols  # header-only file: return the keys (reference behavior)


def load_table(
    path: str, delimiter: str = ",", has_header: bool = True
) -> Dict[Any, List[str]]:
    """Like load_csv but ALWAYS returns a dict: a header-only file yields the
    columns with empty lists (load_csv preserves the reference's quirk of
    returning the raw key list there, util/io.py:100-102)."""
    out = load_csv(path, delimiter=delimiter, has_header=has_header)
    if isinstance(out, dict):
        return out
    return {k: [] for k in out}


def save_csv(data: Dict[Any, Any], path: str, delimiter: str = ",") -> None:
    """Write a dict of column -> list (or scalar) as CSV (reference util/io.py:85-104)."""
    cols = list(data.keys())
    lines = [delimiter.join(f"{c}" for c in cols)]
    if cols and isinstance(data[cols[0]], (list, np.ndarray)):
        n = len(data[cols[0]])
        for i in range(n):
            lines.append(delimiter.join(f"{data[c][i]}" for c in cols))
    elif cols:
        lines.append(delimiter.join(f"{data[c]}" for c in cols))
    save_txt("\n".join(lines), path)


# ---------------------------------------------------------------- archives
def unzip(tar_path: str, out_dir: str) -> None:
    """Extract a tar archive (reference util/io.py:108-111)."""
    with tarfile.open(tar_path, mode="r") as tar:
        # 'data' filter: rejects path traversal / absolute members from
        # untrusted dataset archives (and pins the 3.14 default now).
        try:
            tar.extractall(out_dir, filter="data")
        except TypeError:  # Python < 3.12: no filter parameter
            tar.extractall(out_dir)


def mkdir(path: str) -> None:
    os.makedirs(path, exist_ok=True)
