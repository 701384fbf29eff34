"""Descriptor-level parity harness against the reference TF1 checkpoints.

The reference's reason to exist is its released trained models (reference
model/nets.py:12 scope convention; partial restore train/train.py:882-905).
This environment has neither network access nor the RobotCar artifacts, so
the harness is shipped as runnable code that completes the PARITY.md layer-2
protocol the moment artifacts are present:

1. On any machine with the released checkpoint: export it to .npz (snippet
   in models/convert_tf1.py) and, optionally, run the TF1 graph on a folder
   of images and save the descriptors as a "golden" .npz
   (``{"descriptors": (N, D), "files": [...]}``).
2. Here: ``scl-tpu parity --checkpoint ckpt.npz --images dir/`` converts the
   weights, warm-starts the flagship EmbeddingNet, embeds the same images in
   float32, and either writes our descriptors (to golden-compare elsewhere)
   or — with ``--golden`` — diffs them in place and passes/fails on
   tolerance.

The same flow is exercised end-to-end in tests/test_parity_harness.py with
synthetic artifacts (random TF1-named variables + procedural images), and
auto-runs against real artifacts when SCL_TPU_PARITY_CKPT / _IMAGES /
_GOLDEN point at them.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence

import jax
import numpy as np

from soft_contrastive_learning_tpu.checkpoints.manager import warm_start_params
from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.convert_tf1 import convert_checkpoint
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.utils.cv import normalize_geometry, standard_size
from soft_contrastive_learning_tpu.utils.io import load_img

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".bmp")


@dataclass
class ParityReport:
    n_images: int
    descriptor_dim: int
    converted_vars: int
    warm_started_scopes: List[str]
    max_abs_diff: Optional[float] = None
    min_cosine: Optional[float] = None
    tolerance: Optional[float] = None
    passed: Optional[bool] = None
    descriptors_path: Optional[str] = None

    def to_dict(self) -> dict:
        return dict(self.__dict__)


def _list_images(images: str) -> List[str]:
    if os.path.isdir(images):
        files = sorted(
            os.path.join(images, f)
            for f in os.listdir(images)
            if f.lower().endswith(IMAGE_EXTENSIONS)
        )
    else:  # newline-separated list file
        with open(images) as fh:
            files = [ln.strip() for ln in fh if ln.strip()]
    if not files:
        raise FileNotFoundError(f"no images found in {images!r}")
    return files


def embed_with_checkpoint(
    checkpoint: str,
    image_files: Sequence[str],
    cfg: Optional[ModelConfig] = None,
    batch_size: int = 16,
):
    """convert -> warm-start -> float32 embed. Returns (descriptors, report).

    float32 compute: parity layer 2 compares against the TF1 fp32 graph, so
    bf16 must not contribute (PARITY.md tolerance ~1e-4 relative)."""
    donor, mapping = convert_checkpoint(checkpoint)
    if cfg is None:
        # Infer the architecture from the converted tensors (the reference
        # encodes it in the checkpoint: cluster_centers is (D, K)).
        vlad = (
            int(donor["netvlad"]["cluster_centers"].shape[-1])
            if "netvlad" in donor
            else 0
        )
        cfg = ModelConfig(
            vlad_cores=vlad,
            reduction="none",
            compute_dtype="float32",
            use_pallas=False,
        )
    model = create_model(cfg)
    fresh = init_params(cfg, jax.random.key(0), batch=1)
    params, copied = warm_start_params(fresh, donor)

    fwd = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
    descs = []
    for start in range(0, len(image_files), batch_size):
        chunk = image_files[start : start + batch_size]
        imgs = np.stack(
            [
                # keep-aspect for NetVLAD models, exactly like the inference
                # extractor (evaluation/inference.py) and the reference's
                # NetVLAD preprocessing — a center-crop here would feed
                # different pixels than the TF1 run and fail golden parity
                # on any image whose aspect differs from H:W.
                normalize_geometry(
                    load_img(f), cfg.image_height, cfg.image_width,
                    keep_aspect=cfg.vlad_cores > 0,
                )
                for f in chunk
            ]
        ).astype(np.float32)
        descs.append(np.asarray(fwd(params, imgs), np.float32))
    descriptors = np.concatenate(descs)
    report = ParityReport(
        n_images=len(image_files),
        descriptor_dim=int(descriptors.shape[1]),
        converted_vars=len(mapping),
        warm_started_scopes=list(copied),
    )
    return descriptors, report


def compare_descriptors(
    ours: np.ndarray, golden: np.ndarray, tolerance: float = 1e-3
) -> Dict[str, float]:
    """Max-abs + min-cosine diff between descriptor matrices (same order)."""
    if ours.shape != golden.shape:
        raise ValueError(f"shape mismatch: ours {ours.shape} vs golden {golden.shape}")
    ours64, gold64 = ours.astype(np.float64), golden.astype(np.float64)
    cos = np.sum(ours64 * gold64, -1) / (
        np.linalg.norm(ours64, axis=-1) * np.linalg.norm(gold64, axis=-1) + 1e-30
    )
    return {
        "max_abs_diff": float(np.abs(ours64 - gold64).max()),
        "min_cosine": float(cos.min()),
        "passed": bool(np.abs(ours64 - gold64).max() <= tolerance),
    }


def run_parity(
    checkpoint: str,
    images: str,
    golden: Optional[str] = None,
    out: Optional[str] = None,
    tolerance: float = 1e-3,
    cfg: Optional[ModelConfig] = None,
) -> ParityReport:
    """The full layer-2 protocol. With ``golden``: diff + pass/fail. Without:
    write our descriptors to ``out`` for comparison on the reference side."""
    files = _list_images(images)
    descriptors, report = embed_with_checkpoint(checkpoint, files, cfg=cfg)
    if golden is not None:
        with np.load(golden, allow_pickle=True) as z:
            gold = np.asarray(z["descriptors"], np.float32)
        stats = compare_descriptors(descriptors, gold, tolerance)
        report.max_abs_diff = stats["max_abs_diff"]
        report.min_cosine = stats["min_cosine"]
        report.tolerance = tolerance
        report.passed = stats["passed"]
    if out is not None:
        np.savez(
            out,
            descriptors=descriptors,
            files=np.asarray(files, dtype=object),
        )
        report.descriptors_path = out
    return report
