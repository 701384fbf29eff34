"""Offline batch descriptor extraction.

Capability parity with reference evaluation/inference.py: embed a CSV image
list (column ``path`` relative to an image root) with a trained model and dump
the feature matrix as ``{set}_{out_name}.pickle`` (reference
evaluation/inference.py:166-192). The threaded feed_dict pipeline becomes a
jitted embed step with host-side prefetch of decoded batches.

For ``reduction in ('none', 'pca')`` the RAW descriptor is dumped and PCA
happens downstream in top-N (reference evaluation/inference.py:94-95).
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor
from typing import Callable, List, Optional, Sequence

import jax
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import create_model
from soft_contrastive_learning_tpu.parallel.mesh import pad_to_multiple, shard_batch
from soft_contrastive_learning_tpu.utils.cv import normalize_geometry
from soft_contrastive_learning_tpu.utils.io import load_csv, load_img, save_pickle


class DescriptorExtractor:
    """Jitted batched embedding with decode prefetch; reusable across sets."""

    def __init__(
        self,
        cfg: ModelConfig,
        params,
        batch_size: int = 32,
        mesh=None,
        portrait: bool = False,
        raw_descriptor: bool = True,
        quant_scales=None,
    ):
        self.cfg = cfg
        self.params = params
        self.batch_size = batch_size
        self.mesh = mesh
        self.portrait = portrait
        self.raw = raw_descriptor
        self._model = create_model(cfg)
        self._pool = ThreadPoolExecutor(max_workers=8)
        if quant_scales is not None:
            # int8 post-training-quantized conv stack (models/quant.py);
            # same (output, full) contract as the float embed step. The
            # 64 MiB scoped-vmem option is the measured serving winner
            # (+3%, perf/_quant_push.log); it only compiles for batches
            # <= 2048, which every serving batch here satisfies.
            import jax as _jax

            from soft_contrastive_learning_tpu.models.quant import quantized_embed

            opts = (
                {"xla_tpu_scoped_vmem_limit_kib": "65536"}
                if _jax.default_backend() == "tpu" and batch_size <= 2048
                else None
            )
            self._embed = _jax.jit(
                lambda p, x: quantized_embed(cfg, p, quant_scales, x),
                compiler_options=opts,
            )
        else:
            # Same jitted embed as the trainer (train/step.py::build_embed_step).
            from soft_contrastive_learning_tpu.train.step import build_embed_step

            self._embed = build_embed_step(cfg, self._model)

    def extract_images(self, images: Sequence[np.ndarray]) -> np.ndarray:
        prepared = [
            normalize_geometry(
                np.asarray(im), self.cfg.image_height, self.cfg.image_width,
                keep_aspect=self.cfg.vlad_cores > 0, portrait=self.portrait,
            )
            for im in images
        ]
        # uint8 on the wire (matches data/pipeline.py); the model casts.
        arr = np.stack(prepared).astype(np.uint8)
        n = len(arr)
        arr = pad_to_multiple(arr, self.batch_size)
        feats = []
        for start in range(0, len(arr), self.batch_size):
            x = shard_batch(arr[start : start + self.batch_size], self.mesh)
            output, full = self._embed(self.params, x)
            feats.append(np.asarray(full if self.raw else output))
        return np.concatenate(feats)[:n]

    def extract_files(self, paths: Sequence[str], img_root: str = "") -> np.ndarray:
        def load(p):
            return load_img(os.path.join(img_root, p))

        n = len(paths)
        out: List[np.ndarray] = []
        # decode next chunk on the pool while the device embeds the current one
        chunk = self.batch_size * 4
        futures = None
        for start in range(0, n, chunk):
            batch_paths = paths[start : start + chunk]
            images = list(futures) if futures is not None else list(
                self._pool.map(load, batch_paths)
            )
            nxt = paths[start + chunk : start + 2 * chunk]
            futures = self._pool.map(load, nxt) if nxt else None
            out.append(self.extract_images(images))
        if out:
            return np.concatenate(out)
        dim = (
            self.cfg.descriptor_dim if self.raw else self.cfg.output_dim
        )
        return np.zeros((0, dim), np.float32)


def run_inference(
    cfg: ModelConfig,
    params,
    set_name: str,
    csv_root: str,
    img_root: str,
    out_root: str,
    out_name: str,
    batch_size: int = 32,
    mesh=None,
    dump_dtype: str = "float32",
) -> str:
    """CSV image list -> feature pickle ``{set}_{out_name}.pickle``.

    ``dump_dtype='float16'`` halves the dump (the flagship 32,768-D dumps
    are the paper pipeline's dominant disk + host->device transfer cost:
    ~1 GB per rehearsal corpus at float32). Descriptors are unit-norm, so
    |v| <= 1 and float16 cannot overflow; the rounding's retrieval-metric
    effect is characterized in docs/REHEARSAL.md (same protocol as the
    host-eigh swap). Downstream needs no changes: top-N ships the stored
    dtype to the device and PCA casts to float32 there."""
    meta = load_csv(os.path.join(csv_root, f"{set_name}.csv"))
    paths = list(meta["path"])
    if "oxs" in set_name:  # reference quirk: jpg variants for 'oxs' sets
        paths = [p.replace(".png", ".jpg") for p in paths]
    extractor = DescriptorExtractor(
        cfg, params, batch_size=batch_size, mesh=mesh,
        portrait="achen" in set_name,
        raw_descriptor=cfg.reduction in ("none", "pca"),
    )
    features = extractor.extract_files(paths, img_root)
    if dump_dtype not in ("float32", "float16"):
        raise ValueError(f"dump_dtype must be float32|float16, got {dump_dtype!r}")
    features = features.astype(np.dtype(dump_dtype), copy=False)
    os.makedirs(out_root, exist_ok=True)
    out_path = os.path.join(out_root, f"{set_name}_{out_name}.pickle")
    save_pickle(features, out_path)
    return out_path
