"""Sync-vs-async mining: training-quality equivalence experiment.

``TrainConfig(async_mining=True)`` trades the reference's refresh barrier
(reference train/train.py:1014-1018) for a stale-by-up-to-one-window cache:
the first batches of a segment may take hard examples from the PREVIOUS
window (or fall back to non-hard for anchors the old window doesn't hold).
The predictable question is whether that staleness costs training quality.

This runs the SAME training twice — identical seed, toy city, hard mining
on (1 hard pos + 1 hard neg per tuple), wms, aggressive mining cadence so
staleness has maximal surface — differing ONLY in async_mining, and
compares (a) the per-step loss trajectories and (b) final top-1
localization on fixed query splits of both cities.

CPU-runnable (forced cpu; ~10 min on the 1-core dev host):
  PYTHONPATH=/root/repo python perf/async_quality.py
On the real chip, drop the env override to run the flagship-sized variant:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/async_quality.py --flagship
"""

import argparse
import json
import os
import re
import shutil
import sys

if "--flagship" not in sys.argv:
    # Force a 1-device CPU mesh even when XLA_FLAGS already carries a count
    # (e.g. leftover from the multichip-dryrun workflow) — setdefault alone
    # would keep the stale value (same rewrite as __graft_entry__).
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in _flags:
        _flags = re.sub(
            r"--xla_force_host_platform_device_count=\d+",
            "--xla_force_host_platform_device_count=1", _flags,
        )
    else:
        _flags = f"{_flags} --xla_force_host_platform_device_count=1".strip()
    os.environ["XLA_FLAGS"] = _flags

import numpy as np


def build_cfg(flagship: bool, async_mining: bool):
    from soft_contrastive_learning_tpu.core.config import (
        LossConfig, ModelConfig, TrainConfig, TupleConfig,
    )

    if flagship:
        model = ModelConfig()  # 180x240, vlad 64, bf16
        tuples = TupleConfig(hard_positives_per_tuple=2,
                             hard_negatives_per_tuple=2)
        return TrainConfig(
            model=model, tuples=tuples, loss=LossConfig(name="wms"),
            tuples_per_batch=2, max_epoch=2, mining_step=50,
            mining_cache_size=300, eval_step=10**8, save_step=10**8,
            num_eval_queries=10, eval_ref_r=5, train_ref_r=1,
            async_mining=async_mining, seed=11,
        )
    model = ModelConfig(
        vlad_cores=8, reduction="none", image_height=64, image_width=80,
        compute_dtype="float32", use_pallas=False,
    )
    tuples = TupleConfig(
        positives_per_tuple=3, negatives_per_tuple=3,
        hard_positives_per_tuple=1, hard_negatives_per_tuple=1,
    )
    return TrainConfig(
        model=model, tuples=tuples, loss=LossConfig(name="wms"),
        tuples_per_batch=1, max_epoch=2, mining_step=6, mining_cache_size=12,
        eval_step=10**8, save_step=10**8, num_eval_queries=4, eval_ref_r=4,
        train_ref_r=1, async_mining=async_mining, seed=11,
    )


def make_source(flagship: bool):
    from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource

    if flagship:
        return ToyCitySource(num_points=300, radius=300 * 8.0 / (2 * np.pi),
                             seed=3, img_h=180, img_w=240)
    return ToyCitySource(num_points=48, radius=48 * 8.0 / (2 * np.pi),
                         seed=3, img_h=64, img_w=80)


def final_recall(tr, set_name: str):
    """Fixed-split top-1 localization (%<r m) on ``set_name``'s city —
    the shared protocol (evaluation/metrics.py::fixed_split_recall)."""
    from soft_contrastive_learning_tpu.evaluation.metrics import (
        fixed_split_recall,
    )
    from soft_contrastive_learning_tpu.utils.meta import get_xy

    meta = tr.source.epoch_meta(set_name, 0)
    n = len(meta["t"])
    feats = tr.extract_features(meta, np.arange(n))
    rec = fixed_split_recall(feats, get_xy(meta))
    return {k: round(v, 1) for k, v in rec.items() if k.startswith("%<")}


def run_mode(flagship: bool, async_mining: bool, out_root: str):
    from soft_contrastive_learning_tpu.train.trainer import Trainer

    cfg = build_cfg(flagship, async_mining)
    out_dir = os.path.join(out_root, "async" if async_mining else "sync")
    # Fresh run dir: MetricsWriter appends, so a stale dir from an earlier
    # invocation would double the read-back loss records (wrong steps/means).
    shutil.rmtree(out_dir, ignore_errors=True)
    tr = Trainer(cfg, make_source(flagship), out_dir=out_dir)
    tr.train()
    losses = [r["value"] for r in tr.writers["local"].read_all()
              if r["tag"] == "loss"]
    n = len(losses)
    res = {
        "async_mining": async_mining,
        "steps": n,
        "mean_loss_first_half": round(float(np.mean(losses[: n // 2])), 4),
        "mean_loss_second_half": round(float(np.mean(losses[n // 2:])), 4),
        "recall_train": final_recall(tr, cfg.local_ref_set),
        "recall_heldout": final_recall(tr, cfg.other_ref_set),
    }
    tr.close()
    return res


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flagship", action="store_true")
    ap.add_argument("--out_root", default="/tmp/scl_async_quality")
    args = ap.parse_args()
    if not args.flagship:
        import jax

        jax.config.update("jax_platforms", "cpu")
    for mode in (False, True):
        print(json.dumps(run_mode(args.flagship, mode, args.out_root)))


if __name__ == "__main__":
    main()
