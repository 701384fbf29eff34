"""Flagship-scale training-quality evidence run (round-3 VERDICT #5).

Descriptor parity vs the released TF1 checkpoints is artifact-blocked in
this environment (VERDICT Missing #1), so this produces the quality
evidence that IS obtainable here: a recorded multi-epoch wms training run
at the FULL flagship shape (VGG16 + 64-cluster NetVLAD, bf16, Pallas
aggregation, 180x240, B = 2 tuples x (1+12+12) = 50) on the real chip,
on the toy city at flagship scale — loss trajectory + localization
metrics (the reference's observational QC loop, train/train.py:1070-1092)
improving from the untrained baseline. Results land in docs/QUALITY.md;
any round-4 regression is diffable against it.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quality_run.py \
      [cfg_seed] [run_dir] [tuples_per_batch] [max_epoch] [lr_scale]

``cfg_seed`` (default 0) seeds weight init + the sampler stream; the city
GEOMETRY stays seed=3 so recall numbers are comparable across cfg seeds —
a second cfg_seed measures the run-to-run noise the QUALITY.md regression
margins rest on (round-4 VERDICT #5). ``tuples_per_batch`` (default 2 =
the reference's B=50 geometry, train/train.py:1241-1280) scales the batch
for the larger-batch quality spot-check (round-4 VERDICT #4);
``max_epoch`` (default 3) shortens spot-check runs; ``lr_scale`` (default
1.0) scales the base LR linearly with the batch — required at tpb=4 to
match B=50 recall (docs/TRAINBENCH.md spot-check: 77.5 vs 58.0 %<10m).
"""

import dataclasses
import json
import os
import shutil
import sys
import time

import numpy as np


def main():
    import jax

    from soft_contrastive_learning_tpu.bench_train import flagship_toy_config
    from soft_contrastive_learning_tpu.data.decoded_cache import (
        CachedDecodedSource, cache_training_sets,
    )
    from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
    from soft_contrastive_learning_tpu.train.trainer import Trainer

    cfg_seed = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    run_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scl_quality_run"
    tpb = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    max_epoch = int(sys.argv[4]) if len(sys.argv) > 4 else 3
    # Linear LR scaling for the larger-batch spot-check (Goyal et al.:
    # LR ~ batch keeps the per-epoch optimization trajectory comparable
    # when the step count halves at tpb=4). Default 1.0 = reference LR.
    lr_scale = float(sys.argv[5]) if len(sys.argv) > 5 else 1.0
    print(f"backend {jax.default_backend()} cfg_seed {cfg_seed} "
          f"tuples_per_batch {tpb} max_epoch {max_epoch} "
          f"lr_scale {lr_scale}", flush=True)
    num_points = 600
    cfg = flagship_toy_config(tuples_per_batch=tpb, num_points=num_points)
    cfg = dataclasses.replace(
        cfg, max_epoch=max_epoch, eval_step=100, mining_step=100,
        num_eval_queries=20, seed=cfg_seed,
        base_lr=cfg.base_lr * lr_scale,
    )

    radius = num_points * 8.0 / (2 * np.pi)
    src = ToyCitySource(
        num_points=num_points, radius=radius, seed=3,
        img_h=cfg.model.image_height, img_w=cfg.model.image_width,
    )
    # shared decoded cache (idempotent; already built by bench_train runs)
    tmp = "/tmp/scl_trainbench_shared"
    cache_dir = os.path.join(tmp, "decoded_cache")
    cache_training_sets(
        src, ["train_ref", "test_ref"],
        cfg.model.image_height, cfg.model.image_width,
        keep_aspect=True, cache_dir=cache_dir,
        cluster_sets=[("train_ref", cfg.eval_ref_r),
                      ("test_ref", cfg.eval_ref_r)],
    )
    src = CachedDecodedSource(src, cache_dir)

    shutil.rmtree(run_dir, ignore_errors=True)
    tr = Trainer(cfg, src, out_dir=run_dir)
    t0 = time.time()
    tr.train()
    wall = time.time() - t0
    tr.close()
    print(f"train wall: {wall:.1f}s, steps: {tr.global_step}", flush=True)

    # ---- summarize the run's own metrics files ----
    def load(role):
        with open(os.path.join(run_dir, f"metrics_{role}.jsonl")) as f:
            return [json.loads(l) for l in f]

    local = load("local")
    losses = [(r["step"], r["value"]) for r in local if r["tag"] == "loss"]
    losses.sort()
    first = [v for _, v in losses[:50]]
    last = [v for _, v in losses[-50:]]
    print(f"loss: first-50 mean {np.mean(first):.4f}  "
          f"last-50 mean {np.mean(last):.4f}  "
          f"({len(losses)} steps logged)", flush=True)

    for role in ("local", "other"):
        recs = load(role)
        for tag in ("%<10m@Top1", "10m-auc@Top1", "%<25m@Top1"):
            series = sorted(
                (r["step"], r["value"]) for r in recs if r["tag"] == tag
            )
            if series:
                path = " ".join(f"{s}:{v:.1f}" for s, v in series)
                print(f"{role} {tag}: {path}", flush=True)

    print("QUALITY RUN DONE", flush=True)


if __name__ == "__main__":
    main()
