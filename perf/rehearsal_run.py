"""Paper-results dress rehearsal on the chip (round-4 VERDICT #1).

Executes the ONE workflow the reference exists to produce — reference §3.4:
descriptor inference -> PCA-whitened top-N sweep -> ROC figure
(reference evaluation/inference.py:147-192, top-n.py:23-119, roc.py:29-289)
— end to end through the CLI surface, at the FULL flagship descriptor width
(VGG16 + NetVLAD-64 -> 32,768-D raw dumps, PCA-whitened D in {64..4096},
L in {0, 0.3, 1, 5} m, N=25), on the trained 5-epoch flagship checkpoint,
over the few-thousand-image corpus from perf/rehearsal_corpus.py.

Per-stage wall times are printed and summarized at the end; the top-n
pickles + figures land in {out_root}/top_n and {out_root}/figs for
committing (the raw 32k-D feature dumps are reported by size/sha but NOT
meant for git — toy_pca alone is ~576 MB).

Run alone on the chip AFTER perf/rehearsal_corpus.py and a trained run:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/rehearsal_run.py \
      [run_dir] [corpus_root]
"""

import hashlib
import json
import os
import sys
import time

import numpy as np


def main():
    import jax

    from soft_contrastive_learning_tpu.cli import main as cli

    # default checkpoint: a local 5-epoch quality run when present, else the
    # COMMITTED trained artifact — so the whole rehearsal is reproducible
    # from a fresh checkout (corpus render + this script), no training run
    # required (cli._load_model_params accepts the flagship npz directly).
    default_ckpt = "/tmp/scl_quality_run_r5"
    if len(sys.argv) > 1:
        run_dir = sys.argv[1]
    elif os.path.isdir(default_ckpt):
        run_dir = default_ckpt
    else:
        from soft_contrastive_learning_tpu import flagship

        run_dir = flagship.TRAINED_PARAMS_PATH
    root = sys.argv[2] if len(sys.argv) > 2 else "/tmp/scl_rehearsal"
    csv_root = os.path.join(root, "lists")
    img_root = os.path.join(root, "imgs")
    lv = os.path.join(root, "lv")
    top_n_root = os.path.join(root, "top_n")
    figs = os.path.join(root, "figs")
    print(f"backend {jax.default_backend()}  run_dir {run_dir}", flush=True)

    timings = {}

    # ---- stage 1: descriptor inference (32,768-D raw dumps) ----
    for set_name in ("toy_pca", "toy_ref", "toy_query"):
        out_pickle = os.path.join(lv, f"{set_name}_wms.pickle")
        if os.path.exists(out_pickle):
            print(f"infer {set_name}: exists, skipping", flush=True)
            continue
        t0 = time.time()
        rc = cli([
            "infer", "--set", set_name, "--csv_root", csv_root,
            "--img_root", img_root, "--checkpoint", run_dir,
            "--out_name", "wms", "--out_root", lv,
            "--images_per_pass", "256",
        ])
        assert rc == 0, f"infer {set_name} failed"
        dt = time.time() - t0
        timings[f"infer_{set_name}"] = dt
        sz = os.path.getsize(out_pickle)
        with open(out_pickle, "rb") as f:
            sha = hashlib.sha256(f.read()).hexdigest()[:16]
        print(f"infer {set_name}: {dt:.1f}s  {sz / 1e6:.0f} MB  "
              f"sha256/16 {sha}", flush=True)

    # ---- stage 2: PCA-whitened top-N sweep (full reference protocol) ----
    t0 = time.time()
    rc = cli([
        "topn",
        "--pca_lv_pickle", os.path.join(lv, "toy_pca_wms.pickle"),
        "--ref_lv_pickle", os.path.join(lv, "toy_ref_wms.pickle"),
        "--query_lv_pickle", os.path.join(lv, "toy_query_wms.pickle"),
        "--ref_csv", os.path.join(csv_root, "toy_ref.csv"),
        "--query_csv", os.path.join(csv_root, "toy_query.csv"),
        "--out_root", top_n_root, "--N", "25",
        # defaults: dims 64..4096, spacings 0,0.3,1,5 — stated explicitly so
        # the committed log records the protocol
        "--dims", "64,128,256,512,1024,2048,4096",
        "--spacings", "0.0,0.3,1.0,5.0",
    ])
    assert rc == 0, "topn failed"
    timings["topn_sweep"] = time.time() - t0
    print(f"topn D x L sweep: {timings['topn_sweep']:.1f}s", flush=True)

    # ---- stage 3: ROC figures ----
    for l, d in (("0.0", 256), ("5.0", 4096)):
        t0 = time.time()
        rc = cli([
            "roc", "--top_n_root", top_n_root, "--out_root", figs,
            "--l", l, "--d", str(d), "--queries", "toy_query",
        ])
        assert rc == 0, f"roc l{l} d{d} failed"
        timings[f"roc_l{l}_dim{d}"] = time.time() - t0
    print(f"roc figures: {sorted(os.listdir(figs))}", flush=True)

    # ---- summary: recall at representative settings ----
    from soft_contrastive_learning_tpu.evaluation.roc import (
        correctly_localized_curve,
        load_top1_dists,
    )

    print("setting  %<5m  %<10m  %<25m  (gt<5m upper bound)  n_query",
          flush=True)
    for setting in sorted(os.listdir(top_n_root)):
        p = os.path.join(top_n_root, setting, "toy_query_wms.pickle")
        if not os.path.exists(p):
            continue
        top1, gt = load_top1_dists(p)
        pct = {
            t: float((np.asarray(top1) < t).mean() * 100.0)
            for t in (5.0, 10.0, 25.0)
        }
        ub = float((np.asarray(gt) < 5.0).mean() * 100.0)
        print(f"{setting:16s} {pct[5.0]:5.1f} {pct[10.0]:6.1f} "
              f"{pct[25.0]:6.1f}   ({ub:5.1f})        {len(top1)}",
              flush=True)

    print("TIMINGS " + json.dumps({k: round(v, 1) for k, v in timings.items()}),
          flush=True)
    print("REHEARSAL DONE", flush=True)


if __name__ == "__main__":
    main()
