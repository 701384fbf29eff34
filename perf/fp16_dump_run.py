"""Measure + characterize the float16 descriptor-dump option (round 5).

After perf/rehearsal_run.py has produced the float32 dumps in
/tmp/scl_rehearsal/lv, this:

1. writes float16 copies of the three dumps (bit-identical to what
   `scl-tpu infer --dump_dtype float16` would have stored: the cast is the
   same `astype(np.float16)` on the same float32 features);
2. re-runs the FULL topn sweep on the float32 dumps (warm CLI compile
   cache — isolates the persistent-cache win from the transfer win);
3. runs the sweep on the float16 dumps (same warm cache — the remaining
   delta is the halved host->HBM traffic + f16 pickle IO);
4. compares all 28 settings' retrieval output f32-vs-f16 with the shared
   comparison table (perf/_topn_hosteigh_cmp.py): top-1 agreement, top-25
   overlap, and the localization metrics both ways.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/fp16_dump_run.py
Log -> perf/_fp16_dump.log.
"""

import os
import pickle
import time

import numpy as np

from _topn_hosteigh_cmp import compare

from soft_contrastive_learning_tpu.cli import main as cli

root = "/tmp/scl_rehearsal"
lv = os.path.join(root, "lv")
lv16 = os.path.join(root, "lv16")
csv_root = os.path.join(root, "lists")

os.makedirs(lv16, exist_ok=True)
for s in ("toy_pca", "toy_ref", "toy_query"):
    src = os.path.join(lv, f"{s}_wms.pickle")
    dst = os.path.join(lv16, f"{s}_wms.pickle")
    if os.path.exists(dst):
        continue
    with open(src, "rb") as f:
        feats = pickle.load(f)
    with open(dst, "wb") as f:
        pickle.dump(np.asarray(feats).astype(np.float16), f)
    print(f"{s}: {os.path.getsize(src)/1e6:.0f} MB f32 -> "
          f"{os.path.getsize(dst)/1e6:.0f} MB f16", flush=True)


def sweep(lv_root: str, out_name: str) -> float:
    t0 = time.time()
    rc = cli([
        "topn",
        "--pca_lv_pickle", os.path.join(lv_root, "toy_pca_wms.pickle"),
        "--ref_lv_pickle", os.path.join(lv_root, "toy_ref_wms.pickle"),
        "--query_lv_pickle", os.path.join(lv_root, "toy_query_wms.pickle"),
        "--ref_csv", os.path.join(csv_root, "toy_ref.csv"),
        "--query_csv", os.path.join(csv_root, "toy_query.csv"),
        "--out_root", os.path.join(root, out_name), "--N", "25",
        "--dims", "64,128,256,512,1024,2048,4096",
        "--spacings", "0.0,0.3,1.0,5.0",
    ])
    assert rc == 0, f"topn {out_name} failed"
    return time.time() - t0


t_f32_warm = sweep(lv, "top_n_f32warm")
print(f"topn sweep f32, warm compile cache: {t_f32_warm:.1f}s", flush=True)
t_f16 = sweep(lv16, "top_n_f16")
print(f"topn sweep f16, warm compile cache: {t_f16:.1f}s", flush=True)

worst = compare(os.path.join(root, "top_n_f32warm"),
                os.path.join(root, "top_n_f16"))
print(f"f32-vs-f16 worst localization-metric delta: {worst:.2f} pts",
      flush=True)
