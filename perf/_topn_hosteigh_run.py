"""Re-measure the rehearsal topn sweep with BOTH round-5 optimizations:
nested whitened projections (transform once at d_max, slice per dim) and
host-LAPACK eigh dispatch. Compares every output pickle against the
committed baseline run in /tmp/scl_rehearsal/top_n.

Retrieval is NOT expected to be bit-identical to the baseline: host
float64 LAPACK and device float32 QR eigh are both valid decompositions,
and in the near-degenerate eigenvalue tail (where whitening divides by
sqrt of a tiny eigenvalue) the two pick different rotations of the same
subspace, flipping near-ties in neighbor ranking. The host path matches
the numerics the reference itself used (sklearn PCA = host float64
LAPACK, reference evaluation/top-n.py:74-77). The comparison (shared
with perf/_topn_hosteigh_cmp.py) prints top-1/top-25 agreement and the
localization metrics both ways so the committed log shows the flips are
metric-irrelevant. Log -> perf/_topn_hosteigh.log."""

import os
import time

from _topn_hosteigh_cmp import compare

from soft_contrastive_learning_tpu.cli import main as cli

root = "/tmp/scl_rehearsal"
lv = os.path.join(root, "lv")
csv_root = os.path.join(root, "lists")
out_root = os.path.join(root, "top_n_hosteigh")

t0 = time.time()
rc = cli([
    "topn",
    "--pca_lv_pickle", os.path.join(lv, "toy_pca_wms.pickle"),
    "--ref_lv_pickle", os.path.join(lv, "toy_ref_wms.pickle"),
    "--query_lv_pickle", os.path.join(lv, "toy_query_wms.pickle"),
    "--ref_csv", os.path.join(csv_root, "toy_ref.csv"),
    "--query_csv", os.path.join(csv_root, "toy_query.csv"),
    "--out_root", out_root, "--N", "25",
    "--dims", "64,128,256,512,1024,2048,4096",
    "--spacings", "0.0,0.3,1.0,5.0",
])
assert rc == 0, "topn failed"
dt = time.time() - t0
print(f"topn sweep (nested transform + host eigh): {dt:.1f}s", flush=True)

compare(os.path.join(root, "top_n"), out_root)
