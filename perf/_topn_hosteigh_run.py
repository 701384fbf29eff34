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
LAPACK, reference evaluation/top-n.py:74-77). This prints top-1/top-25
agreement and the localization metrics both ways so the committed log
shows the flips are metric-irrelevant. Log -> perf/_topn_hosteigh.log."""

import os
import pickle
import time

import numpy as np

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

base_root = os.path.join(root, "top_n")
print("setting          top1!=  t25ovl  %<5m(dev) %<5m(host) %<10m d %<10m h",
      flush=True)
worst = 0.0
for setting in sorted(os.listdir(base_root)):
    a = os.path.join(base_root, setting, "toy_query_wms.pickle")
    b = os.path.join(out_root, setting, "toy_query_wms.pickle")
    with open(a, "rb") as f:
        pa = pickle.load(f)
    with open(b, "rb") as f:
        pb = pickle.load(f)
    ia, ib = np.asarray(pa[0]), np.asarray(pb[0])
    ga, gb = np.asarray(pa[1]), np.asarray(pb[1])  # top-N geo dists
    n = ia.shape[0]
    top1_diff = int((ia[:, 0] != ib[:, 0]).sum())
    ovl = np.mean([
        len(set(ia[q]) & set(ib[q])) / ia.shape[1] for q in range(n)
    ])
    m = {}
    for tag, g in (("dev", ga), ("host", gb)):
        for t in (5.0, 10.0):
            m[(tag, t)] = float((g[:, 0] < t).mean() * 100.0)
    worst = max(worst, abs(m[("dev", 5.0)] - m[("host", 5.0)]),
                abs(m[("dev", 10.0)] - m[("host", 10.0)]))
    d_idx = np.nonzero(ia[:, 0] != ib[:, 0])[0]
    deltas = np.abs(ga[d_idx, 0] - gb[d_idx, 0]) if len(d_idx) else []
    print(f"{setting:16s} {top1_diff:5d}  {ovl*100:5.1f}%  "
          f"{m[('dev',5.0)]:8.1f} {m[('host',5.0)]:9.1f} "
          f"{m[('dev',10.0)]:6.1f} {m[('host',10.0)]:6.1f}"
          + (f"   max|d_geo delta| {max(deltas):.2f} m" if len(d_idx) else ""),
          flush=True)
print(f"worst metric delta across all settings/thresholds: {worst:.2f} pts",
      flush=True)
