"""Quantify the host-eigh vs device-eigh retrieval differences across all
28 rehearsal settings: top-1 agreement, top-25 set overlap, and the
%-correctly-localized metrics both ways (host float64 LAPACK and device
float32 QR eigh are both valid decompositions; whitened coordinates agree
to ~1e-3, so near-ties in neighbor ranking may flip — this measures
whether any flip is metric-relevant).

Also imported by perf/_topn_hosteigh_run.py so the committed measurement
log and this standalone comparison share one implementation.
"""

import os
import pickle

import numpy as np


def compare(base_root: str, new_root: str) -> float:
    """Print the per-setting comparison table; returns the worst
    localization-metric delta (pts) across all settings/thresholds."""
    print(
        "setting          top1!=  t25ovl  %<5m(dev) %<5m(host) %<10m d %<10m h",
        flush=True,
    )
    worst = 0.0
    for setting in sorted(os.listdir(base_root)):
        a = os.path.join(base_root, setting, "toy_query_wms.pickle")
        b = os.path.join(new_root, setting, "toy_query_wms.pickle")
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
        # geo distance of top-1 disagreements under both rankings
        d_idx = np.nonzero(ia[:, 0] != ib[:, 0])[0]
        deltas = np.abs(ga[d_idx, 0] - gb[d_idx, 0]) if len(d_idx) else []
        print(f"{setting:16s} {top1_diff:5d}  {ovl*100:5.1f}%  "
              f"{m[('dev',5.0)]:8.1f} {m[('host',5.0)]:9.1f} "
              f"{m[('dev',10.0)]:6.1f} {m[('host',10.0)]:6.1f}"
              + (f"   max|d_geo delta| {max(deltas):.2f} m"
                 if len(d_idx) else ""),
              flush=True)
    print(f"worst metric delta across all settings/thresholds: {worst:.2f} pts",
          flush=True)
    return worst


if __name__ == "__main__":
    root = "/tmp/scl_rehearsal"
    compare(os.path.join(root, "top_n"), os.path.join(root, "top_n_hosteigh"))
