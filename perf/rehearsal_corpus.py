"""Materialize the paper-results dress-rehearsal corpus (round-4 VERDICT #1).

Three disjoint toy-city sets at the FLAGSHIP input geometry (180x240),
written in the offline-eval filesystem contract (images + CSV lists with
path/easting/northing) that `scl-tpu infer` consumes — the synthetic stand-in
for the reference's inference CSV lists (reference evaluation/inference.py:
147-192):

* ``toy_pca``   — 4,400 images of a held-out city: the PCA-whitening fit set.
  4,400 > 4096 rows makes the FULL reference dim sweep D in {64..4096}
  usable (evaluation/topn.py filters d <= min(pca_features.shape)).
* ``toy_ref``   — 3,000 images around a reference loop at ~0.25 m pose
  spacing, so the reference's spacing sweep L in {0, 0.3, 1, 5} m
  (reference top-n.py:35-36) actually subsamples at every L.
* ``toy_query`` — 300 images on the SAME loop (same texture world, same
  coordinate frame) at a 1.5 m radial offset: geographically ~1.5 m from
  their nearest reference, photometrically distinct.

Texture seeds differ from the training city (perf/quality_run.py trains on
seed 3), so the rehearsal measures generalization, like the reference's
held-out query conditions (reference evaluation/roc.py:33-40).

Run (CPU-only, ~30 min on the 1-core host):
  PYTHONPATH=/root/repo python perf/rehearsal_corpus.py [out_root]
"""

import os
import sys
import time

import numpy as np

from soft_contrastive_learning_tpu.data.toycity import ToyCity
from soft_contrastive_learning_tpu.utils.io import mkdir, save_csv, save_img

REF_SPACING = 0.25  # meters between adjacent reference poses
QUERY_OFFSET = 1.5  # radial meters between a query and the reference loop


def build_sets():
    n_ref, n_query, n_pca = 3000, 300, 4400
    ref_radius = n_ref * REF_SPACING / (2 * np.pi)
    return {
        "toy_ref": ToyCity(
            num_points=n_ref, radius=ref_radius, img_h=180, img_w=240,
            seed=9, center=(1000.0, 2000.0),
        ),
        "toy_query": ToyCity(
            num_points=n_query, radius=ref_radius + QUERY_OFFSET,
            img_h=180, img_w=240, seed=9, center=(1000.0, 2000.0),
        ),
        "toy_pca": ToyCity(
            num_points=n_pca, radius=n_pca * REF_SPACING / (2 * np.pi),
            img_h=180, img_w=240, seed=11, center=(20000.0, 5000.0),
        ),
    }


def main():
    out_root = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scl_rehearsal"
    img_root = os.path.join(out_root, "imgs")
    csv_root = os.path.join(out_root, "lists")
    mkdir(img_root)
    mkdir(csv_root)
    for name, city in build_sets().items():
        csv_path = os.path.join(csv_root, f"{name}.csv")
        set_dir = os.path.join(img_root, name)
        mkdir(set_dir)
        t0 = time.time()
        paths = []
        for i in range(len(city)):
            rel = f"{name}/{i:06d}.png"
            full = os.path.join(img_root, rel)
            if not os.path.exists(full):  # idempotent restart
                save_img(city.image(i), full)
            paths.append(rel)
            if (i + 1) % 500 == 0:
                print(f"{name}: {i + 1}/{len(city)} "
                      f"({time.time() - t0:.0f}s)", flush=True)
        save_csv(
            {
                "path": paths,
                "easting": [f"{e}" for e in city.easting],
                "northing": [f"{x}" for x in city.northing],
                "yaw": [f"{y}" for y in city.yaw],
            },
            csv_path,
        )
        print(f"{name}: {len(city)} images -> {set_dir} "
              f"in {time.time() - t0:.0f}s", flush=True)
    print("REHEARSAL CORPUS DONE", flush=True)


if __name__ == "__main__":
    main()
