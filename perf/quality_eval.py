"""Trained-vs-untrained recall on a fixed query set (quality evidence #2).

perf/quality_run.py's in-training eval windows rotate, so its localization
series aren't window-matched. This closes the loop: load the final
checkpoint from /tmp/scl_quality_run, embed the SAME fixed query/reference
sets with (a) the trained params and (b) a fresh seed-0 init, and compare
top-1 localization — the reference's observational QC question
(train/train.py:1070-1092) asked with a controlled variable. The toy-city
geometry is identical to the training run (same num_points/radius/seed);
queries come from the held-out test city against the train-city index? No
— each city is its own loop; queries and references are DIFFERENT images
of the SAME train loop (every 3rd point as query, rest as index), plus
the same protocol on the held-out test loop.

Run alone on the chip AFTER perf/quality_run.py:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quality_eval.py [run_dir]
"""

import sys

import numpy as np


def recall_rows(label, embed_np, city, trained_first):
    # The split/retrieval protocol lives in evaluation/metrics.py::
    # fixed_split_recall (shared with perf/async_quality.py).
    from soft_contrastive_learning_tpu.evaluation.metrics import (
        fixed_split_recall,
    )

    n = len(city)
    imgs = np.stack([city.image(i) for i in range(n)])
    xy = np.stack([city.easting, city.northing], axis=1)
    for name, params in trained_first:
        out = []
        for s in range(0, n, 64):
            out.append(embed_np(params, imgs[s:s + 64]))
        rec = fixed_split_recall(np.concatenate(out), xy)
        print(f"{label} {name:9s}: %<10m {rec['%<10m']:5.1f}"
              f"  %<25m {rec['%<25m']:5.1f}  %<50m {rec['%<50m']:5.1f}"
              f"  (|q|={int(rec['n_query'])}, |ref|={int(rec['n_ref'])})",
              flush=True)


def main():
    import jax
    import jax.numpy as jnp

    from soft_contrastive_learning_tpu.bench_train import flagship_toy_config
    from soft_contrastive_learning_tpu.checkpoints.manager import load_run_params
    from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
    from soft_contrastive_learning_tpu.models.model import create_model, init_params

    print("backend", jax.default_backend(), flush=True)
    num_points = 600
    cfg = flagship_toy_config(tuples_per_batch=2, num_points=num_points)
    mcfg = cfg.model
    radius = num_points * 8.0 / (2 * np.pi)
    src = ToyCitySource(
        num_points=num_points, radius=radius, seed=3,
        img_h=mcfg.image_height, img_w=mcfg.image_width,
    )

    run_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scl_quality_run"
    saved_cfg, trained = load_run_params(run_dir)
    fresh = init_params(mcfg, jax.random.key(0))
    model = create_model(mcfg)
    embed = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])

    def embed_np(params, arr):
        return np.asarray(
            embed(params, jnp.asarray(arr, jnp.float32)), np.float32
        )

    pairs = (("untrained", fresh), ("trained", trained))
    recall_rows("train-city", embed_np, src.cities["train"], pairs)
    recall_rows("test-city ", embed_np, src.cities["test"], pairs)


if __name__ == "__main__":
    main()
