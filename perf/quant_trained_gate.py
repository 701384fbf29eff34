"""int8-PTQ quality gate on TRAINED weights (round-4 VERDICT #2).

Round 3 calibrated and gated the int8 serving path on seed-0 RANDOM
weights; the activation distributions PTQ must survive are a trained
network's. This measures, on the real chip, with the committed trained
artifact (soft_contrastive_learning_tpu/assets/flagship_trained.npz,
exported from the perf/quality_run.py checkpoint):

1. descriptor cosine int8-vs-float on the shipped calibration batch
   (exactly benchmark.py's gate),
2. descriptor cosine on REAL images (held-out toy test city — the
   network's actual activation statistics),
3. top-1/top-5 retrieval agreement and recall parity between the int8
   and float paths on the held-out city (every-3rd-point query split,
   evaluation/metrics.py::fixed_split_recall protocol) — the metric the
   gate must protect (reference evaluation/roc.py:173,201-216).

Run alone on the chip AFTER scripts/export_flagship_params.py:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_trained_gate.py
"""

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from soft_contrastive_learning_tpu import flagship
    from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
    from soft_contrastive_learning_tpu.evaluation.metrics import (
        fixed_split_recall,
    )
    from soft_contrastive_learning_tpu.models.model import create_model

    print("backend", jax.default_backend(), flush=True)
    cfg = flagship.flagship_model_config(use_pallas=False)
    params, provenance = flagship.flagship_params(cfg)
    print("params provenance:", provenance, flush=True)
    assert provenance == "trained", "run scripts/export_flagship_params.py first"

    # 1. the benchmark gate — the SAME call benchmark.measure_config makes
    # (flagship.int8_gate: calibrate, embed both paths, gate the cosine)
    q_fn, _scales, c_calib = flagship.int8_gate(cfg, params)
    print(f"cosine on calibration batch (benchmark gate): {c_calib:.6f}",
          flush=True)
    model = create_model(cfg)
    q_embed = jax.jit(q_fn)
    f_embed = jax.jit(lambda p, x: model.apply({"params": p}, x)[0])
    cos = flagship.descriptor_cosine

    # 2+3. real images: held-out test city at flagship resolution
    num_points = 600
    radius = num_points * 8.0 / (2 * np.pi)
    src = ToyCitySource(
        num_points=num_points, radius=radius, seed=3,
        img_h=cfg.image_height, img_w=cfg.image_width,
    )
    city = src.cities["test"]
    n = len(city)
    imgs = np.stack([city.image(i) for i in range(n)])
    xy = np.stack([city.easting, city.northing], axis=1)

    def embed_all(embed):
        out = []
        for s in range(0, n, 64):
            out.append(np.asarray(
                embed(params, jnp.asarray(imgs[s:s + 64], jnp.float32)),
                np.float32,
            ))
        return np.concatenate(out)

    fq = embed_all(q_embed)
    ff = embed_all(f_embed)
    c_real = cos(fq, ff)
    print(f"cosine on held-out city images (n={n}): {c_real:.6f}", flush=True)

    # retrieval agreement: every 3rd point queries the rest
    q_idx = np.arange(0, n, 3)
    r_idx = np.setdiff1d(np.arange(n), q_idx)

    def topk(feats, k=5):
        # expansion form: the dense (Q, R, D) difference tensor would be
        # ~10 GB at D=32768; Q x R distances via one matmul instead
        qs, rs = feats[q_idx].astype(np.float64), feats[r_idx].astype(np.float64)
        d = (
            (qs ** 2).sum(-1)[:, None]
            - 2.0 * qs @ rs.T
            + (rs ** 2).sum(-1)[None, :]
        )
        return np.argsort(d, axis=1)[:, :k]

    tq, tf = topk(fq), topk(ff)
    top1 = float(np.mean(tq[:, 0] == tf[:, 0]))
    top5 = float(np.mean([
        len(np.intersect1d(a, b)) / 5 for a, b in zip(tq, tf)
    ]))
    print(f"top-1 agreement int8 vs float: {top1:.4f}", flush=True)
    print(f"top-5 overlap int8 vs float:   {top5:.4f}", flush=True)

    # 4. characterize the disagreements geographically (round-5 ask): for
    # each query whose int8 and float top-1 DIFFER, how far apart are the
    # two retrieved points, and how much does the retrieval's geo error
    # change? On this 8 m-spaced loop a benign swap is ~8 m of separation
    # with ~0 error delta; a large delta would mean int8 changes WHICH
    # PLACE is retrieved, not just which frame of it — that distribution
    # is what makes the gate transferable to denser reference sets
    # (reference spacings go down to L=0.3 m, reference top-n.py:35-36).
    dis = np.nonzero(tq[:, 0] != tf[:, 0])[0]
    if len(dis):
        q_xy, r_xy = xy[q_idx], xy[r_idx]
        g_int8 = np.linalg.norm(r_xy[tq[dis, 0]] - q_xy[dis], axis=1)
        g_float = np.linalg.norm(r_xy[tf[dis, 0]] - q_xy[dis], axis=1)
        err_delta = g_int8 - g_float  # >0: int8 retrieval is farther
        sep = np.linalg.norm(r_xy[tq[dis, 0]] - r_xy[tf[dis, 0]], axis=1)
        print(
            f"top-1 disagreements: {len(dis)}/{len(q_idx)} queries; "
            f"retrieved-pair separation m: median {np.median(sep):.2f} "
            f"mean {sep.mean():.2f} max {sep.max():.2f}; "
            f"geo-error delta m (int8 - float): median "
            f"{np.median(err_delta):.2f} mean {err_delta.mean():.2f} "
            f"worst {err_delta.max():.2f}",
            flush=True,
        )
        # breakdown at the metric's own 10 m threshold: a disagreement only
        # threatens the gated recall when float was RIGHT and int8 becomes
        # WRONG — count the four cells so the worst-case delta above can be
        # attributed (already-lost queries swapping between far-side
        # candidates are recall-neutral at any reference density)
        f_ok, q_ok = g_float < 10.0, g_int8 < 10.0
        print(
            "disagreement cells @10m: "
            f"float-ok->int8-ok {int((f_ok & q_ok).sum())}, "
            f"float-ok->int8-WRONG {int((f_ok & ~q_ok).sum())}, "
            f"float-wrong->int8-ok {int((~f_ok & q_ok).sum())}, "
            f"both-wrong {int((~f_ok & ~q_ok).sum())}",
            flush=True,
        )
    else:
        print("top-1 disagreements: 0", flush=True)

    for name, feats in (("float", ff), ("int8", fq)):
        rec = fixed_split_recall(feats, xy)
        print(f"recall {name:5s}: %<10m {rec['%<10m']:5.1f} "
              f"%<25m {rec['%<25m']:5.1f} %<50m {rec['%<50m']:5.1f}",
              flush=True)
    print("GATE DONE", flush=True)


if __name__ == "__main__":
    main()
