"""Fine-grained profile of the top-N sweep at flagship shapes (round 5).

The rehearsal's topn stage (docs/REHEARSAL.md) still costs 377 s after the
nested-transform + host-eigh optimizations; this breaks the remainder down
with synthetic dumps at the EXACT rehearsal shapes (the stage's cost is
content-independent: PCA fit 4,400 x 32,768, ref 3,000 x 32,768, query
300 x 32,768, D in {64..4096} x L in {0,0.3,1,5}, N=25).

Stages timed separately, mirroring evaluation/topn.py::get_top_n:
  h2d_pca      host->HBM of the fit dump
  fit          fit_pca (Gram matmul on MXU + host LAPACK eigh + back-proj)
  transform    whiten ref+query once at d_max (nested-projection path)
  retrieval    the 28-setting loop: subsample + topk + geo + pickle save
and within retrieval, the FIRST call per unique (R', d) shape is reported
apart from repeats, to expose remote-compile cost vs steady-state.

Run alone on the chip:  PYTHONPATH=/root/repo python perf/topn_profile2.py
"""

import os
import sys
import time

import numpy as np

OUT = "/tmp/topn_profile2"


def make_loop_xy(n: int, spacing: float, offset: float = 0.0) -> np.ndarray:
    circumference = n * spacing
    r = circumference / (2 * np.pi) + offset
    th = np.linspace(0, 2 * np.pi, n, endpoint=False)
    return np.stack([r * np.cos(th), r * np.sin(th)], -1).astype(np.float64)


def main():
    import jax
    import jax.numpy as jnp

    from soft_contrastive_learning_tpu.evaluation import topn
    from soft_contrastive_learning_tpu.pca.whiten import fit_pca

    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    t0 = time.time()
    pca_f = rng.standard_normal((4400, 32768), np.float32)
    ref_f = rng.standard_normal((3000, 32768), np.float32)
    query_f = rng.standard_normal((300, 32768), np.float32)
    ref_xy = make_loop_xy(3000, 0.25)
    query_xy = make_loop_xy(300, 2.5, offset=1.5)
    print(f"synth dumps {time.time() - t0:.1f}s", flush=True)

    dims = (64, 128, 256, 512, 1024, 2048, 4096)
    spacings = (0.0, 0.3, 1.0, 5.0)

    t0 = time.time()
    pca_d = jax.device_put(pca_f, jax.devices()[0])
    t_put = time.time() - t0
    pca_d.block_until_ready()
    t_block = time.time() - t0 - t_put
    float(pca_d[0, 0])  # force a real fetch through the relay
    print(f"h2d_pca put {t_put:.1f}s block {t_block:.1f}s "
          f"fetch {time.time() - t0 - t_put - t_block:.1f}s", flush=True)

    t0 = time.time()
    w = fit_pca(pca_d, max(dims))
    w.components.block_until_ready()
    float(w.components[0, 0])
    print(f"fit {time.time() - t0:.1f}s", flush=True)

    t0 = time.time()
    ref_full = np.asarray(w.transform(jnp.asarray(ref_f)))
    query_full = np.asarray(w.transform(jnp.asarray(query_f)))
    print(f"transform {time.time() - t0:.1f}s", flush=True)

    # retrieval loop exactly as get_top_n runs it, per-setting timing
    t_loop = time.time()
    sub_cache = {s: topn.spatial_subsample(ref_xy, s) for s in spacings}
    geo_cache = {}
    for s, idx in sub_cache.items():
        sub_xy = ref_xy[idx]
        xy_d = np.linalg.norm(
            query_xy[:, None, :] - sub_xy[None, :, :], axis=-1
        )
        geo_cache[s] = (xy_d, np.argmin(xy_d, 1))
    print(f"sub+geo cache {time.time() - t_loop:.1f}s "
          f"(sizes {[len(v) for v in sub_cache.values()]})", flush=True)

    os.makedirs(OUT, exist_ok=True)
    per_setting = []
    t_loop = time.time()
    for d in dims:
        rf, qf = ref_full[:, :d], query_full[:, :d]
        for s in spacings:
            t1 = time.time()
            res = topn.top_n_single(
                rf, qf, ref_xy, query_xy, s, n=25,
                ref_idx=sub_cache[s], geo=geo_cache[s])
            t_topk = time.time() - t1
            from soft_contrastive_learning_tpu.utils.io import save_pickle
            t2 = time.time()
            save_pickle(res, os.path.join(OUT, f"l{s}_dim{d}.pickle"))
            per_setting.append((f"l{s}_dim{d}", t_topk, time.time() - t2))
    total_loop = time.time() - t_loop
    print(f"retrieval loop {total_loop:.1f}s over {len(per_setting)} settings",
          flush=True)
    for name, t_topk, t_save in per_setting:
        print(f"  {name:16s} topk {t_topk:6.2f}s  save {t_save:5.2f}s",
              flush=True)


if __name__ == "__main__":
    main()
