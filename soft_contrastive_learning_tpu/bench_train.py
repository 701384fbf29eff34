"""End-to-end TRAIN-LOOP throughput benchmark.

Measures what `benchmark.py` (embed forward only) does not: the sustained
training loop — sampler + image acquisition + prefetch + jitted step — at the
flagship configuration, answering "does the P1 overlap actually hide host
work behind the device?" (the reference's threaded pipeline exists exactly
for this, reference train/train.py:941-975).

Four numbers, printed as one JSON line:

* ``sustained_step_ms``  steady-state wall time per train step (the trainer's
  sync-to-sync ``segment_steady`` windows), with one-off costs (synchronous
  mining refresh, step-0 eval) subtracted via StepTimer spans;
* ``with_mining_step_ms`` / ``with_mining_imgs_per_sec``  epoch wall per step
  with ONLY eval/save subtracted — i.e. the mining refresh included;
* ``device_step_ms``     device-only step time, measured as a lax.scan of K
  train steps over one resident batch inside a single jit (one host fetch —
  the relay-safe pattern, .claude/skills/verify/SKILL.md);
* ``device_busy_frac``   device_step_ms / sustained_step_ms — the fraction of
  sustained wall time the chip is doing useful work. 1.0 = perfectly hidden
  host pipeline.

Comparing sync vs async mining (``--async_mining``): use the with_mining
pair, which charges both modes for the refresh. The sustained/busy headline
is NOT cross-mode comparable — a synchronous refresh is subtracted as a
one-off span, while an async refresh's device work deliberately lands
inside the timed segment windows (that overlap is the feature), so async
can read slightly LOWER on the headline while being strictly faster end to
end.

Run with and without the decoded-uint8 cache (data/decoded_cache.py) to see
whether the host bound is decode (cache ON fixes it) or sampling itself.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def flagship_toy_config(tuples_per_batch: int, num_points: int,
                        steps_per_dispatch: int = 1,
                        async_mining: bool = False):
    from soft_contrastive_learning_tpu.core.config import (
        LossConfig, ModelConfig, TrainConfig, TupleConfig,
    )

    # Flagship model + loss + tuple geometry (BASELINE.md train envelope:
    # 180x240 input, 64-cluster NetVLAD, wms, 2 tuples x (1+12+12) = 50
    # images/step), toy-city-sized cadences.
    return TrainConfig(
        model=ModelConfig(),  # 180x240, vlad 64, bf16 compute, pallas on
        tuples=TupleConfig(),
        loss=LossConfig(name="wms"),
        tuples_per_batch=tuples_per_batch,
        max_epoch=1,
        mining_step=250,
        mining_cache_size=min(1000, num_points),
        eval_step=10**8,  # fires once at step 0 (0 % K == 0), then never
        save_step=10**8,
        num_eval_queries=10,
        eval_ref_r=5,
        train_ref_r=1,
        steps_per_dispatch=steps_per_dispatch,
        async_mining=async_mining,
        seed=7,
    )


def run(
    tuples_per_batch: int = 2,
    num_points: int = 600,
    use_cache: bool = True,
    scan_iters: int = 50,
    out_dir: Optional[str] = None,
    cfg=None,  # override for small-shape CI smoke runs (tests/)
    steps_per_dispatch: int = 1,
    async_mining: bool = False,
) -> dict:
    from soft_contrastive_learning_tpu.data.decoded_cache import (
        CachedDecodedSource, cache_training_sets,
    )
    from soft_contrastive_learning_tpu.data.pipeline import (
        ToyCitySource, assemble_batch,
    )
    from soft_contrastive_learning_tpu.parallel.mesh import shard_batch
    from soft_contrastive_learning_tpu.train.trainer import Trainer

    if cfg is None:
        cfg = flagship_toy_config(tuples_per_batch, num_points,
                                  steps_per_dispatch, async_mining)
    # ~8 m spacing keeps positives within the 15 m radius
    radius = num_points * 8.0 / (2 * np.pi)
    src = ToyCitySource(
        num_points=num_points, radius=radius, seed=3,
        img_h=cfg.model.image_height, img_w=cfg.model.image_width,
    )

    # fixed scratch dir: the decoded cache persists between bench runs
    # (build_decoded_cache is idempotent); only the run dir is cleared
    tmp = out_dir or "/tmp/scl_trainbench_shared"
    shutil.rmtree(os.path.join(tmp, "run"), ignore_errors=True)
    cache_s = 0.0
    if use_cache:
        t0 = time.perf_counter()
        cache_dir = os.path.join(tmp, "decoded_cache")
        cache_training_sets(
            src, ["train_ref", "test_ref"],
            cfg.model.image_height, cfg.model.image_width,
            keep_aspect=cfg.model.vlad_cores > 0, cache_dir=cache_dir,
            cluster_sets=[("train_ref", cfg.eval_ref_r), ("test_ref", cfg.eval_ref_r)],
        )
        src = CachedDecodedSource(src, cache_dir)
        cache_s = time.perf_counter() - t0

    tr = Trainer(cfg, src, out_dir=os.path.join(tmp, "run"))

    # ---- device-only step time: K chained steps in ONE jit, one fetch ----
    meta = src.epoch_meta(cfg.local_ref_set, 0)
    sampler = tr._sampler_for(meta, rng=np.random.default_rng(0))
    anchors = src.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, 0)
    sample = sampler.sample(
        np.asarray(anchors[:tuples_per_batch], dtype=int), use_hard=False,
        cache=tr.mining_cache,
    )
    assert sample is not None
    batch = assemble_batch(cfg, src, meta, sample.indices, sample.payload, 0)
    device_batch = shard_batch(tr._augment_batch(batch, None), tr.mesh)

    def chain(state, b):
        def body(s, _):
            s2, _m = tr.train_step(s, b)
            return s2, ()

        return jax.lax.scan(body, state, None, length=scan_iters)[0]

    chained = jax.jit(chain)
    warm_state = chained(tr.state, device_batch)
    float(jnp.asarray(warm_state.step, jnp.float32))  # real fetch (relay-safe)
    t0 = time.perf_counter()
    warm_state = chained(warm_state, device_batch)
    float(jnp.asarray(warm_state.step, jnp.float32))
    device_step_s = (time.perf_counter() - t0) / scan_iters

    # ---- warm epoch: compile every executable the loop uses (single +
    # fused + embed paths) so the timed epoch measures steady state, not
    # the one-off remote compiles (~20 s each through the relay) ----
    from soft_contrastive_learning_tpu.core.logging import StepTimer

    tr.train_one_epoch(0)
    tr.metrics_logger.drain()
    float(jnp.asarray(tr.state.step, jnp.float32))
    warm_steps = int(np.asarray(tr.state.step))
    tr.timer = StepTimer()
    warm_fetches = tr.metrics_logger.fetch_count
    warm_fetch_s = tr.metrics_logger.fetch_seconds

    # ---- sustained loop: one full epoch through the real trainer ----
    t0 = time.perf_counter()
    tr.train_one_epoch(1)
    tr.metrics_logger.drain()
    final_step = float(jnp.asarray(tr.state.step, jnp.float32))  # close async tail
    wall_s = time.perf_counter() - t0
    final_step -= warm_steps

    from soft_contrastive_learning_tpu.train.trainer import EVAL_SAVE_SPANS

    spans = tr.timer.summary()
    one_off = sum(
        spans.get(k, {}).get("total_s", 0.0)
        for k in ("mining_refresh",) + EVAL_SAVE_SPANS
    )
    n_steps = int(final_step)
    imgs_per_step = cfg.images_per_batch
    # Headline: the sync-to-sync segment windows (trainer 'segment_steady'
    # span: dispatch loop + its device tail, minus in-segment eval/save) —
    # the only honest sustained number under fully async dispatch. The
    # wall-derived figure is kept in detail for reference.
    steady = spans.get("segment_steady")
    if steady and steady["count"]:
        sustained_step_s = steady["total_s"] / steady["count"]
    else:
        sustained_step_s = (wall_s - one_off) / max(n_steps, 1)
    # Epoch throughput INCLUDING the mining refresh (only eval/save
    # subtracted): the number async_mining moves — a synchronous refresh
    # pays its full feature-fetch wall time here (one-off'd out of the
    # headline above), an async one overlaps it with training.
    eval_save_s = sum(
        spans.get(k, {}).get("total_s", 0.0) for k in EVAL_SAVE_SPANS
    )
    with_mining_step_s = (wall_s - eval_save_s) / max(n_steps, 1)

    result = {
        "metric": "train_loop_throughput",
        "value": round(imgs_per_step / sustained_step_s, 1),
        "unit": "images/sec/chip",
        "detail": {
            "backend": jax.default_backend(),
            "tuples_per_batch": tuples_per_batch,
            "steps_per_dispatch": cfg.steps_per_dispatch,
            "async_mining": cfg.async_mining,
            "device_image_pool": bool(tr._image_pool not in (None, False)),
            "images_per_step": imgs_per_step,
            "steps": n_steps,
            "decoded_cache": use_cache,
            "cache_build_s": round(cache_s, 2),
            "epoch_wall_s": round(wall_s, 2),
            "one_off_s": round(one_off, 2),
            "wall_derived_step_ms": round(
                (wall_s - one_off) / max(n_steps, 1) * 1e3, 3
            ),
            "sustained_step_ms": round(sustained_step_s * 1e3, 3),
            "with_mining_step_ms": round(with_mining_step_s * 1e3, 3),
            "with_mining_imgs_per_sec": round(
                imgs_per_step / with_mining_step_s, 1
            ),
            "device_step_ms": round(device_step_s * 1e3, 3),
            "device_busy_frac": round(device_step_s / sustained_step_s, 4),
            "spans": {
                k: round(v["total_s"], 2) for k, v in spans.items()
            },
            # mid-stream scalar-logger D2H fetches during the timed epoch
            # (AsyncScalarLogger stats — each fetch serializes with the
            # dispatch RPC stream on the relay)
            "scalar_fetches": tr.metrics_logger.fetch_count - warm_fetches,
            "scalar_fetch_s": round(
                tr.metrics_logger.fetch_seconds - warm_fetch_s, 2
            ),
        },
    }
    tr.close()
    return result


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tuples_per_batch", type=int, default=2)
    ap.add_argument("--num_points", type=int, default=600)
    ap.add_argument("--no_cache", action="store_true")
    ap.add_argument("--scan_iters", type=int, default=50)
    ap.add_argument("--steps_per_dispatch", type=int, default=1)
    ap.add_argument("--async_mining", action="store_true")
    ap.add_argument("--out_dir", default="")
    args = ap.parse_args(argv)
    res = run(
        tuples_per_batch=args.tuples_per_batch,
        num_points=args.num_points,
        use_cache=not args.no_cache,
        scan_iters=args.scan_iters,
        out_dir=args.out_dir or None,
        steps_per_dispatch=args.steps_per_dispatch,
        async_mining=args.async_mining,
    )
    print(json.dumps(res))


if __name__ == "__main__":
    main()
