"""CPU smoke test of the train-loop benchmark harness (bench_train.run).

Drives the real Trainer through the bench's warm + timed epochs on a tiny
toy city and checks the output contract: the metric line, the span-derived
sustained/with-mining numbers, and the async_mining passthrough (the bench
is the tool that measures the sync-vs-async mining tradeoff, so its own
accounting must hold in both modes).
"""

import numpy as np
import pytest

from soft_contrastive_learning_tpu import bench_train
from soft_contrastive_learning_tpu.core.config import (
    LossConfig,
    ModelConfig,
    TrainConfig,
    TupleConfig,
)


def _tiny_cfg(async_mining: bool) -> TrainConfig:
    return TrainConfig(
        model=ModelConfig(
            vlad_cores=4, reduction="none", image_height=48, image_width=64,
            compute_dtype="float32", use_pallas=False,
        ),
        tuples=TupleConfig(
            positives_per_tuple=2, negatives_per_tuple=2,
            hard_positives_per_tuple=1, hard_negatives_per_tuple=1,
        ),
        loss=LossConfig(name="wms"),
        tuples_per_batch=1,
        max_epoch=1,
        mining_step=8,  # 16 anchors -> 2 segments/epoch
        mining_cache_size=8,
        eval_step=10**8,
        save_step=10**8,
        num_eval_queries=4,
        eval_ref_r=4,
        train_ref_r=1,
        async_mining=async_mining,
        seed=7,
    )


@pytest.mark.slow
@pytest.mark.parametrize("async_mining", [False, True])
def test_bench_train_smoke(tmp_path, async_mining):
    res = bench_train.run(
        tuples_per_batch=1,
        num_points=16,
        use_cache=True,
        scan_iters=2,
        out_dir=str(tmp_path),
        cfg=_tiny_cfg(async_mining),
    )
    assert res["metric"] == "train_loop_throughput"
    assert res["unit"] == "images/sec/chip"
    assert res["value"] > 0
    d = res["detail"]
    assert d["async_mining"] is async_mining
    assert d["steps"] == 16
    assert d["images_per_step"] == 5  # 1 tuple x (1 + 2 + 2)
    for k in ("sustained_step_ms", "with_mining_step_ms", "device_step_ms",
              "device_busy_frac", "with_mining_imgs_per_sec"):
        assert np.isfinite(d[k]) and d[k] > 0, (k, d[k])
    # with_mining charges the refresh; it can never beat the steady windows
    # by more than measurement noise
    assert d["with_mining_step_ms"] >= d["sustained_step_ms"] * 0.9
    spans = d["spans"]
    assert "segment_steady" in spans
    if async_mining:
        # 2 epochs x 2 segments: first boundary of each epoch is sync, the
        # second async
        assert "mining_refresh_async" in spans
    assert "mining_refresh" in spans
    # round-4 relay-attribution fields: dispatch H2D split from the async
    # launch, and the scalar logger's mid-epoch D2H fetch stats
    assert "dispatch_put" in spans and "train_step" in spans
    assert d["scalar_fetches"] >= 0
    assert d["scalar_fetch_s"] >= 0.0
