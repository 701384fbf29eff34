"""Worker process for the 2-process jax.distributed test (run by
tests/test_multihost.py, one subprocess per simulated host).

Exercises, on the CPU backend (no TPU pod needed):
  * ``initialize_multihost`` bootstrap over a localhost coordinator,
  * a cross-process collective (psum over the global device mesh),
  * a short Trainer run on the toy city with writer election — only the
    primary process may write config/checkpoints/metrics (SURVEY.md §5
    'distributed communication backend' TPU-equivalent).

Prints one JSON line of facts for the parent test to assert.
"""

import json
import os
import sys

# Force the CPU platform with 2 virtual devices per process BEFORE any
# backend initializes (same recipe as tests/conftest.py).
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=2"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402


def main() -> None:
    coordinator, num_processes, process_id, out_dir = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )

    from soft_contrastive_learning_tpu.launch.multihost import (
        initialize_multihost,
        is_primary,
    )

    topo = initialize_multihost(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )

    # ---- cross-process collective over the global mesh ----
    from jax.sharding import NamedSharding, PartitionSpec as P

    from soft_contrastive_learning_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(num_data=jax.device_count())  # spans both processes
    sharding = NamedSharding(mesh, P("data"))
    n = jax.device_count()
    nloc = jax.local_device_count()
    # Each process contributes only its local rows of the global array.
    global_data = np.arange(n, dtype=np.float32) * 10.0
    local_rows = global_data[process_id * nloc : (process_id + 1) * nloc]
    arr = jax.make_array_from_process_local_data(
        sharding, local_rows, global_shape=global_data.shape
    )

    @jax.jit
    def total(x):
        return jax.numpy.sum(x)

    psum_val = float(total(arr))  # requires a cross-process reduction

    # ---- short Trainer run with writer election ----
    from soft_contrastive_learning_tpu.core.config import (
        LossConfig,
        ModelConfig,
        TrainConfig,
        TupleConfig,
    )
    from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
    from soft_contrastive_learning_tpu.train.trainer import Trainer

    cfg = TrainConfig(
        model=ModelConfig(
            vlad_cores=4, reduction="none", image_height=32, image_width=32,
            compute_dtype="float32", use_pallas=False,
        ),
        tuples=TupleConfig(
            positives_per_tuple=2,
            negatives_per_tuple=2,
            hard_positives_per_tuple=0,
            hard_negatives_per_tuple=0,
        ),
        loss=LossConfig(name="triplet"),
        tuples_per_batch=1,
        max_epoch=1,
        mining_step=10**9,
        mining_cache_size=6,  # the step-0 refresh embeds this window
        eval_step=10**9,
        save_step=4,
        num_eval_queries=2,
        seed=0,
    )
    # ~7.9 m spacing: inside the 15 m positive radius, negatives exist beyond.
    source = ToyCitySource(num_points=16, radius=20.0, img_h=32, img_w=32, seed=3)
    trainer = Trainer(cfg, source, out_dir=out_dir)
    assert trainer.primary == (process_id == 0) == is_primary()
    trainer.train()
    steps = trainer.global_step
    trainer.ckpts.wait()
    trainer.close()

    print(json.dumps({
        "process_id": process_id,
        "process_index": topo["process_index"],
        "process_count": topo["process_count"],
        "global_device_count": topo["global_device_count"],
        "local_device_count": topo["local_device_count"],
        "psum": psum_val,
        "expected_psum": float(global_data.sum()),
        "primary": is_primary(),
        "steps": steps,
    }))


if __name__ == "__main__":
    main()
