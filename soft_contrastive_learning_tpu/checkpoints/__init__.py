from soft_contrastive_learning_tpu.checkpoints.manager import (  # noqa: F401
    RunCheckpoints,
    warm_start_params,
)
