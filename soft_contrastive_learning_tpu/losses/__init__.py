from soft_contrastive_learning_tpu.losses.registry import (  # noqa: F401
    LOSS_NAMES,
    build_loss,
)
