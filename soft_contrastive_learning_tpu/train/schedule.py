"""Learning-rate schedule.

Epoch-indexed exponential decay with a floor, matching reference
``get_learning_rate`` (train/train.py:118-121): lr = max(base *
down_factor^(epoch // down_frequency), minimal). Pure jnp so it traces inside
the jitted step (the reference fed ``epoch_num`` as a placeholder).
"""

from __future__ import annotations

import jax.numpy as jnp

from soft_contrastive_learning_tpu.core.config import TrainConfig


def learning_rate(cfg: TrainConfig, epoch: jnp.ndarray) -> jnp.ndarray:
    decayed = cfg.base_lr * (
        cfg.lr_down_factor ** jnp.floor(epoch / cfg.lr_down_frequency)
    )
    return jnp.maximum(decayed, cfg.minimal_lr)
