"""soft_contrastive_learning_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for
soft contrastive learning for visual localization.

Re-designed from scratch with the capabilities of the reference research codebase
(janinethoma/soft_contrastive_learning, "Soft Contrastive Learning for Visual
Localization", NeurIPS 2020): a VGG16+NetVLAD embedding network trained on the
Oxford RobotCar dataset with a zoo of geometric metric-learning losses, so that
image-embedding distance correlates with metric (GPS/INS) distance.

Design stance (TPU-first, not a TF1 translation):
  * pure functions + explicit state; one jitted ``train_step``
  * ``jax.sharding.Mesh`` + NamedSharding for scale-out (DP over batch, ICI collectives)
  * Pallas kernels for the hot fused ops (NetVLAD aggregation, pairwise-distance+loss)
  * Orbax checkpoints of {params, opt_state, step, PCA state, sampler RNG}
  * host-side async sampler feeding a double-buffered device prefetch
"""

__version__ = "0.1.0"

from soft_contrastive_learning_tpu.core.config import (  # noqa: F401
    LossConfig,
    ModelConfig,
    TrainConfig,
    TupleConfig,
)


def __getattr__(name):  # lazy: keep bare imports fast and jax-free
    if name == "Trainer":
        from soft_contrastive_learning_tpu.train.trainer import Trainer

        return Trainer
    if name == "EmbeddingNet":
        from soft_contrastive_learning_tpu.models.model import EmbeddingNet

        return EmbeddingNet
    if name == "ToyCitySource":
        from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource

        return ToyCitySource
    if name == "FilesystemSource":
        from soft_contrastive_learning_tpu.data.pipeline import FilesystemSource

        return FilesystemSource
    raise AttributeError(name)
