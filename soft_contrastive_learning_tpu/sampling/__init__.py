from soft_contrastive_learning_tpu.sampling.tuples import TupleSampler  # noqa: F401
from soft_contrastive_learning_tpu.sampling.mining import MiningCache  # noqa: F401
