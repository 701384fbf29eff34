from soft_contrastive_learning_tpu.pca.incremental import (  # noqa: F401
    StreamingPCA,
    multiple_skl_increments,
    single_skl_increment,
    skl_init,
)
from soft_contrastive_learning_tpu.pca.whiten import fit_pca, whiten_features  # noqa: F401
