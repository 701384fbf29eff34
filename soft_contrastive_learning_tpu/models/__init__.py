from soft_contrastive_learning_tpu.models.model import EmbeddingNet, create_model  # noqa: F401
from soft_contrastive_learning_tpu.models.netvlad import NetVLAD  # noqa: F401
from soft_contrastive_learning_tpu.models.vgg16 import VGG16  # noqa: F401
