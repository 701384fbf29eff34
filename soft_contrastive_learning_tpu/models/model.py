"""Flagship embedding network: VGG16 (+NetVLAD) + reduction head.

Assembles the same model space as the reference's ``build_model`` network
section (reference train/train.py:599-652):

* ``vlad_cores=64, reduction!='spp'`` -> VGG16 + NetVLAD (32,768-D descriptor)
* ``vlad_cores=0,  reduction=='spp'`` -> VGG16 map -> spatial pyramid pooling
* ``vlad_cores=0,  reduction!='spp'`` -> flattened VGG16 map
* reduction heads: none | 1fc | 2fc | 3fc | pca (pca applied functionally
  outside the module from streaming-PCA state)

Returns ``(output, full_out)`` matching the reference's ops['output'] /
ops['full_out'] pair: ``full_out`` is the raw descriptor (fed to the streaming
PCA and to mining in full-feature mode, reference train/train.py:151-152,1033),
``output`` is the reduced embedding the losses consume.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.heads import FCHead, spatial_pyramid_pool
from soft_contrastive_learning_tpu.models.netvlad import NetVLAD
from soft_contrastive_learning_tpu.models.vgg16 import VGG16


class EmbeddingNet(nn.Module):
    config: ModelConfig

    @nn.compact
    def __call__(
        self, images: jnp.ndarray, train: bool = False, return_grad_in: bool = False
    ):
        """Returns (output, full_out), or (output, full_out, grad_in) when
        ``return_grad_in`` — grad_in is the pre-normalization conv5_3
        activation for gradient/saliency analysis, the extra output of the
        reference's grad_nets variants (reference model/grad_nets.py:63-69)."""
        cfg = self.config
        compute_dtype = jnp.dtype(cfg.compute_dtype)
        param_dtype = jnp.dtype(cfg.param_dtype)

        feature_map, grad_in = VGG16(
            compute_dtype=compute_dtype,
            param_dtype=param_dtype,
            remat=cfg.remat,
            packed_stem=cfg.packed_stem,
            winograd=cfg.winograd,
            name="vgg16",
        )(images)

        if cfg.reduction == "spp":
            full_out = feature_map  # the spp head pools the raw map
        elif cfg.vlad_cores > 0:
            full_out = NetVLAD(
                num_clusters=cfg.vlad_cores,
                compute_dtype=compute_dtype,
                param_dtype=param_dtype,
                use_pallas=cfg.use_pallas,
                name="netvlad",
            )(feature_map)
        else:
            full_out = feature_map.reshape(feature_map.shape[0], -1)

        if cfg.reduction == "spp":
            output = spatial_pyramid_pool(full_out, cfg.spp_levels)
            full_out = output
        elif cfg.reduction in ("1fc", "2fc", "3fc"):
            output = FCHead(
                num_layers=int(cfg.reduction[0]),
                out_dim=cfg.out_dim,
                param_dtype=param_dtype,
                name="fc_head",
            )(full_out, train=train)
        else:  # 'none' and 'pca' (pca projection applied outside the module)
            output = full_out
        if return_grad_in:
            return output, full_out, grad_in
        return output, full_out


def create_model(config: ModelConfig) -> EmbeddingNet:
    return EmbeddingNet(config=config)


def init_params(config: ModelConfig, rng: jax.Array, batch: int = 1):
    """Initialize a parameter pytree with the configured input shape."""
    model = create_model(config)
    dummy = jnp.zeros(
        (batch, config.image_height, config.image_width, config.channels),
        jnp.float32,
    )
    variables = model.init({"params": rng, "dropout": rng}, dummy, train=False)
    return variables["params"]
