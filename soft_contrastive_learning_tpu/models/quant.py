"""Post-training int8 quantization of the VGG16 conv stack (inference).

Why (measured; history matters here): round 2 measured XLA int8 matmuls
at 138 TOP/s = bf16 parity at 4096^3 and concluded "no MXU advantage";
round 3 showed that conclusion does not transfer to the real workload —
int8's edge is problem-size/shape dependent (185 TOP/s at 8192x4096x8192,
perf/_mxu4.log), and the quantized embed measured **9.3-9.6k img/s vs
5.5-5.9k bf16 (1.6-1.7x)** on this chip (perf/_quant_serving.log,
PARITY.md "quantized serving") — the fastest measured route toward the
10k img/s serving target. It ALSO halves activation memory: every
inter-conv activation materializes as 1 byte instead of 2-4, cutting
activation HBM footprint/traffic ~2-4x (11.6 vs 23.3/46.5 MB/img), which
buys serving density. The quantized descriptor matches bf16 to
cosine > 0.9999 (tests + on-chip runs); docs/SPEEDLIGHT.md is the full
roofline story.

Scheme (standard symmetric post-training quantization):

* weights: per-output-channel scales, quantized on the fly from the float
  params (cheap, keeps the checkpoint tree unchanged);
* activations: per-tensor scales calibrated once from a representative
  batch (absmax/127 of each conv's input on the float path);
* convs run int8 x int8 -> int32 on the MXU; dequant + bias + ReLU +
  requant fuse into the surrounding elementwise pass, and max-pools run
  directly on int8 (max commutes with the monotone quantization), so every
  materialized activation between convs is 1 byte;
* conv5_3 output dequantizes to float for the channel L2-norm and NetVLAD
  (reference model/nets.py:63-67), which stay in bf16/fp32 — they are a
  small fraction of the FLOPs and carry the retrieval-critical geometry.

This is an inference path: training stays bf16/fp32. Recall parity is
gated by tests/test_quant.py (descriptor cosine + top-k retrieval overlap
vs the float model).
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.heads import FCHead, spatial_pyramid_pool
from soft_contrastive_learning_tpu.models.netvlad import NetVLAD
from soft_contrastive_learning_tpu.models.vgg16 import _VGG_BLOCKS, l2_normalize

CONV_NAMES: List[str] = [
    f"block{bi + 1}/{name}"
    for bi, specs in enumerate(_VGG_BLOCKS)
    for (name, _, _) in specs
]


def _gray_to_rgb(x: jnp.ndarray) -> jnp.ndarray:
    if x.shape[-1] == 1:
        x = jnp.concatenate([x, x, x], axis=-1)
    return x


def _float_conv_stack(
    vgg_params, images: jnp.ndarray, record_absmax: bool
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """fp32 reference conv stack over the same param tree (used only for
    calibration; mirrors models/vgg16.py exactly, incl. pool-then-ReLU)."""
    maxes = []
    a = _gray_to_rgb(images.astype(jnp.float32))
    a = a - vgg_params["average_rgb"].astype(jnp.float32)
    for bi, specs in enumerate(_VGG_BLOCKS):
        blk = vgg_params[f"block{bi + 1}"]
        for name, _, relu in specs:
            if record_absmax:
                maxes.append(jnp.max(jnp.abs(a)))
            a = jax.lax.conv_general_dilated(
                a,
                blk[name]["kernel"].astype(jnp.float32),
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + blk[name]["bias"].astype(jnp.float32)
            if relu:
                a = jax.nn.relu(a)
        if bi < len(_VGG_BLOCKS) - 1:
            a = jax.lax.reduce_window(
                a, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            a = jax.nn.relu(a)
    return a, maxes


def calibrate_scales(params, images) -> Dict[str, float]:
    """Per-conv input activation scales (absmax/127) from a float forward
    over a representative batch. ``params`` is the full EmbeddingNet tree."""
    _, maxes = jax.jit(
        lambda p, x: _float_conv_stack(p["vgg16"], x, record_absmax=True)
    )(params, images)
    # one batched transfer (13 per-scalar float()s would pay one relay RTT
    # each); an all-zero activation (dead layer on the calibration batch)
    # would make _requant divide by zero at trace time — scale 1.0 quantizes
    # it to zeros, mirroring the weight-scale guard in _quantize_weight
    maxes = [float(m) for m in jax.device_get(maxes)]
    return {
        name: (m / 127.0 if m > 0 else 1.0)
        for name, m in zip(CONV_NAMES, maxes)
    }


def save_scales(scales: Dict[str, float], path: str) -> None:
    with open(path, "w") as f:
        json.dump(scales, f, indent=1, sort_keys=True)


def load_scales(path: str) -> Dict[str, float]:
    with open(path) as f:
        return {k: float(v) for k, v in json.load(f).items()}


def _quantize_weight(k: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    s = jnp.max(jnp.abs(k), axis=(0, 1, 2)) / 127.0  # per-output-channel
    # an all-zero output channel (pruned/converted checkpoints) gives s=0;
    # 0/0 would spread NaN through the whole descriptor — quantize it to 0s
    s_safe = jnp.where(s > 0, s, 1.0)
    k8 = jnp.clip(jnp.round(k / s_safe), -127, 127).astype(jnp.int8)
    return k8, s_safe


def _requant(y: jnp.ndarray, scale: float) -> jnp.ndarray:
    return jnp.clip(jnp.round(y * (1.0 / scale)), -127, 127).astype(jnp.int8)


def _packed_int8_conv(xp, blk, name, s_in):
    """VALID (3, 2) width-packed int8 conv (ops/packed_stem.py transform
    applied to the already-quantized kernel) -> dequantized fp32 + bias.

    Bit-exact vs the direct int8 conv: the packing is pure reindexing of
    the same int8 values (inserted zeros match SAME padding), the int32
    accumulation is order-independent, and the dequant multiply uses the
    same scalars."""
    from soft_contrastive_learning_tpu.ops.packed_stem import pack_kernel

    k8, sk = _quantize_weight(blk[name]["kernel"].astype(jnp.float32))
    y32 = jax.lax.conv_general_dilated(
        xp,
        pack_kernel(k8),
        (1, 1),
        "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    skp = jnp.concatenate([sk, sk])
    bp = jnp.concatenate(
        [blk[name]["bias"], blk[name]["bias"]]
    ).astype(jnp.float32)
    return y32.astype(jnp.float32) * (s_in * skp) + bp


def _packed_int8_stem(vgg_params, scales, a8: jnp.ndarray) -> jnp.ndarray:
    """Width-packed int8 block1 + conv2_1: returns conv2_2's int8 input
    (B, H/2, W/2, 128).

    Why: the per-layer probe (perf/_quant_layers.log) shows the 64-channel
    stem convs run at 135-165 TOP/s vs 287-415 for the 128+-channel layers
    — half the MXU's 128 lanes idle. Width-packing (ops/packed_stem.py)
    aligns both contraction and output at 4/3 the FLOPs; at int8 the
    pack/repack tensors are 1-byte so the data movement that sank the bf16
    variant (core/config.py::packed_stem note) is halved. The 2x2 pool
    collapses into a phase/row max (no unpack), and conv2_1's packed
    output unpacks with a plain reshape (Y'[h,w',pout*F+f] = Y[h,2w'+pout,f],
    pout-major)."""
    from soft_contrastive_learning_tpu.ops.packed_stem import (
        pack_input, packed_maxpool, repack_shifted, unpack_width,
    )

    blk1, blk2 = vgg_params["block1"], vgg_params["block2"]
    s11, s12, s21, s22 = (scales[CONV_NAMES[i]] for i in range(4))

    y1 = jax.nn.relu(_packed_int8_conv(pack_input(a8), blk1, "conv1_1", s11))
    y2 = jax.nn.relu(
        _packed_int8_conv(repack_shifted(_requant(y1, s12)), blk1, "conv1_2", s12)
    )
    # requant BEFORE the pool (monotone, commutes) so the pool runs on int8
    a8 = packed_maxpool(_requant(y2, s21))
    y3 = jax.nn.relu(_packed_int8_conv(pack_input(a8), blk2, "conv2_1", s21))
    return unpack_width(_requant(y3, s22))


def quantized_conv_stack(
    vgg_params,
    scales: Dict[str, float],
    images: jnp.ndarray,
    packed_stem: bool = False,
) -> jnp.ndarray:
    """int8 VGG16 conv stack -> fp32 conv5_3 map (pre-normalization).

    Between convs only int8 tensors materialize: the dequant(+bias+ReLU)
    and next-layer requant fuse into one elementwise pass, and the 2x2
    max-pools run on the already-requantized int8 (exact: requantization is
    monotone, so pool-then-ReLU == ReLU-then-pool == int8 pool).

    ``packed_stem=True`` runs conv1_1/conv1_2/pool1/conv2_1 width-packed
    (bit-exact, see _packed_int8_stem) when the spatial dims allow
    (H even, W % 4 == 0); otherwise it falls back silently."""
    a = _gray_to_rgb(images.astype(jnp.float32))
    a = a - vgg_params["average_rgb"].astype(jnp.float32)
    a8 = _requant(a, scales[CONV_NAMES[0]])
    skip = 0
    if packed_stem and images.shape[1] % 2 == 0 and images.shape[2] % 4 == 0:
        a8 = _packed_int8_stem(vgg_params, scales, a8)
        skip = 3  # conv1_1, conv1_2, conv2_1 done (conv2_2 is idx 3)
    idx = 0
    y = None
    for bi, specs in enumerate(_VGG_BLOCKS):
        blk = vgg_params[f"block{bi + 1}"]
        for si, (name, _, relu) in enumerate(specs):
            if idx < skip:
                idx += 1
                continue
            k8, sk = _quantize_weight(blk[name]["kernel"].astype(jnp.float32))
            bias = blk[name]["bias"].astype(jnp.float32)
            s_in = scales[CONV_NAMES[idx]]
            y32 = jax.lax.conv_general_dilated(
                a8,
                k8,
                (1, 1),
                "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = y32.astype(jnp.float32) * (s_in * sk) + bias
            if relu:
                y = jax.nn.relu(y)
            if idx < len(CONV_NAMES) - 1:
                s_next = scales[CONV_NAMES[idx + 1]]
                if si == len(specs) - 1:  # block boundary: pool + relu
                    y8 = _requant(jax.nn.relu(y), s_next)
                    a8 = jax.lax.reduce_window(
                        y8,
                        jnp.int8(-128),
                        jax.lax.max,
                        (1, 2, 2, 1),
                        (1, 2, 2, 1),
                        "VALID",
                    )
                else:
                    a8 = _requant(y, s_next)
            idx += 1
    return y  # conv5_3: no pool, no ReLU (reference model/nets.py:63-66)


def quantized_embed(
    cfg: ModelConfig, params, scales: Dict[str, float], images: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full quantized forward: (output, full_out), same contract as
    EmbeddingNet.__call__ (models/model.py).

    NOTE: this mirrors EmbeddingNet's head assembly (spp/netvlad/fc/none
    branches and the output/full_out coupling) by hand — any change to
    models/model.py:36-85 must be reflected here; tests/test_quant.py pins
    the two paths against each other for the covered configurations."""
    fmap = quantized_conv_stack(
        params["vgg16"], scales, images, packed_stem=cfg.packed_stem
    )
    feat = l2_normalize(fmap, axis=-1)
    compute_dtype = jnp.dtype(cfg.compute_dtype)
    if cfg.reduction == "spp":
        output = spatial_pyramid_pool(feat, cfg.spp_levels)
        return output, output
    if cfg.vlad_cores > 0:
        nv = NetVLAD(
            num_clusters=cfg.vlad_cores,
            compute_dtype=compute_dtype,
            param_dtype=jnp.dtype(cfg.param_dtype),
            use_pallas=cfg.use_pallas,
        )
        full_out = nv.apply({"params": params["netvlad"]}, feat.astype(compute_dtype))
    else:
        full_out = feat.reshape(feat.shape[0], -1)
    if cfg.reduction in ("1fc", "2fc", "3fc"):
        output = FCHead(
            num_layers=int(cfg.reduction[0]),
            out_dim=cfg.out_dim,
            param_dtype=jnp.dtype(cfg.param_dtype),
        ).apply({"params": params["fc_head"]}, full_out, train=False)
    else:
        output = full_out
    return output, full_out


class QuantizedEmbedder:
    """Calibrate-once, jit-once int8 embedding engine.

    >>> emb = QuantizedEmbedder(cfg, params, calib_images)
    >>> descriptors = emb(images)          # reduced output
    >>> full = emb.full(images)            # raw descriptor (pre-reduction)
    """

    def __init__(self, cfg: ModelConfig, params, calib_images,
                 scales: Optional[Dict[str, float]] = None) -> None:
        self.cfg = cfg
        self.params = params
        self.scales = scales or calibrate_scales(params, calib_images)
        self._fn = jax.jit(
            lambda p, x: quantized_embed(cfg, p, self.scales, x)
        )

    def __call__(self, images) -> jnp.ndarray:
        return self._fn(self.params, images)[0]

    def full(self, images) -> jnp.ndarray:
        return self._fn(self.params, images)[1]
