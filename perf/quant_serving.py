"""Quantized-serving measurement (round-3 VERDICT #4).

int8 has NO MXU rate advantage on this chip (138 TOP/s = bf16's 141 TF/s,
perf/_mmprobe3.log), so the quant path's stated value is MEMORY: 1-byte
inter-conv activations cut activation HBM footprint/traffic vs bf16/f32,
buying serving density (larger resident batch, more models per chip).
This probe attaches numbers to that claim: throughput of the quantized vs
float embed at increasing batch, and the analytic activation footprint of
the conv stack per image (bytes that materialize in HBM between layers).

Run alone on the chip: PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_serving.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.models.quant import (
    calibrate_scales, quantized_embed,
)

# VGG16 feature-map plan at 180x240 input: (H, W, C) after each conv,
# pools between blocks (models/vgg16.py; reference model/nets.py:72-131)
_PLAN = [
    (180, 240, 64), (180, 240, 64),
    (90, 120, 128), (90, 120, 128),
    (45, 60, 256), (45, 60, 256), (45, 60, 256),
    (22, 30, 512), (22, 30, 512), (22, 30, 512),
    (11, 15, 512), (11, 15, 512), (11, 15, 512),
]


def activation_bytes(bytes_per_elem):
    return sum(h * w * c for (h, w, c) in _PLAN) * bytes_per_elem


def sweep(label, fn, params, batches, iters=20):
    for bs in batches:
        x = jnp.asarray(
            np.random.default_rng(0).random((bs, 180, 240, 3), np.float32)
            * 255.0
        )

        def many(p, im):
            def body(c, _):
                out = fn(p, im + (c * 1e-30).astype(im.dtype))
                return out[0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
            return c

        try:
            f = jax.jit(many)
            float(f(params, x))  # compile + warm
            best = 0.0
            for _ in range(3):
                t0 = time.perf_counter()
                float(f(params, x))
                best = max(best, bs * iters / (time.perf_counter() - t0))
            print(f"{label} bs={bs:5d}: {best:8.1f} img/s", flush=True)
        except Exception as e:
            print(f"{label} bs={bs:5d}: FAIL {type(e).__name__}: "
                  f"{str(e)[:120]}", flush=True)
            break


def main():
    print("backend", jax.default_backend(), flush=True)
    print(f"conv-stack activation footprint/img: "
          f"int8 {activation_bytes(1)/1e6:.1f} MB, "
          f"bf16 {activation_bytes(2)/1e6:.1f} MB, "
          f"f32 {activation_bytes(4)/1e6:.1f} MB", flush=True)

    cfg = ModelConfig(vlad_cores=64, reduction="none",
                      compute_dtype="bfloat16", use_pallas=True)
    model = create_model(cfg)
    params = init_params(cfg, jax.random.key(0))
    calib = jnp.asarray(
        np.random.default_rng(1).random((8, 180, 240, 3), np.float32) * 255.0
    )
    scales = calibrate_scales(params, calib)

    batches = (256, 512, 1024, 2048)
    sweep("bf16 ", lambda p, im: model.apply({"params": p}, im)[0],
          params, batches)
    sweep("int8 ", lambda p, im: quantized_embed(cfg, p, scales, im)[0],
          params, batches)


if __name__ == "__main__":
    main()
