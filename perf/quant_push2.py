"""Round 2 of the int8 10k push: batch cross on the winning config.

perf/_quant_push.log: pallas=False (XLA NetVLAD) + scoped-vmem 64 MiB at
bs=2048 measures 9,931 img/s — 99.3% of the 10k target. This crosses the
batch size with that config (the plain sweep peaked at bs=3072) and
repeats the winner for run-to-run spread.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_push2.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.core.config import ModelConfig
from soft_contrastive_learning_tpu.models.model import init_params
from soft_contrastive_learning_tpu.models.quant import (
    calibrate_scales, quantized_embed,
)

VMEM64 = {"xla_tpu_scoped_vmem_limit_kib": "65536"}


def measure(cfg, params, scales, bs, iters=20, compiler_options=None, reps=3):
    x = jnp.asarray(
        np.random.default_rng(0).random((bs, 180, 240, 3), np.float32) * 255.0
    )

    def many(p, im):
        def body(c, _):
            out = quantized_embed(cfg, p, scales, im + (c * 1e-30).astype(im.dtype))[0]
            return out[0, 0].astype(jnp.float32), ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    kw = {"compiler_options": compiler_options} if compiler_options else {}
    f = jax.jit(many, **kw)
    float(f(params, x))
    rates = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(params, x))
        rates.append(bs * iters / (time.perf_counter() - t0))
    return rates


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((8, 180, 240, 3), np.float32) * 255.0)
    cfg = ModelConfig(vlad_cores=64, reduction="none",
                      compute_dtype="bfloat16", use_pallas=False)
    params = init_params(cfg, jax.random.key(0))
    scales = calibrate_scales(params, calib)

    for bs in (1536, 2048, 3072, 4096):
        try:
            rates = measure(cfg, params, scales, bs, compiler_options=VMEM64,
                            reps=5 if bs in (2048, 3072) else 3)
            r = ", ".join(f"{x:8.1f}" for x in rates)
            print(f"int8 xla-nv +vmem64 bs={bs}: [{r}] img/s", flush=True)
        except Exception as e:
            print(f"int8 xla-nv +vmem64 bs={bs}: FAIL "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
