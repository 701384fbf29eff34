"""int8 serving batch-size sweep above 1536 (round-3 follow-up).

perf/_quant_final.log fixed bs=1536 (+64 MiB scoped vmem) at 10,041-10,049
img/s but never swept larger batches; this checks whether 2048/3072 buy
anything (more amortization of per-layer prologues) or lose it (vmem option
only compiles <= 2048; larger activations spill). Scan length 60 keeps the
relay call floor < 0.5% of the timed region (see perf/quant_final.py).

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/quant_bs_sweep.py
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
ITERS = 60


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(1)
    calib = jnp.asarray(rng.random((8, 180, 240, 3), np.float32) * 255.0)
    cfg = ModelConfig(vlad_cores=64, reduction="none",
                      compute_dtype="bfloat16", use_pallas=False)
    params = init_params(cfg, jax.random.key(0))
    scales = calibrate_scales(params, calib)

    for bs, opts, tag in (
        (1536, VMEM64, "vmem64"),
        (2048, VMEM64, "vmem64"),
        (2048, None, "default"),
        (3072, None, "default"),
    ):
        x = jnp.asarray(rng.random((bs, 180, 240, 3), np.float32) * 255.0)

        def many(p, im):
            def body(c, _):
                out = quantized_embed(cfg, p, scales,
                                      im + (c * 1e-30).astype(im.dtype))[0]
                return out[0, 0].astype(jnp.float32), ()
            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        f = jax.jit(many, compiler_options=opts)
        try:  # compile only: the vmem option can fail to compile at size
            compiled = f.lower(params, x).compile()
        except Exception as e:
            print(f"int8 bs={bs} {tag}: compile failed: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        try:  # warm-up execution: an OOM here is a RUN-time failure
            float(compiled(params, x))
        except Exception as e:
            print(f"int8 bs={bs} {tag}: run failed: "
                  f"{type(e).__name__}: {str(e)[:120]}", flush=True)
            continue
        f = compiled
        rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(params, x))
            rates.append(bs * ITERS / (time.perf_counter() - t0))
        r = ", ".join(f"{v:8.1f}" for v in rates)
        print(f"int8 bs={bs:4d} {tag:7s} iters={ITERS}: [{r}] img/s",
              flush=True)


if __name__ == "__main__":
    main()
