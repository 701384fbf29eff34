"""Multi-MXU probe v3: larger Mosaic matmul blocks with the VMEM limit
raised (CompilerParams.vmem_limit_bytes — v5e has 128 MB VMEM per
get_tpu_info; the default scoped limit is 16 MB and capped v2's sweep at
blk(1024,1024,k512) = 82.8 TF/s). Same harness as perf/mxu_probe2.py.

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/mxu_probe3.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8192, 4096, 8192
FLOPS = 2.0 * M * K * N
ITERS = 8
VMEM_LIMIT = 100 * 1024 * 1024


def pallas_matmul(bm, bn, bk):
    def kernel(x_ref, y_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] = acc_ref[...] + jnp.dot(
            x_ref[...], y_ref[...], preferred_element_type=jnp.float32
        )
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.PARALLEL, pltpu.PARALLEL, pltpu.ARBITRARY
            ),
            vmem_limit_bytes=VMEM_LIMIT,
        ),
    )


def run(label, matmul_fn, x, y):
    def many(a, b):
        def body(c, _):
            o = matmul_fn(a + (c * 1e-30).astype(a.dtype), b)
            return o[0, 0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    try:
        f = jax.jit(many)
        float(f(x, y))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x, y))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{label:40s}: {best*1e3:8.3f} ms  {FLOPS/best/1e12:6.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"{label:40s}: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    for (bm, bn, bk) in [
        (1024, 1024, 512),   # v2 best, rerun under the raised limit
        (1024, 1024, 1024), (1024, 1024, 2048),
        (2048, 1024, 512), (1024, 2048, 512),
        (2048, 2048, 512), (2048, 2048, 1024),
        (4096, 1024, 512), (1024, 4096, 512),
        (2048, 4096, 512), (4096, 2048, 512),
    ]:
        run(f"mosaic blk({bm},{bn},k{bk}) vmem100M", pallas_matmul(bm, bn, bk),
            x, y)


if __name__ == "__main__":
    main()
