"""Multi-MXU probe v4: does Mosaic realize the chip's int8 rate?

get_tpu_info says int8_ops_per_second = 394 TOP/s (2x bf16's 197), but
XLA int8 matmuls measured 138 TOP/s = bf16 parity (perf/_mmprobe3.log).
v2/v3 showed blocked-grid Mosaic bf16 matmuls reach ~91 TF/s effective
(vs the old 37-44 belief). If Mosaic int8 lands near 2x its bf16 rate,
int8 via Pallas is a real future lever for the conv stack; if it lands at
parity, the chip's int8 peak is unreachable from both toolchains and the
quant path's memory-only value statement (models/quant.py) stands.

Same harness/problem as perf/mxu_probe3.py.
Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/mxu_probe4.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8192, 4096, 8192
OPS = 2.0 * M * K * N
ITERS = 8


def pallas_matmul(bm, bn, bk, in_dtype, acc_dtype, out_dtype):
    def kernel(x_ref, y_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] = acc_ref[...] + jnp.dot(
            x_ref[...], y_ref[...], preferred_element_type=acc_dtype
        )
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), out_dtype),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=(
                pltpu.PARALLEL, pltpu.PARALLEL, pltpu.ARBITRARY
            ),
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )


def run(label, matmul_fn, x, y, bump):
    def many(a, b):
        def body(c, _):
            o = matmul_fn(bump(a, c), b)
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
        print(f"{label:44s}: {best*1e3:8.3f} ms  {OPS/best/1e12:6.1f} TOP/s",
              flush=True)
    except Exception as e:
        print(f"{label:44s}: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    xi = jnp.asarray(rng.integers(-127, 127, (M, K)), jnp.int8)
    yi = jnp.asarray(rng.integers(-127, 127, (K, N)), jnp.int8)

    def bump_int(a, c):
        # data dependency without changing dtype: xor with a 0/1 scalar
        return a ^ (c.astype(jnp.int32) & 0).astype(jnp.int8)

    for (bm, bn, bk) in [(1024, 2048, 512), (1024, 1024, 1024),
                         (2048, 2048, 512), (512, 512, 2048)]:
        run(f"mosaic int8 blk({bm},{bn},k{bk}) i32acc",
            pallas_matmul(bm, bn, bk, jnp.int8, jnp.int32, jnp.int32),
            xi, yi, bump_int)

    # XLA int8 control in the same harness
    run("XLA int8 jnp.dot control",
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.int32),
        xi, yi, bump_int)

    # bf16 best-known config rerun for in-run comparison
    xb = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    yb = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)
    run("mosaic bf16 blk(1024,2048,k512) [v3 best]",
        pallas_matmul(1024, 2048, 512, jnp.bfloat16, jnp.float32,
                      jnp.bfloat16),
        xb, yb, lambda a, c: a + (c * 1e-30).astype(a.dtype))


if __name__ == "__main__":
    main()
