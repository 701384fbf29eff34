"""Decisive multi-MXU Mosaic probe, v2 (round-3 VERDICT #3).

v1 (perf/mxu_probe.py, perf/_mxu.log) established the environment facts —
pltpu.get_tpu_info(): v5e, num_cores=1 (so CORE_PARALLEL semantics are
moot), 197 TF/s bf16 peak, 16 MB scoped-vmem stack limit — but its
amortization pattern (in-kernel fori_loop with a scalar data dependency)
costs ~0.6 ms/iteration by itself and drowned the dot entirely.

v2 measures the thing that actually matters: ONE canonical blocked-grid
Mosaic matmul (the upstream pallas/ops/tpu/matmul.py pattern: 3-D grid,
K innermost, f32 VMEM accumulator) on a 550-GFLOP problem, where every
grid step reads different blocks so nothing can be folded, with an outer
lax.scan (8 repeats, scalar-dependency on the input) to amortize the
30 ms relay fetch. An XLA jnp.dot of the same problem runs in the SAME
harness as the control, so every floor cancels in the comparison.

If the best Mosaic configuration still lands at ~40 TF/s while XLA does
~140 on the same problem, the "Mosaic uses ~1 of 4 MXUs on this
chip/toolchain" conclusion is confirmed and the Winograd kernel stays
toolchain-blocked (docs/SPEEDLIGHT.md).

Run alone on the chip:
  PYTHONPATH=/root/repo:/root/.axon_site python perf/mxu_probe2.py
"""

from __future__ import annotations

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K, N = 8192, 4096, 8192
FLOPS = 2.0 * M * K * N  # 549.8 GF
ITERS = 8


def pallas_matmul(bm, bn, bk, semantics=None, acc_bf16=False):
    acc_dtype = jnp.bfloat16 if acc_bf16 else jnp.float32

    def kernel(x_ref, y_ref, o_ref, acc_ref):
        @pl.when(pl.program_id(2) == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        acc_ref[...] = acc_ref[...] + jnp.dot(
            x_ref[...], y_ref[...], preferred_element_type=acc_dtype
        )
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)

    params = {}
    if semantics is not None:
        params["compiler_params"] = pltpu.CompilerParams(
            dimension_semantics=semantics
        )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((M, N), jnp.bfloat16),
        grid=(M // bm, N // bn, K // bk),
        in_specs=[
            pl.BlockSpec((bm, bk), lambda i, j, k: (i, k)),
            pl.BlockSpec((bk, bn), lambda i, j, k: (k, j)),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, k: (i, j)),
        scratch_shapes=[pltpu.VMEM((bm, bn), acc_dtype)],
        **params,
    )


def harness(matmul_fn):
    """scan ITERS matmuls with an input data dependency; one fetch."""

    def many(x, y):
        def body(c, _):
            o = matmul_fn(x + (c * 1e-30).astype(x.dtype), y)
            return o[0, 0].astype(jnp.float32), ()

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    return jax.jit(many)


def run(label, matmul_fn, x, y):
    try:
        f = harness(matmul_fn)
        float(f(x, y))  # compile + warm (real fetch)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(f(x, y))
            best = min(best, (time.perf_counter() - t0) / ITERS)
        print(f"{label:44s}: {best*1e3:8.3f} ms  {FLOPS/best/1e12:6.1f} TF/s",
              flush=True)
    except Exception as e:
        print(f"{label:44s}: FAIL {type(e).__name__}: {str(e)[:140]}",
              flush=True)


def main():
    print("backend", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((K, N)), jnp.bfloat16)

    run("XLA jnp.dot control",
        lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32
                             ).astype(jnp.bfloat16), x, y)

    for (bm, bn, bk) in [(512, 512, 512), (512, 512, 2048),
                         (1024, 1024, 512), (1024, 1024, 1024),
                         (2048, 1024, 512), (1024, 2048, 512),
                         (2048, 2048, 512)]:
        run(f"mosaic blk({bm},{bn},k{bk}) arbitrary",
            pallas_matmul(bm, bn, bk), x, y)

    for (bm, bn, bk) in [(512, 512, 512), (1024, 1024, 1024)]:
        run(f"mosaic blk({bm},{bn},k{bk}) parallel,parallel",
            pallas_matmul(
                bm, bn, bk,
                semantics=(pltpu.PARALLEL, pltpu.PARALLEL, pltpu.ARBITRARY),
            ), x, y)

    run("mosaic blk(1024,1024,k1024) bf16 acc",
        pallas_matmul(1024, 1024, 1024, acc_bf16=True), x, y)

    # upstream helper as shipped (same pattern, PrefetchScalarGridSpec)
    try:
        from jax.experimental.pallas.ops.tpu.matmul import matmul as ref_mm

        run("upstream pallas ops matmul blk(1024,1024)",
            functools.partial(ref_mm, block_shape=(1024, 1024), block_k=1024),
            x, y)
    except Exception as e:
        print(f"upstream helper unavailable: {e}", flush=True)


if __name__ == "__main__":
    main()
