"""Time the fused Winograd kernel (and optionally the direct conv) for one
VGG layer shape. Usage: python perf/wg_one.py conv3_2 [direct]"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.ops.pallas.winograd_kernel import (
    winograd_conv_pallas,
)

SHAPES = {
    "conv2_2": (90, 120, 128, 128),
    "conv3_2": (45, 60, 256, 256),
    "conv4_2": (22, 30, 512, 512),
    "conv5_2": (11, 15, 512, 512),
}


def scan_time(fn, args, iters=20):
    def many(*a):
        def body(c, _):
            out = fn(*a, c)
            return out, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    g = jax.jit(many)
    float(g(*args))
    t0 = time.perf_counter()
    float(g(*args))
    return (time.perf_counter() - t0) / iters


def main():
    name = sys.argv[1]
    mode = sys.argv[2] if len(sys.argv) > 2 else "winograd"
    h, w, c, f = SHAPES[name]
    B = 256
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, h, w, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((3, 3, c, f)), jnp.float32) * 0.05
    b = jnp.asarray(rng.standard_normal((f,)), jnp.float32)
    flops = 2.0 * B * h * w * 9 * c * f
    print("backend", jax.default_backend(), name, mode, flush=True)

    if mode == "winograd":
        def fn(xx, kk, bb, carry):
            y = winograd_conv_pallas(
                xx + (carry * 1e-30).astype(jnp.bfloat16), kk, bb,
                relu=True, out_dtype=jnp.bfloat16)
            return y[0, 0, 0, 0].astype(jnp.float32)
    else:
        def fn(xx, kk, bb, carry):
            y = jax.lax.conv_general_dilated(
                xx + (carry * 1e-30).astype(jnp.bfloat16),
                kk.astype(jnp.bfloat16), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32) + bb
            return jnp.maximum(y, 0)[0, 0, 0, 0]

    dt = scan_time(fn, (x, k, b))
    print(f"{name} {mode}: {dt*1e3:.3f} ms  eff {flops/dt/1e12:.1f} TF/s",
          flush=True)


if __name__ == "__main__":
    main()
