"""Measure the chip's realizable matmul rooflines (bf16, int8) and the
per-conv rates at VGG16 shapes, bf16 vs int8.

Evidence base for PARITY.md / SPEEDLIGHT.md: the 10k img/s north star needs
sustained 270 TF/s at the flagship's 26.97 GFLOP/image, which exceeds the
v5e bf16 peak (197 TF/s) — so bf16 cannot reach it and the int8 MXU path
(394 TOPS peak) is the only route.

Usage: python perf/roofline.py [--quick]
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *args, iters=20, inner=1):
    f(*args)  # compile+warm
    jax.block_until_ready(f(*args))
    t0 = time.perf_counter()
    out = None
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / (iters * inner)


def scan_timeit(one_step, init_args, iters=30):
    """Time `one_step` inside a lax.scan within one jit call — avoids the
    axon relay's per-call RTT that inflates small-kernel timings."""

    def many(*args):
        def body(c, _):
            r = one_step(*args, c)
            return r, ()
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return c

    g = jax.jit(many)
    float(g(*init_args))
    t0 = time.perf_counter()
    float(g(*init_args))
    return (time.perf_counter() - t0) / iters


def matmul_roofline(n=4096, iters=50):
    print(f"== matmul roofline ({n}x{n}x{n}) ==")
    rng = np.random.default_rng(0)

    a16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)
    b16 = jnp.asarray(rng.standard_normal((n, n)), jnp.bfloat16)

    def mm_bf16(a, b, c):
        out = jnp.dot(a + c.astype(jnp.bfloat16) * 0, b,
                      preferred_element_type=jnp.float32)
        return out[0, 0]

    dt = scan_timeit(mm_bf16, (a16, b16), iters=iters)
    print(f"bf16: {2 * n**3 / dt / 1e12:.1f} TF/s  ({dt*1e3:.3f} ms)")

    a8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-127, 127, (n, n)), jnp.int8)

    def mm_int8(a, b, c):
        out = jnp.dot(a + (c * 0).astype(jnp.int8), b,
                      preferred_element_type=jnp.int32)
        return out[0, 0].astype(jnp.float32)

    dt = scan_timeit(mm_int8, (a8, b8), iters=iters)
    print(f"int8: {2 * n**3 / dt / 1e12:.1f} TOP/s  ({dt*1e3:.3f} ms)")


# (name, H, W, Cin, Cout) at 180x240 input, pools after blocks 1-4
VGG_CONVS = [
    ("conv1_1", 180, 240, 3, 64),
    ("conv1_2", 180, 240, 64, 64),
    ("conv2_1", 90, 120, 64, 128),
    ("conv2_2", 90, 120, 128, 128),
    ("conv3_1", 45, 60, 128, 256),
    ("conv3_2", 45, 60, 256, 256),
    ("conv3_3", 45, 60, 256, 256),
    ("conv4_1", 22, 30, 256, 512),
    ("conv4_2", 22, 30, 512, 512),
    ("conv4_3", 22, 30, 512, 512),
    ("conv5_1", 11, 15, 512, 512),
    ("conv5_2", 11, 15, 512, 512),
    ("conv5_3", 11, 15, 512, 512),
]


def conv_rates(batch=256, iters=12):
    print(f"== per-conv rates, batch {batch} ==")
    rng = np.random.default_rng(0)
    total_flops = 0.0
    tot_bf16 = tot_int8 = 0.0
    for name, h, w, cin, cout in VGG_CONVS:
        flops = 2.0 * batch * h * w * 9 * cin * cout
        total_flops += flops / batch

        x16 = jnp.asarray(rng.standard_normal((batch, h, w, cin)), jnp.bfloat16)
        k16 = jnp.asarray(rng.standard_normal((3, 3, cin, cout)), jnp.bfloat16)

        def c_bf16(x, k, c):
            y = jax.lax.conv_general_dilated(
                x + c.astype(jnp.bfloat16) * 0, k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            return y[0, 0, 0, 0]

        dt16 = scan_timeit(c_bf16, (x16, k16), iters=iters)
        tot_bf16 += dt16

        x8 = jnp.asarray(rng.integers(-127, 127, (batch, h, w, cin)), jnp.int8)
        k8 = jnp.asarray(rng.integers(-127, 127, (3, 3, cin, cout)), jnp.int8)

        def c_int8(x, k, c):
            y = jax.lax.conv_general_dilated(
                x + (c * 0).astype(jnp.int8), k, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32)
            return y[0, 0, 0, 0].astype(jnp.float32)

        dt8 = scan_timeit(c_int8, (x8, k8), iters=iters)
        tot_int8 += dt8
        print(
            f"{name}: {flops/1e9/batch:6.2f} GF/img | "
            f"bf16 {flops/dt16/1e12:6.1f} TF/s ({dt16*1e3:7.3f} ms) | "
            f"int8 {flops/dt8/1e12:6.1f} TOP/s ({dt8*1e3:7.3f} ms) | "
            f"speedup {dt16/dt8:4.2f}x"
        )
    print(f"total conv FLOPs/img: {total_flops/1e9:.2f} GF")
    print(f"sum bf16 {tot_bf16*1e3:.1f} ms -> {batch/tot_bf16:.0f} img/s")
    print(f"sum int8 {tot_int8*1e3:.1f} ms -> {batch/tot_int8:.0f} img/s")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--batch", type=int, default=256)
    args = p.parse_args()
    print("backend:", jax.default_backend(), jax.devices()[0])
    matmul_roofline(iters=10 if args.quick else 50)
    conv_rates(batch=args.batch, iters=4 if args.quick else 12)


if __name__ == "__main__":
    main()
