"""H2D/D2H bandwidth + dispatch RTT through the axon relay."""
import time

import jax
import jax.numpy as jnp
import numpy as np

dev = jax.devices()[0]
print("device:", dev)

for mb in (1, 6.5, 26, 104):
    n = int(mb * 1e6)
    x = np.random.default_rng(0).integers(0, 255, n, dtype=np.uint8)
    jax.device_put(x, dev).block_until_ready()  # warm path
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        a = jax.device_put(x, dev)
        float(jnp.sum(a[:8].astype(jnp.float32)))  # force completion
        best = min(best, time.perf_counter() - t0)
    print(f"H2D {mb:6.1f} MB: {best*1e3:8.2f} ms  {mb/1e3/best:7.2f} GB/s", flush=True)

# D2H
for mb in (1.4, 6.5, 26):
    n = int(mb * 1e6 // 4)
    a = jnp.zeros(n, jnp.float32) + 1.0
    np.asarray(a)
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(a)
        best = min(best, time.perf_counter() - t0)
    print(f"D2H {mb:6.1f} MB: {best*1e3:8.2f} ms  {mb/1e3/best:7.2f} GB/s", flush=True)

# dispatch RTT: tiny jitted op, full round trip
f = jax.jit(lambda x: x + 1.0)
z = jnp.float32(0.0)
float(f(z))
best = float("inf")
for _ in range(10):
    t0 = time.perf_counter()
    float(f(z))
    best = min(best, time.perf_counter() - t0)
print(f"dispatch+fetch RTT (scalar): {best*1e3:.2f} ms")

# dispatch-only cost (no fetch): submit N, then one fetch
N = 20
float(f(z))
t0 = time.perf_counter()
y = z
for _ in range(N):
    y = f(y)
t_submit = time.perf_counter() - t0
float(y)
t_total = time.perf_counter() - t0
print(f"dispatch-only: {t_submit/N*1e3:.2f} ms/call submit; chain of {N} total {t_total*1e3:.1f} ms -> {t_total/N*1e3:.2f} ms/call effective")
