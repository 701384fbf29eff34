"""Decompose the train-loop stages on the relay: sampler build, small-batch
device_put, pooled single dispatch, fused K dispatch. No trainer loop."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.bench_train import flagship_toy_config
from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource
from soft_contrastive_learning_tpu.data.device_pool import build_pool
from soft_contrastive_learning_tpu.losses.registry import build_loss
from soft_contrastive_learning_tpu.models.model import create_model, init_params
from soft_contrastive_learning_tpu.sampling.mining import MiningCache, neighbor_order
from soft_contrastive_learning_tpu.sampling.tuples import TupleSampler
from soft_contrastive_learning_tpu.train.step import (
    build_train_step, build_train_step_scan, init_train_state,
)
from soft_contrastive_learning_tpu.utils.meta import get_xy, get_yaw

cfg = flagship_toy_config(2, 600)
src = ToyCitySource(num_points=600, radius=600*8.0/(2*np.pi), seed=3,
                    img_h=180, img_w=240)
meta = src.epoch_meta("train_ref", 0)
print("building pool...", flush=True)
t0 = time.perf_counter()
pool = build_pool(src, meta, cfg, max_bytes=4_000_000_000, log=lambda *_: None)
print(f"pool build+upload: {time.perf_counter()-t0:.1f}s", flush=True)
rows = pool.rows_for_meta(meta)

model = create_model(cfg.model)
params = init_params(cfg.model, jax.random.key(0))
loss_fn = build_loss(cfg.loss, cfg.tuples, cfg.tuples_per_batch)
state = init_train_state(cfg, params)

# mining cache with device order (as in the loop)
sampler = TupleSampler(cfg.tuples, cfg.loss, cfg.tuple_shape,
                       get_xy(meta), get_yaw(meta),
                       rng=np.random.default_rng(0))
cache = MiningCache()
feats = np.random.default_rng(1).standard_normal((600, 32768)).astype(np.float32)
order = np.asarray(jax.jit(neighbor_order)(feats))
cache.refresh(feats, np.arange(600), order=order)

# ---- 1. sampler+pack build rate ----
def build(i):
    anchors = np.asarray([2 * i % 550, (2 * i + 1) % 550])
    s = sampler.sample(anchors, use_hard=True, cache=cache)
    batch = {"image_idx": rows[s.indices.reshape(-1)].astype(np.int32),
             "epoch": np.float32(0.0)}
    batch.update(s.payload)
    return batch

build(0)
t0 = time.perf_counter()
batches = [build(i) for i in range(100)]
dt = (time.perf_counter() - t0) / 100
print(f"1. host build (sampler+pack): {dt*1e3:.2f} ms/item", flush=True)

# ---- 2. device_put of one pooled batch (3 small leaves) ----
b0 = batches[0]
jax.device_put(b0)
t0 = time.perf_counter()
for i in range(50):
    jax.device_put(batches[i % 100])
jax.block_until_ready(jax.device_put(b0))
dt = (time.perf_counter() - t0) / 50
print(f"2. device_put pooled batch: {dt*1e3:.2f} ms/batch", flush=True)

# ---- 3. pooled single dispatch, async chain of 50, one fetch ----
step = build_train_step(cfg, model, loss_fn, image_pool=True)
db = [jax.device_put(b) for b in batches[:50]]
s = state
s, m = step(s, db[0], pool.array)
float(jnp.asarray(m["loss"]))  # compile + sync
t0 = time.perf_counter()
for i in range(50):
    s, m = step(s, db[i], pool.array)
float(jnp.asarray(m["loss"]))
dt = (time.perf_counter() - t0) / 50
print(f"3. pooled single step, async chain: {dt*1e3:.2f} ms/step", flush=True)

# ---- 4. end-to-end single-step loop (build+put+dispatch), async ----
t0 = time.perf_counter()
for i in range(50):
    b = build(i)
    dbi = jax.device_put(b)
    s, m = step(s, dbi, pool.array)
float(jnp.asarray(m["loss"]))
dt = (time.perf_counter() - t0) / 50
print(f"4. e2e single loop (no prefetcher): {dt*1e3:.2f} ms/step", flush=True)

# ---- 5. fused K=16 ----
fused = build_train_step_scan(cfg, model, loss_fn, image_pool=True)
stacked = {k: np.stack([b[k] for b in batches[:16]]) for k in batches[0]}
state2 = init_train_state(cfg, init_params(cfg.model, jax.random.key(1)))
t0 = time.perf_counter()
s2, ms = fused(state2, jax.device_put(stacked), pool.array)
float(jnp.asarray(ms["loss"][0]))
print(f"5a. fused K=16 first call (compile): {time.perf_counter()-t0:.1f}s", flush=True)
t0 = time.perf_counter()
reps = 6
for r in range(reps):
    s2, ms = fused(s2, jax.device_put(stacked), pool.array)
float(jnp.asarray(ms["loss"][0]))
dt = (time.perf_counter() - t0) / (reps * 16)
print(f"5b. fused K=16 steady: {dt*1e3:.2f} ms/step", flush=True)

# ---- 6. fused e2e with host build each group ----
t0 = time.perf_counter()
for r in range(4):
    bs = [build(i) for i in range(16)]
    st = {k: np.stack([b[k] for b in bs]) for k in bs[0]}
    s2, ms = fused(s2, jax.device_put(st), pool.array)
float(jnp.asarray(ms["loss"][0]))
dt = (time.perf_counter() - t0) / (4 * 16)
print(f"6. fused e2e (build+stack+put+dispatch): {dt*1e3:.2f} ms/step", flush=True)


# ---- 7. e2e single loop WITH AsyncScalarLogger (trainer-style) ----
from soft_contrastive_learning_tpu.core.logging import AsyncScalarLogger
sink = []
logger = AsyncScalarLogger(lambda st, v: sink.append((st, v)))
state3 = init_train_state(cfg, init_params(cfg.model, jax.random.key(2)))
s3, m = step(state3, jax.device_put(build(0)), pool.array)
t0 = time.perf_counter()
for i in range(50):
    b = build(i)
    s3, m = step(s3, jax.device_put(b), pool.array)
    logger.submit(i, {"loss": m["loss"], "learning_rate": m["learning_rate"]})
logger.drain()
float(jnp.asarray(m["loss"]))
dt = (time.perf_counter() - t0) / 50
print(f"7. e2e single loop + metrics logger: {dt*1e3:.2f} ms/step", flush=True)
logger.close()

# ---- 8. same but metrics fetched only at the end (no worker mid-loop) ----
pend = []
state4 = init_train_state(cfg, init_params(cfg.model, jax.random.key(3)))
s4, m = step(state4, jax.device_put(build(0)), pool.array)
float(jnp.asarray(m["loss"]))
t0 = time.perf_counter()
for i in range(50):
    b = build(i)
    s4, m = step(s4, jax.device_put(b), pool.array)
    pend.append(m["loss"])
vals = np.asarray(jnp.stack(pend))
dt = (time.perf_counter() - t0) / 50
print(f"8. e2e single loop, one end fetch of 50 losses: {dt*1e3:.2f} ms/step", flush=True)

# ---- 9. D2H fetch cost of one fresh scalar mid-stream ----
state5 = init_train_state(cfg, init_params(cfg.model, jax.random.key(4)))
s5, m = step(state5, jax.device_put(build(0)), pool.array)
float(jnp.asarray(m["loss"]))
t0 = time.perf_counter()
for i in range(20):
    s5, m = step(s5, jax.device_put(build(i)), pool.array)
    float(jnp.asarray(m["loss"]))  # sync fetch every step
dt = (time.perf_counter() - t0) / 20
print(f"9. e2e single loop, sync fetch EVERY step: {dt*1e3:.2f} ms/step", flush=True)
