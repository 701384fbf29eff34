"""Device-only flagship train-step time via scan-length slope: dt(K) = a + b*K."""
import time

import jax
import jax.numpy as jnp
import numpy as np

from soft_contrastive_learning_tpu.bench_train import flagship_toy_config
from soft_contrastive_learning_tpu.data.pipeline import ToyCitySource, assemble_batch
from soft_contrastive_learning_tpu.parallel.mesh import shard_batch
from soft_contrastive_learning_tpu.train.trainer import Trainer

cfg = flagship_toy_config(2, 120)
src = ToyCitySource(num_points=120, radius=150.0, seed=3, img_h=180, img_w=240)
tr = Trainer(cfg, src, out_dir="/tmp/devstep_run")
meta = src.epoch_meta(cfg.local_ref_set, 0)
sampler = tr._sampler_for(meta, rng=np.random.default_rng(0))
anchors = src.anchor_indices(cfg.local_ref_set, cfg.train_ref_r, 0)
sample = sampler.sample(np.asarray(anchors[:2], dtype=int), use_hard=False, cache=tr.mining_cache)
batch = assemble_batch(cfg, src, meta, sample.indices, sample.payload, 0)
device_batch = shard_batch(tr._augment_batch(batch, None), tr.mesh)

def chain(K):
    def f(state, b):
        def body(s, _):
            s2, _m = tr.train_step(s, b)
            return s2, ()
        return jax.lax.scan(body, state, None, length=K)[0]
    return jax.jit(f)

times = {}
for K in (16, 64):
    f = chain(K)
    s = f(tr.state, device_batch)
    float(jnp.asarray(s.step, jnp.float32))
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = f(s, device_batch)
        float(jnp.asarray(s.step, jnp.float32))
        best = min(best, time.perf_counter() - t0)
    times[K] = best
    print(f"K={K}: {best*1e3:.2f} ms total, {best/K*1e3:.3f} ms/step naive", flush=True)

b = (times[64] - times[16]) / (64 - 16)
a = times[16] - b * 16
print(f"slope (true device step): {b*1e3:.3f} ms/step; intercept {a*1e3:.2f} ms")
print(f"img/s at B=50 device-only: {50/b:.0f}")
tr.close()
