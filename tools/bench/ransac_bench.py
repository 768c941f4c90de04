"""Time estimate_pose (5-point RANSAC + MAGSAC scoring, 2048 hypotheses)
on chip at eval shapes (N=4096 matches). Three timed rounds — the first
absorbs a one-time recompile (docs/PERF.md timing caveat); read the
later rounds as steady state."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from gim_tpu.geometry.pose import estimate_pose

N = 4096
rng = np.random.default_rng(0)
K = np.array([[800.0, 0, 512], [0, 800.0, 512], [0, 0, 1]], np.float32)
p0 = rng.uniform(0, 1024, (N, 2)).astype(np.float32)
p1 = p0 + rng.standard_normal((N, 2)).astype(np.float32) * 2
v = np.ones(N, bool)

fn = jax.jit(lambda a, b, vv, key: estimate_pose(
    a, b, vv, jnp.asarray(K), jnp.asarray(K), key, 0.5, 2048))
out = fn(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(v),
         jax.random.PRNGKey(0))
jax.block_until_ready(out)
print("compiled", flush=True)

ITERS = 10
for r in range(3):
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for i in range(ITERS):
        out = fn(jnp.asarray(p0) + carry * 1e-9, jnp.asarray(p1),
                 jnp.asarray(v), jax.random.PRNGKey(i))
        carry = jnp.sum(out["R"])
    _ = float(carry)
    print(f"estimate_pose round {r}:",
          (time.perf_counter() - t0) / ITERS * 1e3, "ms/pair", flush=True)
