"""Standalone on-chip repro for the fused refiner VMEM OOM at RoMa
scale-2 shapes (B=2, C=144, 336x336). Usage:
    python tools/profile/refiner_repro.py [vmem_mb]
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

if len(sys.argv) > 1:
    os.environ["GIM_TPU_REFINER_VMEM_MB"] = sys.argv[1]

from gim_tpu.ops.pallas_kernels.refiner import fused_dw_block

B, C, H, W = 2, 144, 336, 336
x = jax.random.uniform(jax.random.PRNGKey(0), (B, C, H, W), jnp.bfloat16)
wdw = jax.random.uniform(jax.random.PRNGKey(1), (C, 25), jnp.bfloat16)
bdw = jnp.zeros((C,), jnp.bfloat16)
w1 = jax.random.uniform(jax.random.PRNGKey(2), (C, C), jnp.bfloat16) * 0.1
b1 = jnp.zeros((C,), jnp.bfloat16)

t0 = time.time()
out = fused_dw_block(x, wdw, bdw, w1, b1, block_h=8)
jax.block_until_ready(out)
print(f"compile+run ok in {time.time()-t0:.0f}s, out {out.shape}")
t0 = time.time()
for _ in range(10):
    out = fused_dw_block(x + out[:, :1, :1, :1] * 0, wdw, bdw, w1, b1,
                         block_h=8)
jax.block_until_ready(out)
print(f"steady {(time.time()-t0)/10*1e3:.1f} ms")
