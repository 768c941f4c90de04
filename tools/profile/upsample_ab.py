"""On-chip A/B: FPN align-corners 2x upsample — interpolation-matmul vs
2-tap row-gather (GIM_TPU_GATHER_UPSAMPLE). Shapes = the two FPN
upsamples at 832 and 1600 eval."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.models.loftr import backbone as BB

SHAPES = [  # (2B, H, W, C): x3_2x and x2_2x at 832 bs8 / 1600 bs2
    (16, 104, 104, 256), (16, 208, 208, 256),
    (4, 200, 200, 256), (4, 400, 400, 256),
]

for flag in ("0", "1"):
    os.environ["GIM_TPU_GATHER_UPSAMPLE"] = flag
    for shape in SHAPES:
        x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.bfloat16)

        @jax.jit
        def chain(x):
            y = x
            for _ in range(8):
                y = BB._upsample2x_align_corners(y)[:, ::2, ::2, :]
            return y

        o = chain(x)
        jax.block_until_ready(o)
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            o = chain(x)
            jax.block_until_ready(o)
            dt = (time.perf_counter() - t0) / 8 * 1e3
            best = dt if best is None else min(best, dt)
        tag = "gather" if flag == "1" else "matmul"
        print(f"{tag} {shape}: {best:.2f} ms/upsample", flush=True)
