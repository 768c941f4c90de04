"""Full-model A/B for GIM_TPU_PACKED_CORR_ROWS (one gather row per
(pixel, dy) in local_correlation via the shift-packed channel layout).

The flag is read at trace time, so each (model, flag) runs in its own
process: `python tools/profile/packed_corr_ab.py <model> <flag>` with
model in {gim_dkm, gim_roma} at the true ZEB eval shapes.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

MODEL = sys.argv[1] if len(sys.argv) > 1 else "gim_dkm"
os.environ["GIM_TPU_PACKED_CORR_ROWS"] = sys.argv[2] if len(sys.argv) > 2 else "0"

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.api import Matcher, match_fn
from gim_tpu.config import GimConfig, replace as cfg_replace

cfg = GimConfig()
cfg = cfg_replace(cfg, roma=cfg_replace(cfg.roma, dtype="bfloat16"),
                  dkm=cfg_replace(cfg.dkm, dtype="bfloat16"))
HW = {"gim_dkm": (660, 880), "gim_roma": (672, 672)}[MODEL]

B = 1
scale = jnp.ones((B, 2), jnp.float32)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, *HW))
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, 3, *HW))
matcher = Matcher(MODEL, cfg)
fn = jax.jit(lambda v, a, b, s0, s1: match_fn(MODEL, cfg, v, a, b, s0, s1))
out = fn(matcher.variables, img0, img1, scale, scale)
_ = float(jnp.sum(out.conf))
best = None
for _ in range(3):
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(4):
        out = fn(matcher.variables, img0 + carry * 1e-9, img1, scale, scale)
        carry = jnp.sum(out.conf)
    _ = float(carry)
    dt = (time.perf_counter() - t0) / 4 * 1e3
    best = dt if best is None else min(best, dt)
print(f"[{MODEL} PACKED_CORR_ROWS={os.environ['GIM_TPU_PACKED_CORR_ROWS']}] "
      f"{best:.1f} ms/pair", flush=True)
