"""Time gim_dkm at the full reference eval resolution (660x880 primary
pass -> 1152x1536 upsample pass, ref TEST_GIM_DKM.sh + dkm.py:655-753),
bf16 compute. Run from the repo root on the TPU host:

    python tools/bench/dkm_fullres.py        # bs1
    DKM_B=2 python tools/bench/dkm_fullres.py

Prints one JSON line (s/pair, normalized by batch). Includes an untimed
settle round (docs/PERF.md timing caveat)."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.api import Matcher, match_fn
from gim_tpu.config import GimConfig, replace as cfg_replace

cfg = GimConfig()
cfg = cfg_replace(cfg, dkm=cfg_replace(cfg.dkm, dtype="bfloat16"))
print("init...", flush=True)
matcher = Matcher("gim_dkm", cfg)
print("init done", flush=True)

import os
B = int(os.environ.get('DKM_B', '1'))
H0, W0 = 660, 880
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, H0, W0), jnp.float32)
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, 3, H0, W0), jnp.float32)
scale = jnp.ones((B, 2), jnp.float32)

fn = jax.jit(lambda v, a, b, s0, s1: match_fn("gim_dkm", cfg, v, a, b, s0, s1))
out = fn(matcher.variables, img0, img1, scale, scale)
_ = float(jnp.sum(out.conf))
print("compiled", flush=True)

# settle round (one-time recompile artifact, docs/PERF.md)
carry = jnp.float32(0)
for _ in range(2):
    out = fn(matcher.variables, img0 + carry * 1e-9, img1, scale, scale)
    carry = jnp.sum(out.conf)
_ = float(carry)

t0 = time.perf_counter()
carry = jnp.float32(0)
ITERS = 8
for _ in range(ITERS):
    out = fn(matcher.variables, img0 + carry * 1e-9, img1, scale, scale)
    carry = jnp.sum(out.conf)
_ = float(carry)
dt = (time.perf_counter() - t0) / ITERS
print(json.dumps({"metric": f"gim_dkm s/pair full-res two-pass bf16 bs{B}",
                  "value": round(dt / B, 3), "unit": "s/pair"}), flush=True)
