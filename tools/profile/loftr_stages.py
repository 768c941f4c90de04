"""LoFTR stage attribution at bench shapes (832px bs8 bf16):
backbone and coarse transformer timed standalone."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.config import LoFTRConfig
from gim_tpu.models.loftr.backbone import ResNetFPN
from gim_tpu.models.loftr.transformer import LocalFeatureTransformer

cfg = LoFTRConfig(dtype="bfloat16")


def timeit(fn, *args, iters=8, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        carry = None
        for _ in range(iters):
            out = fn(args[0] + (carry * 0 if carry is not None else 0),
                     *args[1:])
            carry = jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(
                args[0].dtype)
        _ = float(carry)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    return best


# backbone on the 2B-concat batch (both images)
bb = ResNetFPN(dtype="bfloat16")
# RGB: the GIM backbone is the 3-ch ResNet-50 variant (resnet.py:247-272);
# a 1-ch input undercounts the stem and skews attribution
x = jax.random.uniform(jax.random.PRNGKey(0), (16, 832, 832, 3),
                       jnp.bfloat16)
try:
    v = jax.jit(bb.init)(jax.random.PRNGKey(1), x)
    f = jax.jit(lambda xx: bb.apply(v, xx))
    print("backbone 16x832^2  :", timeit(f, x), "ms/iter", flush=True)
except Exception as e:
    print("backbone skipped:", type(e).__name__, str(e)[:200], flush=True)

# coarse transformer: 4 (self, cross) pairs at L = 104^2
tr = LocalFeatureTransformer(d_model=256, nhead=8, n_pairs=4,
                             attention="linear", dtype="bfloat16")
L = 104 * 104
f0 = jax.random.normal(jax.random.PRNGKey(2), (8, L, 256), jnp.bfloat16)
f1 = jax.random.normal(jax.random.PRNGKey(3), (8, L, 256), jnp.bfloat16)
vt = jax.jit(tr.init)(jax.random.PRNGKey(4), f0, f1)
g = jax.jit(lambda a, b: tr.apply(vt, a, b))
print("coarse transformer :", timeit(g, f0, f1), "ms/iter", flush=True)
