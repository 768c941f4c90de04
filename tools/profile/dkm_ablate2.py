"""DKM ablation round 2: conv blocks and the all-gathers+convs floor."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.api import Matcher, match_fn
from gim_tpu.config import GimConfig, replace as cfg_replace
from gim_tpu.models.dkm import blocks as BL
from gim_tpu.models.dkm import model as MD

cfg = GimConfig()
cfg = cfg_replace(cfg, dkm=cfg_replace(cfg.dkm, dtype="bfloat16"))

B = 1
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, 660, 880))
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, 3, 660, 880))
scale = jnp.ones((B, 2), jnp.float32)


def measure(tag):
    print(f"[{tag}] init...", flush=True)
    matcher = Matcher("gim_dkm", cfg)
    fn = jax.jit(lambda v, a, b, s0, s1: match_fn(
        "gim_dkm", cfg, v, a, b, s0, s1))
    out = fn(matcher.variables, img0, img1, scale, scale)
    _ = float(jnp.sum(out.conf))
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        carry = jnp.float32(0)
        for _ in range(4):
            out = fn(matcher.variables, img0 + carry * 1e-9, img1,
                     scale, scale)
            carry = jnp.sum(out.conf)
        _ = float(carry)
        dt = (time.perf_counter() - t0) / 4 * 1e3
        best = dt if best is None else min(best, dt)
    print(f"[{tag}] {best:.1f} ms/pair", flush=True)


orig_block = BL.ConvRefiner.block
BL.ConvRefiner.block = lambda self, x, out_dim, name: (
    jnp.zeros((*x.shape[:3], out_dim), x.dtype) + 0.0 * x[..., :1])
measure("no-conv-blocks")
BL.ConvRefiner.block = orig_block

orig_lc = BL.local_correlation
orig_sn = BL.sample_nhwc
BL.local_correlation = lambda x, y, r, flow=None, **kw: jnp.zeros(
    (*x.shape[:3], (2 * r + 1) ** 2), x.dtype)


def sn_zero(img, coords, padding_mode="zeros"):
    lead = coords.shape[1:-1]
    return jnp.zeros((img.shape[0], *lead, img.shape[-1]), img.dtype)


BL.sample_nhwc = sn_zero
MD.sample_nhwc = sn_zero
BL.ConvRefiner.block = lambda self, x, out_dim, name: (
    jnp.zeros((*x.shape[:3], out_dim), x.dtype) + 0.0 * x[..., :1])
measure("floor (no corr/sample/blocks)")
