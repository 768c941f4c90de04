"""RoMa full-res cost attribution by ablation (timing-only monkeypatches),
same methodology as dkm_ablate*.py. Also splits DKM's ConvRefiner cost
into dw-5x5 vs 1x1 via a dw-stub run."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.api import Matcher, match_fn
from gim_tpu.config import GimConfig, replace as cfg_replace
from gim_tpu.models.dkm import blocks as BL

cfg = GimConfig()
cfg = cfg_replace(cfg, roma=cfg_replace(cfg.roma, dtype="bfloat16"),
                  dkm=cfg_replace(cfg.dkm, dtype="bfloat16"))

B = 1
scale = jnp.ones((B, 2), jnp.float32)


def measure(tag, model, hw):
    print(f"[{tag}] init...", flush=True)
    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, *hw))
    img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, 3, *hw))
    matcher = Matcher(model, cfg)
    fn = jax.jit(lambda v, a, b, s0, s1: match_fn(
        model, cfg, v, a, b, s0, s1))
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


ROMA_HW = (672, 672)
DKM_HW = (660, 880)

measure("roma baseline", "gim_roma", ROMA_HW)

# gathers (x_hat + local correlation)
orig_lc = BL.local_correlation
orig_sn = BL.sample_nhwc
BL.local_correlation = lambda x, y, r, flow=None, **kw: jnp.zeros(
    (*x.shape[:3], (2 * r + 1) ** 2), x.dtype)


def sn_zero(img, coords, padding_mode="zeros"):
    lead = coords.shape[1:-1]
    return jnp.zeros((img.shape[0], *lead, img.shape[-1]), img.dtype)


BL.sample_nhwc = sn_zero
import gim_tpu.models.roma.model as RM

orig_rm_sn = RM.sample_nhwc if hasattr(RM, "sample_nhwc") else None
if orig_rm_sn is not None:
    RM.sample_nhwc = sn_zero
measure("roma no-gathers", "gim_roma", ROMA_HW)
BL.local_correlation = orig_lc
BL.sample_nhwc = orig_sn
if orig_rm_sn is not None:
    RM.sample_nhwc = orig_rm_sn

# conv blocks
orig_block = BL.ConvRefiner.block
BL.ConvRefiner.block = lambda self, x, out_dim, name: (
    jnp.zeros((*x.shape[:3], out_dim), x.dtype) + 0.0 * x[..., :1])
measure("roma no-conv-blocks", "gim_roma", ROMA_HW)
BL.ConvRefiner.block = orig_block


# DKM: dw-5x5 only ablation — replace conv1 with a FLOP-free width
# adapter (slice/pad), keep bn/relu/conv2 at true widths; params stay
# consistent because init runs under the same patch
def block_no_dw(self, x, out_dim, name):
    c = x.shape[-1]
    if c > out_dim:
        x = x[..., :out_dim]
    elif c < out_dim:
        x = jnp.pad(x, (*[(0, 0)] * (x.ndim - 1), (0, out_dim - c)))
    x = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                     epsilon=1e-5, dtype=self.dtype, name=f"{name}_bn")(x)
    x = nn.relu(x)
    return nn.Conv(out_dim, (1, 1), dtype=self.dtype,
                   name=f"{name}_conv2")(x)


BL.ConvRefiner.block = block_no_dw
measure("dkm no-dw-conv", "gim_dkm", DKM_HW)
BL.ConvRefiner.block = orig_block
