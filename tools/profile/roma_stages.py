"""RoMa per-stage chip profile at the true eval shape (672^2 -> 1344^2):
which stages own the 0.85 s/pair, and what is the floor below the
VERDICT 0.75 s/pair target?

Stages timed as separately-jitted sub-graphs (each with a scalar data
dependency chained through iterations so the tunnel doesn't hide device
time — see bench.py):
  dino      frozen DINOv2 ViT-L/14 on the 672^2 pair batch (2B, 48^2 tokens)
  vgg_c     VGG19 pyramid at coarse res (2B, 672^2)
  dec_c     decoder at coarse scales (16 -> 1) given cached pyramids
  vgg_f     VGG19 pyramid at upsample res (2B, 1344^2)
  dec_f     upsample decoder refiners (s2/s1 at 1344^2)
  full      the public match path (reference total)

Run: python tools/profile/roma_stages.py  (one TPU, nothing else running)
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.api import Matcher, match_fn
from gim_tpu.config import GimConfig, replace as cfg_replace
from gim_tpu.models.roma.model import RoMaMatcher, resize_nhwc

cfg = GimConfig()
cfg = cfg_replace(cfg, roma=cfg_replace(cfg.roma, dtype="bfloat16"))
B = 1
HW = (672, 672)
img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, *HW))
img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, 3, *HW))
matcher = Matcher("gim_roma", cfg)
variables = matcher.variables
c = cfg.roma
model = RoMaMatcher(c)

q = jnp.transpose(img0, (0, 2, 3, 1))
s = jnp.transpose(img1, (0, 2, 3, 1))
hs = ws = c.coarse_res
hu, wu = c.upsample_res


def timeit(name, fn, *args, iters=4, reps=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = jnp.float32(0)
        for _ in range(iters):
            out = fn(*(a + carry * 1e-12 if i == 0 else a
                       for i, a in enumerate(args)))
            leaves = jax.tree_util.tree_leaves(out)
            carry = jnp.sum(leaves[0][..., 0]).astype(jnp.float32)
        _ = float(carry)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    print(f"{name:8s} {best:8.1f} ms", flush=True)
    return best


# --- stage inputs (computed once, shapes as inside __call__) ---
qc = resize_nhwc(q, hs, ws)
sc = resize_nhwc(s, hs, ws)
qf = resize_nhwc(q, hu, wu)
sf = resize_nhwc(s, hu, wu)


def dino_only(qr, sr):
    x = jnp.concatenate([qr, sr], axis=0)
    nchw = jnp.transpose(x, (0, 3, 1, 2))
    return model.apply(variables, nchw, method=lambda m, z: m.dino(z))


def vgg_only(qr, sr):
    x = jnp.concatenate([qr, sr], axis=0)
    return model.apply(variables, x, method=lambda m, z: m.vgg(z))


def pyr_coarse(qr, sr):
    return model.apply(variables, qr, sr, False,
                       method=lambda m, a, b, u: m.pyramids(a, b, u))


def dec_coarse(qr, sr):
    f_q, f_s = model.apply(variables, qr, sr, False,
                           method=lambda m, a, b, u: m.pyramids(a, b, u))
    return model.apply(variables, f_q, f_s,
                       method=lambda m, a, b: m.decoder(a, b))


def full(a, b):
    sc_ = jnp.ones((B, 2), jnp.float32)
    return match_fn("gim_roma", cfg, variables, a, b, sc_, sc_)


t_dino = timeit("dino", jax.jit(dino_only), qc, sc)
t_vggc = timeit("vgg_c", jax.jit(vgg_only), qc, sc)
t_pyrc = timeit("pyr_c", jax.jit(pyr_coarse), qc, sc)
t_decc = timeit("dec_c+p", jax.jit(dec_coarse), qc, sc)
t_vggf = timeit("vgg_f", jax.jit(vgg_only), qf, sf)
t_full = timeit("full", jax.jit(full), img0, img1)

print(f"\ncoarse pyramids (vgg_c+dino, fused): {t_pyrc:.1f} ms")
print(f"decoder coarse alone: {t_decc - t_pyrc:.1f} ms")
print(f"fine remainder (dec_f + warp + sampling): "
      f"{t_full - t_decc - t_vggf:.1f} ms")
print(f"full: {t_full:.1f} ms/pair")
