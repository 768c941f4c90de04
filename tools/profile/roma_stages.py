"""RoMa per-stage chip profile at the true eval shape (672^2 -> 1344^2):
which stages own the 0.85 s/pair, and what is the floor below the
VERDICT 0.75 s/pair target?

Stages timed as separately-jitted sub-graphs (each with a scalar data
dependency chained through iterations so the tunnel doesn't hide device
time — see bench.py):
  dino      frozen DINOv2 ViT-L/14 on the 672^2 pair batch (2B, 48^2 tokens)
  vgg_c     VGG19 pyramid at coarse res (2B, 672^2)
  pyr_c     coarse pyramids (vgg_c + dino, fused)
  dec_c     decoder at coarse scales (16 -> 1) given cached pyramids
  vgg_f     VGG19 pyramid at upsample res (2B, 1344^2)
  full      the public match path (reference total)

`variables` is always passed as a jit ARGUMENT — closing over it embeds
~450M params as HLO constants and the serial remote-compile relay dies
with a broken pipe shipping the proto (three failed runs 2026-08-20).

Run: python tools/profile/roma_stages.py [stage ...]
(one TPU, nothing else running; default runs all stages in order — name a
subset to survive relay timeouts, the persistent compile cache keeps
progress across invocations)
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


def timeit(name, fn, *args, iters=4, reps=2):
    # reps=2: each rep costs ~1 min of serial-relay eager round-trips on
    # this host (measured session 4); best-of-2 is enough for ms-scale A/Bs
    print(f"[{name}] compiling...", flush=True)
    t0 = time.perf_counter()
    out = fn(variables, *args)
    jax.block_until_ready(out)
    print(f"[{name}] compiled+first-run in {time.perf_counter() - t0:.0f}s",
          flush=True)
    best = None
    for _ in range(reps):
        t0 = time.perf_counter()
        carry = jnp.float32(0)
        for _ in range(iters):
            out = fn(variables, *(a + carry * 1e-12 if i == 0 else a
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


def dino_only(v, qr, sr):
    x = jnp.concatenate([qr, sr], axis=0)
    nchw = jnp.transpose(x, (0, 3, 1, 2))
    return model.apply(v, nchw, method=lambda m, z: m.dino(z))


def vgg_only(v, qr, sr):
    x = jnp.concatenate([qr, sr], axis=0)
    return model.apply(v, x, method=lambda m, z: m.vgg(z))


def pyr_coarse(v, qr, sr):
    return model.apply(v, qr, sr, False,
                       method=lambda m, a, b, u: m.pyramids(a, b, u))


def dec_coarse(v, qr, sr):
    f_q, f_s = model.apply(v, qr, sr, False,
                           method=lambda m, a, b, u: m.pyramids(a, b, u))
    return model.apply(v, f_q, f_s,
                       method=lambda m, a, b: m.decoder(a, b))


def full(v, a, b):
    sc_ = jnp.ones((B, 2), jnp.float32)
    return match_fn("gim_roma", cfg, v, a, b, sc_, sc_)


# synthetic coarse flow/certainty at the s1 coarse grid (what the
# upsample decoder consumes, model.py:276-280) — batch 2B: the decoder
# runs the symmetric two-pass batch (q->s rows then s->q rows)
_flow_c = jax.random.uniform(jax.random.PRNGKey(5), (2 * B, hs, ws, 2),
                             minval=-0.9, maxval=0.9)
_cert_c = jax.random.normal(jax.random.PRNGKey(6), (2 * B, hs, ws, 1))


def dec_fine(v, qr, sr):
    """Upsample pyramids + upsample decoder (scales 8->1 at 1344^2)."""
    f_q, f_s = model.apply(v, qr, sr, True,
                           method=lambda m, a, b, u: m.pyramids(a, b, u))
    sfac = (hu * wu / (hs * ws)) ** 0.5
    return model.apply(
        v, f_q, f_s,
        method=lambda m, a, b: m.decoder(a, b, upsample=True, flow=_flow_c,
                                         certainty=_cert_c,
                                         scale_factor=sfac))


_warp_u = jax.random.uniform(jax.random.PRNGKey(7), (hu, 2 * wu, 4),
                             minval=-1, maxval=1)
_cert_u = jax.random.uniform(jax.random.PRNGKey(8), (hu, 2 * wu))


def tail_sample(v, w, ce):
    """Match-extraction tail alone: threshold + top_k over the 3.6M dense
    grid + balanced KDE resample (api._match_roma -> dkm.sample_matches)."""
    from gim_tpu.models.dkm.model import sample_matches
    m, co, va = sample_matches(jax.random.PRNGKey(9), w, ce,
                               c.num_samples, c.sample_thresh, c.sample_mode)
    return m


STAGES = {
    "dino": (dino_only, (qc, sc)),
    "vgg_c": (vgg_only, (qc, sc)),
    "pyr_c": (pyr_coarse, (qc, sc)),
    "dec_c": (dec_coarse, (qc, sc)),
    "vgg_f": (vgg_only, (qf, sf)),
    "dec_f": (dec_fine, (qf, sf)),
    "tail": (tail_sample, (_warp_u, _cert_u)),
    "full": (full, (img0, img1)),
}

want = sys.argv[1:] or list(STAGES)
t = {}
for name in want:
    if name.startswith("dec_f") and len(name) > 5:
        # dec_f1 .. dec_f4: cumulative-prefix ablation of the upsample
        # scales (8 -> 8,4 -> 8,4,2 -> all) via GIM_TPU_ROMA_UPS_PREFIX.
        # A FRESH function object per prefix: jax.jit caches on the
        # underlying callable, so re-wrapping the same fn would silently
        # reuse the first prefix's executable (env is read at trace time).
        os.environ["GIM_TPU_ROMA_UPS_PREFIX"] = name[5:]
        fresh = lambda v, a, b: dec_fine(v, a, b)   # noqa: E731
        _, args = STAGES["dec_f"]
        t[name] = timeit(name, jax.jit(fresh), *args)
        del os.environ["GIM_TPU_ROMA_UPS_PREFIX"]
        continue
    fn, args = STAGES[name]
    t[name] = timeit(name, jax.jit(fn), *args)

if all(k in t for k in ("pyr_c", "dec_c", "vgg_f", "full")):
    print(f"\ncoarse pyramids (vgg_c+dino, fused): {t['pyr_c']:.1f} ms")
    print(f"decoder coarse alone: {t['dec_c'] - t['pyr_c']:.1f} ms")
    print(f"fine remainder (dec_f + warp + sampling): "
          f"{t['full'] - t['dec_c'] - t['vgg_f']:.1f} ms")
    print(f"full: {t['full']:.1f} ms/pair")
