"""LoFTR backbone per-stage cost on the TPU: cumulative-prefix ablation
(stem -> +layer1 -> +layer2 -> +layer3 -> full FPN) so stage time =
difference of adjacent prefixes. Combine with tools/profile/mfu_ledger.py
FLOPs to get per-stage MFU and find where the backbone loses its ~65%.

Run on the real chip (no JAX_PLATFORMS override), ONE process at a time.
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

import time

import flax.linen as nn
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/gim_tpu_compile_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from gim_tpu.models.loftr.backbone import (ResNet50Trunk, ResNetFPN,
                                           Bottleneck)

S = int(os.environ.get("IMG", 832))
B2 = int(os.environ.get("B2", 16))          # 2B concat batch
DT = "bfloat16"
x = jax.random.uniform(jax.random.PRNGKey(0), (B2, S, S, 3), jnp.bfloat16)


def timeit(fn, *args, iters=6, rounds=3):
    out = fn(*args)
    jax.block_until_ready(out)
    best = None
    for _ in range(rounds):
        t0 = time.perf_counter()
        carry = jnp.bfloat16(0)
        for _ in range(iters):
            out = fn(args[0] + carry * 0, *args[1:])
            carry = jnp.sum(jax.tree_util.tree_leaves(out)[0]).astype(
                jnp.bfloat16)
        _ = float(carry)
        dt = (time.perf_counter() - t0) / iters * 1e3
        best = dt if best is None else min(best, dt)
    return best


class Prefix(nn.Module):
    """Trunk truncated after `upto` (0=stem, 1..3=layerN)."""
    upto: int

    @nn.compact
    def __call__(self, x):
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=DT, name="bn1")
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                    use_bias=False, dtype=DT, name="conv1")(x)
        x = nn.relu(bn(x))
        if self.upto == 0:
            return x

        def layer(x, planes, blocks, stride, name):
            x = Bottleneck(planes, stride, downsample=True, dtype=DT,
                           name=f"{name}_0")(x)
            for i in range(1, blocks):
                x = Bottleneck(planes, 1, dtype=DT, name=f"{name}_{i}")(x)
            return x

        x = layer(x, 64, 3, 1, "layer1")
        if self.upto == 1:
            return x
        x = layer(x, 128, 4, 2, "layer2")
        if self.upto == 2:
            return x
        return layer(x, 256, 6, 2, "layer3")


prev = 0.0
for upto, tag in [(0, "stem"), (1, "+layer1"), (2, "+layer2"),
                  (3, "+layer3")]:
    m = Prefix(upto)
    v = jax.jit(m.init)(jax.random.PRNGKey(1), x)
    f = jax.jit(lambda vv, xx: m.apply(vv, xx))
    t = timeit(lambda xx: f(v, xx), x)
    print(f"{tag:10s} cum {t:7.1f} ms  stage {t - prev:7.1f} ms",
          flush=True)
    prev = t

fpn = ResNetFPN(dtype=DT)
v = jax.jit(fpn.init)(jax.random.PRNGKey(1), x)
f = jax.jit(lambda vv, xx: fpn.apply(vv, xx))
t = timeit(lambda xx: f(v, xx), x)
print(f"{'full FPN':10s} cum {t:7.1f} ms  stage(FPN heads) "
      f"{t - prev:7.1f} ms", flush=True)
