"""Benchmark: gim_loftr image pairs/sec/chip at 840px (the north-star config).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` is value / A100_PYTORCH_PAIRS_PER_SEC, i.e. the speedup over
the reference stack (A100 PyTorch gim_loftr at 840px, bs 1, eval protocol of
TEST_GIM_LOFTR.sh). The reference publishes no throughput (SURVEY §6); we
take 5.0 pairs/s as a generous A100 estimate (LoFTR-class models run
~150-250 ms/pair at ~0.7 MPix on A100). Target: vs_baseline >= 5.
"""

import json
import os
import time

os.environ.setdefault("GIM_TPU_COMPILE_CACHE", "/tmp/gim_tpu_compile_cache")

A100_PYTORCH_PAIRS_PER_SEC = 5.0
# 840 rounded to /64 for clean MXU tiling; KITTI eval is 1240 (-> 1216),
# ETH3D 1600 (ref TEST_GIM_DKM.sh:3-14) — override via GIM_TPU_BENCH_IMG
IMG = int(os.environ.get("GIM_TPU_BENCH_IMG", "832"))
MODEL = os.environ.get("GIM_TPU_BENCH_MODEL", "gim_loftr")
BATCH = int(os.environ.get("GIM_TPU_BENCH_BATCH",
                           "8" if MODEL == "gim_loftr" else "16"))
ITERS = int(os.environ.get("GIM_TPU_BENCH_ITERS", "16"))


def main():
    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.environ["GIM_TPU_COMPILE_CACHE"])
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    from gim_tpu.api import Matcher, match_fn
    from gim_tpu.config import GimConfig, LoFTRConfig

    if MODEL == "gim_loftr":
        from gim_tpu.models.loftr import init_params

        # since the 2-sweep merge the fused Pallas path beats dense
        # matching at every size (832px bs8: 29.1 vs 25.5 pairs/s) while
        # never materializing the L x S conf matrix (6.4 GB/pair at
        # 1600px), so it is the default everywhere.
        fused = os.environ.get("GIM_TPU_BENCH_FUSED", "1") == "1"
        cfg = GimConfig(loftr=LoFTRConfig(max_matches=2048, dtype="bfloat16",
                                          fused_matching=fused))
        variables = init_params(jax.random.PRNGKey(0), cfg.loftr, (IMG, IMG))
    else:
        cfg = GimConfig()
        variables = Matcher(MODEL, cfg).variables

    fn = jax.jit(lambda v, a, b, s0, s1: match_fn(MODEL, cfg, v, a, b,
                                                  s0, s1))
    key = jax.random.PRNGKey(1)
    img0 = jax.random.uniform(key, (BATCH, 3, IMG, IMG), jnp.float32)
    img1 = jax.random.uniform(jax.random.PRNGKey(2),
                              (BATCH, 3, IMG, IMG), jnp.float32)
    scale = jnp.ones((BATCH, 2), jnp.float32)

    # warmup / compile
    out = fn(variables, img0, img1, scale, scale)
    _ = float(jnp.sum(out.conf))  # full host round-trip

    # settle round: the first executions after warmup absorb a one-time
    # recompile/autotune on this runtime (docs/PERF.md timing caveat) —
    # run a short untimed round so the timed one measures steady state
    carry = jnp.float32(0)
    for _ in range(2):
        out = fn(variables, img0 + carry * 1e-9, img1, scale, scale)
        carry = jnp.sum(out.conf)
    _ = float(carry)

    # timed: chain a data dependency through every iteration so async
    # dispatch (and tunnel-side buffering) cannot hide execution time,
    # and end with a host fetch.
    t0 = time.perf_counter()
    carry = jnp.float32(0)
    for _ in range(ITERS):
        out = fn(variables, img0 + carry * 1e-9, img1, scale, scale)
        carry = jnp.sum(out.conf)
    _ = float(carry)
    dt = time.perf_counter() - t0

    pairs_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": f"{MODEL} image pairs/sec/chip @ {IMG}px",
        "value": round(pairs_per_sec, 3),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / A100_PYTORCH_PAIRS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
