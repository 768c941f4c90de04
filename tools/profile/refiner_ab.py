"""On-chip A/B for the round-3 perf toggles (VERDICT round-3 item 3):
GIM_TPU_FUSED_REFINER (fused dw5x5+BN+ReLU+1x1 Pallas kernel at refiner
scales 2/1, ops/pallas_kernels/refiner.py) and GIM_TPU_PACKED_WARP
(corner-packed single-gather bilinear warp, ops/sampling.py).

Measures ONE config per process (the toggles are read at trace time), so
drive it via the __main__ sweep which re-execs itself per combo:

    python tools/profile/refiner_ab.py            # full 2-model x 4-combo sweep
    GIM_TPU_AB_ONE=1 python tools/profile/refiner_ab.py gim_dkm   # one cell

Prints ms/pair at the true eval geometry: DKM 660x880 (+1152x1536 second
pass), RoMa 672^2 (+1344^2).
"""
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def run_one(model):
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/tmp/gim_tpu_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from gim_tpu.api import Matcher, match_fn
    from gim_tpu.config import GimConfig, replace as cfg_replace

    cfg = GimConfig()
    cfg = cfg_replace(cfg, roma=cfg_replace(cfg.roma, dtype="bfloat16"),
                      dkm=cfg_replace(cfg.dkm, dtype="bfloat16"))
    hw = (660, 880) if model == "gim_dkm" else (672, 672)
    B = 1
    img0 = jax.random.uniform(jax.random.PRNGKey(1), (B, 3, *hw))
    img1 = jax.random.uniform(jax.random.PRNGKey(2), (B, 3, *hw))
    scale = jnp.ones((B, 2), jnp.float32)
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
    print(json.dumps({"model": model,
                      "fused": os.environ.get("GIM_TPU_FUSED_REFINER", "1"),
                      "packed": os.environ.get("GIM_TPU_PACKED_WARP", "1"),
                      "ms_per_pair": round(best, 1)}), flush=True)


def sweep():
    for model in ("gim_dkm", "gim_roma"):
        for fused in ("0", "1"):
            for packed in ("0", "1"):
                env = dict(os.environ,
                           GIM_TPU_AB_ONE="1",
                           GIM_TPU_FUSED_REFINER=fused,
                           GIM_TPU_PACKED_WARP=packed)
                subprocess.run([sys.executable, __file__, model], env=env,
                               check=False, timeout=1800)


if __name__ == "__main__":
    if os.environ.get("GIM_TPU_AB_ONE"):
        run_one(sys.argv[1])
    else:
        sweep()
