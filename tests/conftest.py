"""Test config: run everything on a virtual 8-device CPU mesh.

Multi-chip sharding paths are exercised without TPU hardware
(xla_force_host_platform_device_count), mirroring how the driver dry-runs
`__graft_entry__.dryrun_multichip`. Pallas kernels auto-fall back to
interpret mode off-TPU (see gim_tpu/ops/pallas_kernels/common.py).
"""

import os

# The image pre-sets JAX_PLATFORMS=axon (TPU tunnel); tests must force CPU.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon sitecustomize force-prepends 'axon' to jax_platforms even when
# the env var says cpu — override through the config API (the env-var-only
# route silently left the whole suite running over the TPU tunnel).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)

# Compiles in this environment are expensive (1 CPU core; the axon runtime
# may even relay compilation) — persist them so repeated suite runs only
# pay once.
try:
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("GIM_TPU_TEST_CACHE",
                                     "/tmp/gim_tpu_test_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
except Exception:
    pass

# Suite tiers (VERDICT r4 item 7 — a suite that doesn't finish doesn't
# get run). XLA compiles in this container are expensive (1 CPU core;
# the relay may serialize them), so:
#   quick  (pre-commit):  pytest tests/ -q -m "not slow and not compileheavy"
#   heavy  (per session): pytest tests/ -q -m compileheavy
#   slow   (parity oracles, nightly): pytest tests/ -q -m slow
# The persistent compilation cache below makes repeat runs cheap; a
# one-command cache pre-warm is simply running the heavy tier once.
