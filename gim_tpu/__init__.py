"""gim_tpu — TPU-native generalizable image matching (JAX/XLA/Pallas/pjit).

A ground-up rebuild of the capabilities of GIM ("GIM: Learning Generalizable
Image Matcher From Internet Videos", ICLR 2024) as an idiomatic TPU framework:

- four matcher heads: ``gim_lightglue`` (SuperPoint + LightGlue),
  ``gim_loftr`` (coarse-to-fine linear attention), ``gim_dkm`` and
  ``gim_roma`` (dense GP/warp regression matchers),
- on-chip batched RANSAC (essential / fundamental / homography) replacing
  OpenCV USAC_MAGSAC host round-trips,
- ZEB 12-dataset zero-shot evaluation harness with pjit data parallelism,
- hloc-compatible reconstruction layer and the video pseudo-label factory.

The compute path is JAX + Pallas; everything after host JPEG decode runs in
HBM with static shapes.
"""

__version__ = "0.1.0"
