"""Keypoint detection ops: max-pool NMS and static-shape top-k extraction.

TPU-native equivalents of SuperPoint's detection post-processing
(ref networks/lightglue/superpoint.py:61-81 `simple_nms`,
:243-325 sparse output extraction). Dynamic `torch.where` selection is
replaced by capped top-k + validity masks — the shapes XLA needs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def max_pool_2d(x: jax.Array, radius: int) -> jax.Array:
    """(2r+1)x(2r+1) stride-1 max pool with SAME padding over (..., H, W)."""
    k = 2 * radius + 1
    ndim = x.ndim
    dims = (1,) * (ndim - 2) + (k, k)
    strides = (1,) * ndim
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, dims, strides, padding="SAME")


@partial(jax.jit, static_argnames=("radius",))
def simple_nms(scores: jax.Array, radius: int) -> jax.Array:
    """Max-pool NMS, two suppression rounds — exact port of the reference
    algorithm (superpoint.py:61-81). scores: (..., H, W)."""
    zeros = jnp.zeros_like(scores)
    max_mask = scores == max_pool_2d(scores, radius)
    for _ in range(2):
        supp_mask = max_pool_2d(max_mask.astype(scores.dtype), radius) > 0
        supp_scores = jnp.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool_2d(supp_scores, radius)
        max_mask = max_mask | (new_max_mask & ~supp_mask)
    return jnp.where(max_mask, scores, zeros)


def remove_borders(scores: jax.Array, border: int,
                   image_hw: jax.Array | None = None) -> jax.Array:
    """Set scores within `border` px of image edges to -1
    (superpoint.py:249-259). image_hw: (..., 2) true (h, w) when the map is
    padded beyond image content."""
    H, W = scores.shape[-2:]
    ys = jax.lax.broadcasted_iota(jnp.int32, (H, W), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    if image_hw is None:
        h = jnp.full(scores.shape[:-2] + (1, 1), H, dtype=jnp.int32)
        w = jnp.full(scores.shape[:-2] + (1, 1), W, dtype=jnp.int32)
    else:
        h = image_hw[..., 0, None, None].astype(jnp.int32)
        w = image_hw[..., 1, None, None].astype(jnp.int32)
    inside = ((ys >= border) & (ys < h - border)
              & (xs >= border) & (xs < w - border))
    return jnp.where(inside, scores, -1.0)


@partial(jax.jit, static_argnames=("k",))
def topk_keypoints(scores: jax.Array, k: int, threshold: float = 0.0,
                   pad_rng: jax.Array | None = None,
                   bounds_hw: jax.Array | None = None):
    """Extract up to k keypoints per image from a score map, static shapes.

    scores: (B, H, W) post-NMS. Returns (kpts (B,k,2) xy float at integer
    pixel coords — the reference samples descriptors at integer coords and
    adds the +0.5 center offset only on output (superpoint.py:347) —
    kscores (B,k), valid (B,k) bool). Slots below threshold get score 0
    and, if pad_rng given, a pseudo-random in-bounds position (reference
    force_num_keypoints 'random_c' pad, models/utils/misc.py:60); else
    position (0, 0).
    """
    B, H, W = scores.shape
    flat = scores.reshape(B, H * W)
    vals, idx = jax.lax.top_k(flat, k)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)
    kpts = jnp.stack([xs, ys], axis=-1)
    valid = vals > threshold
    kscores = jnp.where(valid, vals, 0.0)
    if pad_rng is not None:
        if bounds_hw is None:
            lim = jnp.full((B, 1, 1), min(H, W), dtype=jnp.float32)
        else:
            lim = jnp.min(bounds_hw, axis=-1).astype(jnp.float32)[:, None, None]
        rand = jax.random.uniform(pad_rng, (B, k, 2)) * lim
        kpts = jnp.where(valid[..., None], kpts, rand)
    else:
        kpts = jnp.where(valid[..., None], kpts, 0.0)
    return kpts, kscores, valid
