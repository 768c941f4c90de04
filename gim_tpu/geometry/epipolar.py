"""Epipolar geometry primitives (batched, jittable).

Ports the math of /root/reference/tools/metrics.py:32-74 (symmetric epipolar
distance, E = [t]x R) without kornia, fully batched with validity masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gim_tpu.utils import highp


def cross_product_matrix(t: jax.Array) -> jax.Array:
    """[t]x skew-symmetric matrix. t: (..., 3) -> (..., 3, 3)."""
    zeros = jnp.zeros_like(t[..., 0])
    tx, ty, tz = t[..., 0], t[..., 1], t[..., 2]
    rows = jnp.stack([
        jnp.stack([zeros, -tz, ty], axis=-1),
        jnp.stack([tz, zeros, -tx], axis=-1),
        jnp.stack([-ty, tx, zeros], axis=-1),
    ], axis=-2)
    return rows


def essential_from_pose(T_0to1: jax.Array) -> jax.Array:
    """E = [t]x @ R from a 4x4 (or (..., 4, 4)) relative transform
    (ref tools/metrics.py:61-62)."""
    R = T_0to1[..., :3, :3]
    t = T_0to1[..., :3, 3]
    return cross_product_matrix(t) @ R


def normalize_points(pts: jax.Array, K: jax.Array) -> jax.Array:
    """Pinhole-normalize pixel points. pts: (..., N, 2), K: (..., 3, 3)."""
    c = jnp.stack([K[..., 0, 2], K[..., 1, 2]], axis=-1)[..., None, :]
    f = jnp.stack([K[..., 0, 0], K[..., 1, 1]], axis=-1)[..., None, :]
    return (pts - c) / f


def to_homogeneous(pts: jax.Array) -> jax.Array:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


@highp
def symmetric_epipolar_distance(pts0: jax.Array, pts1: jax.Array,
                                E: jax.Array, K0: jax.Array,
                                K1: jax.Array) -> jax.Array:
    """Squared symmetric epipolar distance in normalized coords
    (ref tools/metrics.py:32-52). pts: (..., N, 2) pixels; E: (..., 3, 3)."""
    p0 = to_homogeneous(normalize_points(pts0, K0))
    p1 = to_homogeneous(normalize_points(pts1, K1))
    Ep0 = p0 @ jnp.swapaxes(E, -1, -2)           # (..., N, 3)
    p1Ep0 = jnp.sum(p1 * Ep0, axis=-1)
    Etp1 = p1 @ E
    d = p1Ep0 ** 2 * (1.0 / (Ep0[..., 0] ** 2 + Ep0[..., 1] ** 2)
                      + 1.0 / (Etp1[..., 0] ** 2 + Etp1[..., 1] ** 2))
    return d


@highp
def sampson_distance(p0h: jax.Array, p1h: jax.Array, F: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) error. p0h/p1h: (..., N, 3) homogeneous;
    F: (..., 3, 3). Returns squared distance (..., N)."""
    Fp0 = p0h @ jnp.swapaxes(F, -1, -2)
    Ftp1 = p1h @ F
    num = jnp.sum(p1h * Fp0, axis=-1) ** 2
    den = (Fp0[..., 0] ** 2 + Fp0[..., 1] ** 2
           + Ftp1[..., 0] ** 2 + Ftp1[..., 1] ** 2)
    return num / jnp.maximum(den, 1e-12)
