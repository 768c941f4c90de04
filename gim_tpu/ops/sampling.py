"""Bilinear grid sampling (TPU-native replacement for torch.nn.functional.grid_sample).

Used by: SuperPoint descriptor interpolation (ref networks/lightglue/superpoint.py:118-150),
DKM/RoMa local correlation and warp resampling
(ref networks/dkm/utils/local_correlation.py:36-38, networks/roma/roma.py:529+).

Implementation is gather-based jnp — XLA lowers the gathers to efficient
dynamic-slice/gather HLO; the hot (2r+1)^2 local-correlation windows live in
gim_tpu/models/dkm/blocks.py:local_correlation (memory-bounded chunked form).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def safe_l2_normalize(x: jax.Array, axis: int = -1,
                      eps: float = 1e-12) -> jax.Array:
    """L2-normalize with a FINITE gradient at x == 0.

    torch's `F.normalize` form `x / max(||x||, eps)` matches forward but its
    VJP is NaN at an exact-zero vector: d||x||/dx = x/||x|| = 0/0, and the
    downstream `maximum` multiplies that NaN by 0, which is still NaN. A
    from-scratch net CAN emit an exact-zero vector (zero-init bias + a
    ReLU-dead position — observed: the round-4 gim_lightglue joint-train NaN
    at step 1, first non-finite grad leaf = SuperPoint convDb, dark-augment
    batch with a dead stem position). `x * rsqrt(sum(x^2) + eps)` is
    forward-identical to float precision for ||x|| >> sqrt(eps) and its
    gradient at 0 is rsqrt(eps) — large but finite, removed by the
    optimizer's global-norm clip.
    """
    sq = jnp.sum(jnp.square(x), axis=axis, keepdims=True)
    return x * jax.lax.rsqrt(sq + eps)


def _unnormalize(coord: jax.Array, size: int, align_corners: bool) -> jax.Array:
    """Map normalized coords [-1, 1] to pixel coords (torch grid_sample rule)."""
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


@partial(jax.jit, static_argnames=("align_corners", "padding_mode"))
def grid_sample(image: jax.Array, grid: jax.Array, *, align_corners: bool = False,
                padding_mode: str = "zeros") -> jax.Array:
    """Bilinear sample `image` (..., C, H, W) at `grid` (..., P, 2) xy in [-1, 1].

    Returns (..., C, P). Leading batch dims of image/grid must broadcast.
    padding_mode: 'zeros' | 'border'.
    """
    C, H, W = image.shape[-3:]
    x = _unnormalize(grid[..., 0], W, align_corners)
    y = _unnormalize(grid[..., 1], H, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    # (..., H*W, C) row-major points: leading-dim gathers are the efficient
    # form on TPU (minor-dim indexing lowers to scalar dynamic-slices)
    rows = jnp.moveaxis(image, -3, -1).reshape(*image.shape[:-3], H * W, C)

    def gather(yy, xx):
        yi = jnp.clip(yy, 0, H - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, W - 1).astype(jnp.int32)
        idx = yi * W + xi                                       # (..., P)
        vals = jnp.take_along_axis(rows, idx[..., :, None], axis=-2)
        vals = jnp.swapaxes(vals, -1, -2)                       # (..., C, P)
        if padding_mode == "zeros":
            ok = (yy >= 0) & (yy <= H - 1) & (xx >= 0) & (xx <= W - 1)
            vals = vals * ok[..., None, :]
        return vals

    out = (gather(y0, x0) * (wy0 * wx0)[..., None, :]
           + gather(y0, x1) * (wy0 * wx1)[..., None, :]
           + gather(y1, x0) * (wy1 * wx0)[..., None, :]
           + gather(y1, x1) * (wy1 * wx1)[..., None, :])
    return out


def grid_sample_nchw(image: jax.Array, grid: jax.Array, *,
                     align_corners: bool = False,
                     padding_mode: str = "zeros") -> jax.Array:
    """torch-layout wrapper: image (N, C, H, W), grid (N, Hg, Wg, 2) -> (N, C, Hg, Wg)."""
    N, C = image.shape[:2]
    Hg, Wg = grid.shape[1:3]
    flat = grid.reshape(N, Hg * Wg, 2)
    out = grid_sample(image, flat, align_corners=align_corners,
                      padding_mode=padding_mode)
    return out.reshape(N, C, Hg, Wg)


def sample_descriptors(kpts: jax.Array, descriptors: jax.Array, s: int = 8,
                       legacy: bool = False) -> jax.Array:
    """SuperPoint descriptor interpolation at keypoint locations.

    kpts: (..., K, 2) xy in full-resolution pixels; descriptors: (..., C, Hc, Wc)
    at stride s. Returns L2-normalized (..., K, C).

    legacy=True replicates the reference's *broken* normalization kept for
    weight compatibility (ref superpoint.py:117-134): divides by s*(size - s/2 - 0.5)
    instead of mapping through the correct half-pixel grid; align_corners=True.
    legacy=False is the fixed path (ref superpoint.py:139-150): align_corners=False
    with proper center offset.
    """
    C, Hc, Wc = descriptors.shape[-3:]
    if legacy:
        div = jnp.array([Wc * s - s / 2 - 0.5, Hc * s - s / 2 - 0.5],
                        dtype=kpts.dtype)
        g = (kpts - s / 2 + 0.5) / div
        g = g * 2 - 1
        ac = True
    else:
        size = jnp.array([Wc * s, Hc * s], dtype=kpts.dtype)
        g = kpts / size * 2 - 1
        ac = False
    out = grid_sample(descriptors, g, align_corners=ac, padding_mode="zeros")
    out = jnp.swapaxes(out, -1, -2)  # (..., K, C)
    # safe form, not torch's max(||x||, eps): zeros-padded samples at
    # padded/border keypoints are exact-zero vectors (NaN VJP otherwise)
    return safe_l2_normalize(out, axis=-1)
