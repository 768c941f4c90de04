"""Patch/window extraction (TPU-native replacement for F.unfold).

Used by LoFTR fine preprocessing: extract WxW windows around coarse match
centers at fine-feature resolution (ref networks/loftr/submodules/
fine_preprocess.py:40-48). Implemented with gathers over a padded feature
map — static shapes, no im2col materialization beyond the selected windows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("window", "stride"))
def extract_windows_batch(feat: jax.Array, centers_ij: jax.Array, *,
                          window: int, stride: int) -> jax.Array:
    """Gather W*W windows from `feat` (B, H, W, C) around coarse cells.

    centers_ij: (B, M) flattened coarse indices into an (H//stride,
    W//stride) grid; each selects the window centered at fine-map location
    i*stride — exactly the windows F.unfold(kernel=W, stride=stride,
    padding=W//2) produces at each coarse cell (ref fine_preprocess.py:40-43).
    Returns (B, M, window*window, C).

    NHWC in, NHWC rows out: ONE batched take_along_axis over (B, H*W, C)
    rows with clamped indices, border zeros applied as a fused output mask
    (F.unfold zero-padding semantics without materializing a padded copy
    of the full fine map). vmap(jnp.take) at this shape scalarizes on TPU
    (measured 770x slower), and the round-1 CHW form additionally paid two
    full-feature-map relayouts around its pad (docs/PERF.md).
    """
    B, H, W, C = feat.shape
    M = centers_ij.shape[1]
    r = window // 2
    Wc = W // stride
    ci = (centers_ij // Wc) * stride
    cj = (centers_ij % Wc) * stride

    off = jnp.arange(-r, r + 1)
    yy = ci[:, :, None, None] + off[None, None, :, None]      # (B, M, w, 1)
    xx = cj[:, :, None, None] + off[None, None, None, :]      # (B, M, 1, w)
    yy = jnp.broadcast_to(yy, (B, M, window, window))
    xx = jnp.broadcast_to(xx, (B, M, window, window))
    valid = (yy >= 0) & (yy < H) & (xx >= 0) & (xx < W)
    idx = (jnp.clip(yy, 0, H - 1) * W
           + jnp.clip(xx, 0, W - 1)).reshape(B, -1)      # (B, M*w*w)
    flat = feat.reshape(B, -1, C)
    out = jnp.take_along_axis(flat, idx[..., None], axis=1)  # (B, M*w*w, C)
    out = out * valid.reshape(B, -1, 1).astype(out.dtype)
    return out.reshape(B, M, window * window, C)


def extract_windows_at(feat: jax.Array, centers_ij: jax.Array, *,
                       window: int, stride: int) -> jax.Array:
    """Single-image CHW form: feat (C, H, W), centers_ij (M,) ->
    (M, window*window, C)."""
    return extract_windows_batch(jnp.transpose(feat, (1, 2, 0))[None],
                                 centers_ij[None],
                                 window=window, stride=stride)[0]


def unfold_nchw(x: jax.Array, kernel: int, stride: int, padding: int) -> jax.Array:
    """Dense F.unfold equivalent: (N, C, H, W) -> (N, C*k*k, L) matching
    torch's channel-major window layout. Static shapes throughout."""
    N, C, H, W = x.shape
    xp = jnp.pad(x, ((0, 0), (0, 0), (padding, padding), (padding, padding)))
    Ho = (H + 2 * padding - kernel) // stride + 1
    Wo = (W + 2 * padding - kernel) // stride + 1
    # precision HIGHEST: this is pure data movement (identity-kernel conv);
    # default TPU precision would truncate the values to bf16
    patches = jax.lax.conv_general_dilated_patches(
        xp, (kernel, kernel), (stride, stride), "VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)  # (N, C*k*k, Ho, Wo)
    return patches.reshape(N, C * kernel * kernel, Ho * Wo), (Ho, Wo)
