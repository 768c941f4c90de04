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
def extract_windows_at(feat: jax.Array, centers_ij: jax.Array, *,
                       window: int, stride: int) -> jax.Array:
    """Gather W*W windows from `feat` (C, H, W) around coarse cells.

    centers_ij: (M,) flattened coarse indices into an (H//stride, W//stride)
    grid; each selects the window centered at fine-map location i*stride —
    exactly the windows F.unfold(kernel=W, stride=stride, padding=W//2)
    produces at each coarse cell (ref fine_preprocess.py:40-43).
    Returns (M, window*window, C).
    """
    C, H, W = feat.shape
    r = window // 2
    Wc = W // stride
    ci = (centers_ij // Wc) * stride
    cj = (centers_ij % Wc) * stride

    padded = jnp.pad(feat, ((0, 0), (r, r), (r, r)))
    off = jnp.arange(-r, r + 1)
    # window offsets relative to center; +r compensates padding
    yy = ci[:, None, None] + off[None, :, None] + r      # (M, w, 1)
    xx = cj[:, None, None] + off[None, None, :] + r      # (M, 1, w)
    yy = jnp.broadcast_to(yy, (centers_ij.shape[0], window, window))
    xx = jnp.broadcast_to(xx, (centers_ij.shape[0], window, window))
    idx = (yy * (W + 2 * r) + xx).reshape(-1)            # (M*w*w,)
    # gather ROWS of (P, C) — leading-dim gathers lower efficiently on TPU,
    # minor-dim fancy indexing degenerates to scalar dynamic-slices
    flat = jnp.transpose(padded, (1, 2, 0)).reshape(-1, C)
    out = jnp.take(flat, idx, axis=0)                    # (M*w*w, C)
    return out.reshape(-1, window * window, C)


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
