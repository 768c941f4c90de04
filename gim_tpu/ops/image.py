"""On-device image preprocessing ops (resize / grayscale / pad / normalize).

Contract mirrors the reference preprocessing semantics
(`/root/reference/datasets/utils.py:80-126` `read_images` and
`/root/reference/tools/__init__.py:202-218` `get_padding_size`) but is
implemented as jittable, static-shape JAX ops so the whole pipeline after
host decode stays in HBM.

Shape policy (XLA needs static shapes): resize geometry (new H/W, scales,
pad offsets) is computed on host with plain Python ints — identical
arithmetic to the reference — while the pixel work (bilinear resample,
pad, grayscale, normalize) runs on device.
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Host-side geometry arithmetic (ints only; mirrors reference semantics)
# ---------------------------------------------------------------------------

def resized_wh(w: int, h: int, resize: int | None) -> tuple[int, int]:
    """Resize so the longer edge equals `resize` (ref datasets/utils.py:34-40)."""
    if resize is None:
        return w, h
    scale = resize / max(h, w)
    return int(round(w * scale)), int(round(h * scale))


def divisible_wh(w: int, h: int, df: int | None) -> tuple[int, int]:
    """Floor both edges to a multiple of df, min df (ref datasets/utils.py:43-53)."""
    if df is None:
        return w, h
    return max(w // df, 1) * df, max(h // df, 1) * df


def target_wh(w: int, h: int, max_resize: int, df: int | None = 8) -> tuple[int, int]:
    """Full reference resize rule: shrink-only longest-edge resize then /df floor
    (ref datasets/utils.py:102-108)."""
    if max(w, h) > max_resize:
        w, h = resized_wh(w, h, max_resize)
    return divisible_wh(w, h, df)


@dataclasses.dataclass(frozen=True)
class PadSpec:
    """Aspect-ratio padding to a (h, w) canvas, centered.

    Mirrors `get_padding_size` (ref tools/__init__.py:202-218): pads the
    image symmetrically so its aspect ratio matches w/h (used by DKM/RoMa
    before resizing to the fixed model resolution).
    """

    orig_w: int
    orig_h: int
    left: int
    right: int
    top: int
    bottom: int

    @property
    def padded_wh(self) -> tuple[int, int]:
        return (self.orig_w + self.left + self.right,
                self.orig_h + self.top + self.bottom)


def aspect_pad_spec(orig_h: int, orig_w: int, h: int, w: int) -> PadSpec:
    aspect = w / h
    new_w = max(orig_w, int(orig_h * aspect))
    new_h = max(orig_h, int(orig_w / aspect))
    ph, pw = new_h - orig_h, new_w - orig_w
    top, left = ph // 2, pw // 2
    return PadSpec(orig_w, orig_h, left, pw - left, top, ph - top)


# ---------------------------------------------------------------------------
# Device ops (jittable, static shapes)
# ---------------------------------------------------------------------------

# ITU-R BT.601 luma weights — matches cv2.cvtColor(..., COLOR_RGB2GRAY).
_LUMA = np.array([0.299, 0.587, 0.114], dtype=np.float32)


def rgb_to_gray(image: jax.Array, channel_axis: int = -1) -> jax.Array:
    """RGB -> grayscale with cv2/BT.601 weights. Keeps dims, drops channel axis."""
    w = jnp.asarray(_LUMA, dtype=jnp.promote_types(image.dtype, jnp.float32))
    img = jnp.moveaxis(image, channel_axis, -1).astype(w.dtype)
    return img @ w


@partial(jax.jit, static_argnames=("new_h", "new_w", "antialias"))
def resize_bilinear(image: jax.Array, new_h: int, new_w: int,
                    antialias: bool = False) -> jax.Array:
    """Bilinear resize on device. `image` is (..., H, W, C) or (..., H, W).

    antialias=False matches cv2.resize(INTER_LINEAR) semantics used by the
    reference loaders for both up and downscaling.
    """
    shape = list(image.shape)
    if image.ndim >= 3 and shape[-1] <= 4:  # channels-last
        shape[-3], shape[-2] = new_h, new_w
    else:
        shape[-2], shape[-1] = new_h, new_w
    return jax.image.resize(image.astype(jnp.float32), shape, method="bilinear",
                            antialias=antialias)


def pad_bottom_right(image: jax.Array, pad_size: int,
                     ret_mask: bool = False):
    """Zero-pad (..., H, W[, C]) to a square (pad_size, pad_size) canvas,
    content anchored top-left (ref datasets/utils.py:56-72)."""
    if image.ndim >= 3 and image.shape[-1] <= 4:
        h, w = image.shape[-3], image.shape[-2]
        pads = [(0, 0)] * (image.ndim - 3) + [(0, pad_size - h), (0, pad_size - w), (0, 0)]
    else:
        h, w = image.shape[-2], image.shape[-1]
        pads = [(0, 0)] * (image.ndim - 2) + [(0, pad_size - h), (0, pad_size - w)]
    padded = jnp.pad(image, pads)
    if not ret_mask:
        return padded, None
    mask = jnp.zeros((pad_size, pad_size), dtype=bool).at[:h, :w].set(True)
    return padded, mask


def aspect_pad(image: jax.Array, spec: PadSpec) -> jax.Array:
    """Centered zero-pad of (..., C, H, W) per PadSpec (ref demo.py:425-428)."""
    pads = [(0, 0)] * (image.ndim - 2) + [(spec.top, spec.bottom),
                                          (spec.left, spec.right)]
    return jnp.pad(image, pads)


def aspect_unpad_mask(kpts: jax.Array, spec: PadSpec) -> tuple[jax.Array, jax.Array]:
    """Shift keypoints (..., 2) in xy back to unpadded frame + validity mask
    (ref demo.py:447-462)."""
    shifted = kpts - jnp.array([spec.left, spec.top], dtype=kpts.dtype)
    ok = ((shifted[..., 0] >= 0) & (shifted[..., 0] < spec.orig_w)
          & (shifted[..., 1] >= 0) & (shifted[..., 1] < spec.orig_h))
    return shifted, ok


def normalize_imagenet(image: jax.Array) -> jax.Array:
    """ImageNet mean/std normalization for (..., 3, H, W) float images in [0,1]."""
    mean = jnp.array([0.485, 0.456, 0.406], dtype=image.dtype).reshape(3, 1, 1)
    std = jnp.array([0.229, 0.224, 0.225], dtype=image.dtype).reshape(3, 1, 1)
    return (image - mean) / std


@dataclasses.dataclass(frozen=True)
class Preprocessed:
    """Output of `preprocess_pair_host`: device-ready tensors + geometry."""

    gray: jax.Array      # (1, H, W) float in [0,1], padded if requested
    color: jax.Array     # (3, H, W) float in [0,1]
    scale: jax.Array     # (2,) [w/w_new, h/h_new]
    mask: jax.Array | None  # (H, W) bool if padded
    resize_hw: tuple[int, int]


def preprocess_image(rgb_u8: np.ndarray, max_resize: int, df: int | None = 8,
                     padding: bool = False) -> Preprocessed:
    """Reference `read_images` pipeline with device-side pixel work.

    Host computes geometry; resize/grayscale/pad/normalize run under jit.
    Parity target: /root/reference/datasets/utils.py:80-126.
    """
    h, w = rgb_u8.shape[:2]
    w_new, h_new = target_wh(w, h, max_resize, df)
    img = jnp.asarray(rgb_u8)
    color = resize_bilinear(img, h_new, w_new)            # (h', w', 3) f32
    gray = rgb_to_gray(color)                             # (h', w')
    scale = jnp.array([w / w_new, h / h_new], dtype=jnp.float32)
    mask = None
    if padding:
        color, _ = pad_bottom_right(color, max_resize)
        gray, mask = pad_bottom_right(gray, max_resize, ret_mask=True)
    gray = gray[None] / 255.0
    color = jnp.moveaxis(color, -1, 0) / 255.0
    return Preprocessed(gray=gray, color=color, scale=scale, mask=mask,
                        resize_hw=(h_new, w_new))
