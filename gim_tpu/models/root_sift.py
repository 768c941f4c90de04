"""RootSIFT baseline matcher.

Parity target: ref trainer/lightning.py:195-241 — cv2 SIFT detection
(host C++), RootSIFT normalization (L1-normalize then sqrt), mutual-NN +
ratio test 0.8 computed from descriptor similarity. The similarity matmul
and mutual/ratio selection run on device; detection stays host-side (the
reference also keeps SIFT on CPU via OpenCV).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def detect_rootsift(rgb_u8: np.ndarray, max_kpts: int | None = None):
    """cv2 SIFT + RootSIFT descriptors. rgb: (H, W, 3) uint8.
    Returns kpts (N, 2) float32, desc (N, 128) float32 (RootSIFT)."""
    import cv2

    H, W = rgb_u8.shape[:2]
    n = max_kpts or (H * W // 64)
    sift = cv2.SIFT_create(nfeatures=n, contrastThreshold=1e-5)
    bgr = cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2BGR)
    kpts, desc = sift.detectAndCompute(bgr, None)
    if desc is None or len(kpts) == 0:
        return np.zeros((0, 2), np.float32), np.zeros((0, 128), np.float32)
    pts = np.array([kp.pt for kp in kpts], np.float32)
    desc = desc.astype(np.float32)
    desc = np.sqrt(desc / np.maximum(desc.sum(axis=1, keepdims=True), 1e-12))
    return pts, desc


def pad_to(arr: np.ndarray, n: int) -> tuple[np.ndarray, np.ndarray]:
    m = arr.shape[0]
    valid = np.zeros(n, bool)
    valid[:min(m, n)] = True
    out = np.zeros((n,) + arr.shape[1:], arr.dtype)
    out[:min(m, n)] = arr[:n]
    return out, valid


def match_rootsift(kpts0, desc0, valid0, kpts1, desc1, valid1,
                   ratio: float = 0.8):
    """Device-side mutual-NN + ratio matching (ref lightning.py:217-227).

    All args are fixed-shape arrays; returns (matches to kpts1 idx or -1,
    mconf) aligned with kpts0 slots.
    """
    sim = desc0 @ desc1.T                                # (N0, N1) cosine
    neg = -1e9
    sim = jnp.where(valid0[:, None] & valid1[None, :], sim, neg)
    mutual = ((sim == sim.max(axis=1, keepdims=True))
              & (sim == sim.max(axis=0, keepdims=True)))
    has = mutual.any(axis=1)
    idx = jnp.argmax(mutual, axis=1)
    # Lowe ratio on descriptor L2 distance: d = sqrt(2 - 2 sim)
    top2 = jax.lax.top_k(sim, 2)[0]
    d = jnp.sqrt(jnp.maximum(-2.0 * top2 + 2.0, 0.0))
    ratio_ok = (d[:, 0] / jnp.maximum(d[:, 1], 1e-12)) < ratio
    ok = has & ratio_ok & valid0
    conf = jnp.where(ok, sim.max(axis=1), 0.0)
    return jnp.where(ok, idx, -1), conf


def match_pair_rootsift(rgb0: np.ndarray, rgb1: np.ndarray,
                        max_kpts: int = 4096, ratio: float = 0.8):
    """Full host+device RootSIFT pipeline on one RGB pair (original res).
    Returns (mkpts0 (M,2), mkpts1 (M,2), mconf (M,)) numpy arrays."""
    k0, d0 = detect_rootsift(rgb0)
    k1, d1 = detect_rootsift(rgb1)
    k0p, v0 = pad_to(k0, max_kpts)
    d0p, _ = pad_to(d0, max_kpts)
    k1p, v1 = pad_to(k1, max_kpts)
    d1p, _ = pad_to(d1, max_kpts)
    m, conf = match_rootsift(jnp.asarray(k0p), jnp.asarray(d0p),
                             jnp.asarray(v0), jnp.asarray(k1p),
                             jnp.asarray(d1p), jnp.asarray(v1), ratio)
    m = np.asarray(m)
    conf = np.asarray(conf)
    sel = m >= 0
    return k0p[sel], k1p[np.asarray(m)[sel]], conf[sel]
