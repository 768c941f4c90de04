"""Attention primitives: elu+1 linear attention, full attention, rotary.

Reference semantics:
- LinearAttention (LoFTR): ref networks/loftr/submodules/attentions.py:14-47
  — O(N·D²) KV aggregation, the mechanism that makes 840-1600px coarse grids
  tractable. Maps to two MXU einsums.
- FullAttention: ref attentions.py:50-81.
- Rotary (LightGlue): ref networks/lightglue/models/matchers/lightglue.py:36-44.

Layouts are [N, L, H, D] to match the reference contract. Pallas fused
versions live in gim_tpu/ops/pallas_kernels/; these jnp forms are the
semantic ground truth XLA already fuses well.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def elu_feature_map(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x) + 1.0


def linear_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     q_mask: jax.Array | None = None,
                     kv_mask: jax.Array | None = None,
                     eps: float = 1e-6) -> jax.Array:
    """elu+1 linear attention. q: [N,L,H,D], k/v: [N,S,H,D] -> [N,L,H,D]."""
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None, None]
        v = v * kv_mask[:, :, None, None]
    s = v.shape[1]
    v = v / s  # fp16/bf16 overflow guard, mirrors reference
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv->nlhv", Q, KV) * Z[..., None] * s
    return out


def full_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   q_mask: jax.Array | None = None,
                   kv_mask: jax.Array | None = None) -> jax.Array:
    """Softmax attention with 1/sqrt(D) temperature. [N,L,H,D] layout."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qk = jnp.einsum("nlhd,nshd->nlsh", q, k)
    if kv_mask is not None:
        qm = q_mask if q_mask is not None else jnp.ones(q.shape[:2], bool)
        mask = qm[:, :, None, None] & kv_mask[:, None, :, None]
        qk = jnp.where(mask, qk, -jnp.inf)
    a = jax.nn.softmax(scale * qk, axis=2)
    if kv_mask is not None:
        a = jnp.nan_to_num(a)  # rows fully masked
    return jnp.einsum("nlsh,nshd->nlhd", a, v)


def sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
         mask: jax.Array | None = None) -> jax.Array:
    """Scaled dot-product attention in [..., H, L, D] layout (torch SDPA
    contract used by LightGlue, ref matchers/lightglue.py:102-122)."""
    scale = 1.0 / (q.shape[-1] ** 0.5)
    qk = jnp.einsum("...hld,...hsd->...hls", q, k) * scale
    if mask is not None:
        qk = jnp.where(mask, qk, -jnp.inf)
    a = jax.nn.softmax(qk, axis=-1)
    if mask is not None:
        a = jnp.nan_to_num(a)
    return jnp.einsum("...hls,...hsd->...hld", a, v)


def rotate_half(x: jax.Array) -> jax.Array:
    """Pairwise (-x2, x1) rotation on the last dim, matching the reference's
    unflatten(-1, (-1, 2)) layout (lightglue.py:36-40)."""
    x = x.reshape(*x.shape[:-1], -1, 2)
    out = jnp.stack([-x[..., 1], x[..., 0]], axis=-1)
    return out.reshape(*out.shape[:-2], -1)


def apply_rotary(x: jax.Array, encoding: jax.Array) -> jax.Array:
    """encoding: stacked (2, ..., D) [cos, sin] as produced by the learnable
    Fourier positional encoding (lightglue.py:42-44)."""
    return x * encoding[0] + rotate_half(x) * encoding[1]
