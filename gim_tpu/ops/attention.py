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
    if s <= 64 and q.shape[1] <= 64:
        # short-sequence regime (LoFTR fine stage: 16k windows of 25
        # tokens, head dim 16): the einsums are tiny batched matmuls that
        # serialize on the MXU (~0.6 us each x 131k dispatches). The same
        # contractions as broadcast-multiply-reduce fuse on the VPU —
        # measured 7.6x faster at (16384, 25, 8, 16) (docs/PERF.md).
        KV = jnp.sum(K[:, :, :, :, None] * v[:, :, :, None, :], axis=1)
        Z = 1.0 / (jnp.sum(Q * K.sum(axis=1)[:, None], axis=-1) + eps)
        out = jnp.sum(Q[:, :, :, :, None] * KV[:, None], axis=3)
        return out * Z[..., None] * s
    KV = jnp.einsum("nshd,nshv->nhdv", K, v)
    Z = 1.0 / (jnp.einsum("nlhd,nhd->nlh", Q, K.sum(axis=1)) + eps)
    out = jnp.einsum("nlhd,nhdv->nlhv", Q, KV) * Z[..., None] * s
    return out


def linear_attention_chan(q: jax.Array, k: jax.Array, v: jax.Array,
                          nhead: int,
                          q_mask: jax.Array | None = None,
                          kv_mask: jax.Array | None = None,
                          eps: float = 1e-6) -> jax.Array:
    """elu+1 linear attention in CHANNEL layout: q [N,L,C], k/v [N,S,C].

    Same math as linear_attention, but per-head contractions are computed
    as full C x C matmuls masked to the head-diagonal blocks:
    (K^T V)[hd, h'v] restricted to h == h' IS the per-head KV stack, so
    one (C, S)@(S, C) matmul + a constant 0/1 block mask + one
    (L, C)@(C, C) matmul replace the [N,L,H,D] einsums. On TPU the
    head-split layout pads the D=32 lane dim 4x and forces relayouts
    around every step (round-1 "coarse transformer ~17 ms/pair" ledger
    item); this form keeps every tensor C-minor and every matmul on full
    MXU tiles at 8x redundant-but-masked FLOPs (still <1% of the step).
    """
    N, L, C = q.shape
    D = C // nhead
    Q = elu_feature_map(q)
    K = elu_feature_map(k)
    if q_mask is not None:
        Q = Q * q_mask[:, :, None]
    if kv_mask is not None:
        K = K * kv_mask[:, :, None]
        v = v * kv_mask[:, :, None]
    s = v.shape[1]
    v = v / s  # fp16/bf16 overflow guard, mirrors reference
    hid = jnp.arange(C) // D
    block_mask = (hid[:, None] == hid[None, :]).astype(Q.dtype)  # (C, C)
    KV = jnp.einsum("nsc,nse->nce", K, v) * block_mask
    num = jnp.einsum("nlc,nce->nle", Q, KV)
    # denominator per head: segment-sum Q * sum(K) over each head's block
    Zh = (Q * K.sum(axis=1)[:, None, :]).reshape(N, L, nhead, D).sum(-1)
    Z = 1.0 / (Zh + eps)                                  # (N, L, H)
    return num * jnp.repeat(Z, D, axis=-1) * s


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
