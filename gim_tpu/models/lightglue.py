"""LightGlue sparse matcher, TPU-native.

Functional parity target: /root/reference/networks/lightglue/models/
matchers/lightglue.py — learnable Fourier rotary positional encoding (:46-59),
9 transformer layers of SelfBlock (:125-157) + bidirectional shared-FFN
CrossBlock (:160-215), MatchAssignment sigmoid-log-double-softmax with
dustbins (:265-281, :250-262), mutual filtering at threshold 0.1 (:287-304).

TPU design notes: the reference's early-exit (TokenConfidence) and width
pruning are data-dependent-shape optimizations that are off by default
(:316-317) and would defeat XLA compilation; here the depth is static and
padded keypoints are handled by validity masks threaded into attention.
Attention runs as plain batched MXU einsums (N<=2048 tokens — flash-style
tiling buys nothing at this size).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gim_tpu.config import LightGlueConfig
from gim_tpu.ops.attention import apply_rotary, sdpa
from gim_tpu.ops.matching import filter_matches, sigmoid_log_double_softmax


def normalize_keypoints(kpts: jax.Array, size: jax.Array) -> jax.Array:
    """Center and scale kpts by image size (ref lightglue.py:22-33).
    kpts: (B, K, 2); size: (B, 2) as (w, h)."""
    shift = size / 2.0
    scale = jnp.max(size, axis=-1) / 2.0
    return (kpts - shift[:, None, :]) / scale[:, None, None]


class FourierPosEnc(nn.Module):
    """Learnable Fourier features -> cached rotary cos/sin (ref :46-59)."""

    head_dim: int

    @nn.compact
    def __call__(self, kpts: jax.Array) -> jax.Array:
        proj = nn.Dense(self.head_dim // 2, use_bias=False, name="Wr")(kpts)
        emb = jnp.stack([jnp.cos(proj), jnp.sin(proj)], axis=0)  # (2, B, K, F)
        emb = emb[:, :, None, :, :]                              # head axis
        return jnp.repeat(emb, 2, axis=-1)                       # interleave x2


class FFN(nn.Module):
    """Linear(2d->2d) -> LayerNorm -> GELU -> Linear(2d->d) (ref :137-142)."""

    dim: int

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Dense(2 * self.dim, name="fc1")(x)
        x = nn.LayerNorm(name="norm")(x)
        x = nn.gelu(x)
        return nn.Dense(self.dim, name="fc2")(x)


class SelfBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jax.Array, encoding: jax.Array,
                 mask: jax.Array | None = None) -> jax.Array:
        B, K, d = x.shape
        hd = d // self.heads
        qkv = nn.Dense(3 * d, name="Wqkv")(x)
        # reference layout: unflatten(-1, (heads, head_dim, 3)) (ref :151)
        qkv = qkv.reshape(B, K, self.heads, hd, 3)
        qkv = jnp.transpose(qkv, (0, 2, 1, 3, 4))  # (B, H, K, hd, 3)
        q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
        q = apply_rotary(q, encoding)
        k = apply_rotary(k, encoding)
        ctx = sdpa(q, k, v, mask)                    # (B, H, K, hd)
        msg = jnp.transpose(ctx, (0, 2, 1, 3)).reshape(B, K, d)
        msg = nn.Dense(d, name="out_proj")(msg)
        return x + FFN(self.dim, name="ffn")(jnp.concatenate([x, msg], -1))


class CrossBlock(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x0: jax.Array, x1: jax.Array,
                 mask: jax.Array | None = None):
        B, K0, d = x0.shape
        K1 = x1.shape[1]
        hd = d // self.heads
        scale = hd ** -0.25  # reference applies sqrt(scale) to both sides

        to_qk = nn.Dense(d, name="to_qk")
        to_v = nn.Dense(d, name="to_v")
        to_out = nn.Dense(d, name="to_out")
        ffn = FFN(self.dim, name="ffn")

        def split(t, K):
            return jnp.transpose(t.reshape(B, K, self.heads, hd), (0, 2, 1, 3))

        qk0 = split(to_qk(x0), K0) * scale
        qk1 = split(to_qk(x1), K1) * scale
        v0 = split(to_v(x0), K0)
        v1 = split(to_v(x1), K1)

        sim = jnp.einsum("bhid,bhjd->bhij", qk0, qk1)
        if mask is not None:
            sim = jnp.where(mask, sim, -jnp.inf)
        a01 = jax.nn.softmax(sim, axis=-1)
        a10 = jax.nn.softmax(jnp.swapaxes(sim, -1, -2), axis=-1)
        m0 = jnp.einsum("bhij,bhjd->bhid", a01, v1)
        m1 = jnp.einsum("bhji,bhjd->bhid", jnp.swapaxes(a10, -1, -2), v0)
        if mask is not None:
            m0 = jnp.nan_to_num(m0)
            m1 = jnp.nan_to_num(m1)

        def merge(t, K):
            return jnp.transpose(t, (0, 2, 1, 3)).reshape(B, K, d)

        m0 = to_out(merge(m0, K0))
        m1 = to_out(merge(m1, K1))
        x0 = x0 + ffn(jnp.concatenate([x0, m0], -1))
        x1 = x1 + ffn(jnp.concatenate([x1, m1], -1))
        return x0, x1


class MatchAssignment(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, desc0: jax.Array, desc1: jax.Array,
                 valid0: jax.Array | None = None,
                 valid1: jax.Array | None = None):
        proj = nn.Dense(self.dim, name="final_proj")
        matchability = nn.Dense(1, name="matchability")
        md0 = proj(desc0) / self.dim ** 0.25
        md1 = proj(desc1) / self.dim ** 0.25
        sim = jnp.einsum("bmd,bnd->bmn", md0, md1)
        z0 = matchability(desc0)[..., 0]
        z1 = matchability(desc1)[..., 0]
        if valid0 is not None:
            # padded slots: kill similarity and matchability so their
            # assignment mass lands in the dustbin and mscores ~ 0
            neg = -1e9
            sim = jnp.where(valid0[:, :, None] & valid1[:, None, :], sim, neg)
            z0 = jnp.where(valid0, z0, neg)
            z1 = jnp.where(valid1, z1, neg)
        scores = sigmoid_log_double_softmax(sim, z0, z1)
        return scores, sim


class TokenConfidence(nn.Module):
    """Early-exit confidence head (ref :62-73). Present for weight-parity;
    the TPU forward is static-depth so it is only exposed for inspection."""

    @nn.compact
    def __call__(self, desc0: jax.Array, desc1: jax.Array):
        token = nn.Dense(1, name="token")
        return (jax.nn.sigmoid(token(desc0))[..., 0],
                jax.nn.sigmoid(token(desc1))[..., 0])


class LightGlue(nn.Module):
    cfg: LightGlueConfig

    @nn.compact
    def __call__(self, kpts0, kpts1, desc0, desc1, size0, size1,
                 valid0=None, valid1=None):
        """kpts: (B,K,2) px (+0.5 centered); desc: (B,K,D); size: (B,2) (w,h);
        valid: (B,K) masks for padded keypoint slots."""
        c = self.cfg
        hd = c.descriptor_dim // c.num_heads
        p0 = normalize_keypoints(kpts0, size0)
        p1 = normalize_keypoints(kpts1, size1)

        if c.input_dim != c.descriptor_dim:
            proj = nn.Dense(c.descriptor_dim, name="input_proj")
            desc0, desc1 = proj(desc0), proj(desc1)

        posenc = FourierPosEnc(hd, name="posenc")
        enc0 = posenc(p0)
        enc1 = posenc(p1)

        smask0 = smask1 = xmask = None
        if valid0 is not None:
            smask0 = (valid0[:, None, :, None] & valid0[:, None, None, :])
            smask1 = (valid1[:, None, :, None] & valid1[:, None, None, :])
            xmask = (valid0[:, None, :, None] & valid1[:, None, None, :])

        for i in range(c.n_layers):
            # SelfBlock weights are shared between the two images (ref :236-237)
            sb = SelfBlock(c.descriptor_dim, c.num_heads, name=f"self_{i}")
            desc0 = sb(desc0, enc0, smask0)
            desc1 = sb(desc1, enc1, smask1)
            desc0, desc1 = CrossBlock(c.descriptor_dim, c.num_heads,
                                      name=f"cross_{i}")(desc0, desc1, xmask)

        scores, sim = MatchAssignment(
            c.descriptor_dim, name="assign_final")(desc0, desc1, valid0, valid1)
        m0, m1, ms0, ms1 = filter_matches(scores, c.filter_threshold)
        if valid0 is not None:
            m0 = jnp.where(valid0, m0, -1)
            m1 = jnp.where(valid1, m1, -1)
            ms0 = jnp.where(valid0, ms0, 0.0)
            ms1 = jnp.where(valid1, ms1, 0.0)
        return {"matches0": m0, "matches1": m1,
                "matching_scores0": ms0, "matching_scores1": ms1,
                "log_assignment": scores,
                "desc0": desc0, "desc1": desc1}


def init_params(rng: jax.Array, cfg: LightGlueConfig, k: int = 64) -> Any:
    model = LightGlue(cfg)
    z2 = jnp.zeros((1, k, 2))
    zd = jnp.zeros((1, k, cfg.input_dim))
    s = jnp.ones((1, 2)) * 64
    # jit: eager init dispatches every op separately (minutes on a tunneled TPU)
    return jax.jit(model.init)(rng, z2, z2, zd, zd, s, s)
