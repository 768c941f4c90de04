"""DINOv2 ViT-L/14 (frozen coarse encoder for gim_roma), TPU-native.

Parity target: ref networks/roma/dino.py — DinoVisionTransformer (:322),
vit_large (:621: dim 1024, depth 24, heads 16, mlp ratio 4), Attention
(:54-91, qkv_bias=True in the DINOv2 config), LayerScale (:182,
init_values=1.0), Mlp (:27), bicubic pos-embed interpolation (:457-487).

The xformers memory_efficient_attention (:303-318) is replaced by a plain
fused softmax-attention einsum pair — at 1600-2300 tokens the MXU is fully
occupied without manual tiling; a Pallas flash kernel slot is kept in
gim_tpu/ops for longer sequences.
"""

from __future__ import annotations

import math
import os
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gim_tpu.ops.attention import sdpa


class Attention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True  # DINOv2 ViTs: True; RoMa decoder blocks: False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        B, N, C = x.shape
        hd = C // self.num_heads
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        qkv = qkv.reshape(B, N, 3, self.num_heads, hd)
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4))
        q, k, v = qkv[0], qkv[1], qkv[2]
        if os.environ.get("GIM_TPU_FLASH_VIT", "0") == "1":
            # streaming online-softmax kernel: no (B, H, N, N) HBM temp
            # (pallas_kernels/flash.py; default pending the chip A/B)
            from gim_tpu.ops.pallas_kernels.flash import flash_sdpa

            out = flash_sdpa(q, k, v)                 # (B, H, N, hd)
        else:
            out = sdpa(q, k, v)                       # (B, H, N, hd)
        out = jnp.transpose(out, (0, 2, 1, 3)).reshape(B, N, C)
        return nn.Dense(C, use_bias=True, dtype=self.dtype, name="proj")(out)


class Mlp(nn.Module):
    dim: int
    hidden: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc2")(x)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1.0

    @nn.compact
    def __call__(self, x):
        gamma = self.param("gamma", lambda rng: jnp.full((self.dim,),
                                                         self.init_value))
        return x * gamma.astype(x.dtype)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    layerscale: bool = True
    qkv_bias: bool = True
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        # LayerNorms stay f32 (stats stability); the Dense layers cast
        # their inputs down, so the residual stream and all matmuls run
        # at `dtype` (the reference runs frozen DINOv2 under fp16 autocast)
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm1")(x)
        h = Attention(self.dim, self.num_heads, self.qkv_bias,
                      dtype=self.dtype, name="attn")(h)
        if self.layerscale:
            h = LayerScale(self.dim, name="ls1")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32, name="norm2")(x)
        h = Mlp(self.dim, int(self.dim * self.mlp_ratio),
                dtype=self.dtype, name="mlp")(h)
        if self.layerscale:
            h = LayerScale(self.dim, name="ls2")(h)
        return x + h


class DinoViT(nn.Module):
    """ViT-L/14 trunk returning normalized patch tokens."""

    embed_dim: int = 1024
    depth: int = 24
    num_heads: int = 16
    patch_size: int = 14
    pretrain_img_size: int = 518
    # computation dtype for the patch embed + all block matmuls (params
    # stay f32; LayerNorms compute f32). bfloat16 halves the dominant
    # MXU cost of the frozen encoder — parity with the reference, which
    # also runs DINOv2 reduced-precision (ref roma.py:571-580 amp fp16)
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x_nchw: jax.Array) -> jax.Array:
        """x: (B, 3, H, W) with H, W divisible by 14. Returns
        (B, H/14 * W/14, embed_dim) patch tokens after the final norm."""
        B, _, H, W = x_nchw.shape
        p = self.patch_size
        x = jnp.transpose(x_nchw, (0, 2, 3, 1))
        patches = nn.Conv(self.embed_dim, (p, p), strides=(p, p),
                          dtype=self.dtype,
                          name="patch_embed")(x)   # (B, H/p, W/p, C)
        hp, wp = patches.shape[1:3]
        tokens = patches.reshape(B, hp * wp, self.embed_dim)

        cls_token = self.param("cls_token",
                               nn.initializers.zeros, (1, 1, self.embed_dim))
        n0 = self.pretrain_img_size // p
        pos_embed = self.param("pos_embed", nn.initializers.zeros,
                               (1, n0 * n0 + 1, self.embed_dim))

        # bicubic pos-embed interpolation (ref dino.py:457-487)
        cls_pos = pos_embed[:, :1]
        patch_pos = pos_embed[:, 1:].reshape(1, n0, n0, self.embed_dim)
        if (hp, wp) != (n0, n0):
            patch_pos = jax.image.resize(
                patch_pos, (1, hp, wp, self.embed_dim), method="bicubic")
        patch_pos = patch_pos.reshape(1, hp * wp, self.embed_dim)

        tokens = jnp.concatenate(
            [jnp.broadcast_to(cls_token, (B, 1, self.embed_dim)), tokens], 1)
        tokens = tokens + jnp.concatenate([cls_pos, patch_pos], axis=1)

        for i in range(self.depth):
            tokens = Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                           name=f"block_{i}")(tokens)
        tokens = nn.LayerNorm(epsilon=1e-6, dtype=jnp.float32,
                              name="norm")(tokens)
        return tokens[:, 1:]


def init_params(rng: jax.Array, input_hw=(56, 56)) -> Any:
    model = DinoViT()
    z = jnp.zeros((1, 3, *input_hw))
    return jax.jit(model.init)(rng, z)
