"""LoFTR transformer: sine positional encoding + linear-attention encoder.

Parity targets:
- PositionEncodingSine with the legacy temp_bug_fix=False divisor
  (ref networks/loftr/utils/position_encoding.py:6-43, built that way in
  loftr.py:22-24 — load-bearing for shipped weights),
- LoFTREncoderLayer / LocalFeatureTransformer
  (ref networks/loftr/submodules/transformer.py:7-101).
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.ops.attention import (full_attention, linear_attention,
                                   linear_attention_chan)


def sine_pos_encoding(d_model: int, h: int, w: int,
                      temp_bug_fix: bool = False) -> np.ndarray:
    """(h*w, d_model) sinusoidal 2D encoding (ref position_encoding.py:22-36).

    The legacy divisor is -log(10000)/d_model//2 evaluated as
    (-log(10000.)/d_model)//2 semantics-wise? No: `(-math.log(10000.0) / d_model//2)`
    binds as ((-log(10000.0) / d_model) // 2) == floor division — for
    d_model=256 this gives exp(arange*(-1.0)) since (-9.21/256)//2 == -1.0.
    """
    y_pos = np.cumsum(np.ones((h, w)), axis=0)
    x_pos = np.cumsum(np.ones((h, w)), axis=1)
    if temp_bug_fix:
        div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                     * (-math.log(10000.0) / (d_model // 2)))
    else:
        div = np.exp(np.arange(0, d_model // 2, 2, dtype=np.float32)
                     * ((-math.log(10000.0) / d_model) // 2))
    div = div[:, None, None]
    pe = np.zeros((d_model, h, w), dtype=np.float32)
    pe[0::4] = np.sin(x_pos[None] * div)
    pe[1::4] = np.cos(x_pos[None] * div)
    pe[2::4] = np.sin(y_pos[None] * div)
    pe[3::4] = np.cos(y_pos[None] * div)
    return pe.reshape(d_model, h * w).T  # (L, C)


class LoFTREncoderLayer(nn.Module):
    d_model: int
    nhead: int
    attention: str = "linear"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x, source, x_mask=None, source_mask=None):
        B, L, C = x.shape
        dt = self.dtype
        dim = self.d_model // self.nhead
        q = nn.Dense(self.d_model, use_bias=False, dtype=dt, name="q_proj")(x)
        k = nn.Dense(self.d_model, use_bias=False, dtype=dt,
                     name="k_proj")(source)
        v = nn.Dense(self.d_model, use_bias=False, dtype=dt,
                     name="v_proj")(source)
        if self.attention == "linear" and source.shape[1] > 64:
            # long-sequence (coarse) path stays in [N, L, C] layout — the
            # [N, L, H, 32] head split pads the lane dim 4x on TPU
            msg = linear_attention_chan(q, k, v, self.nhead,
                                        x_mask, source_mask)
        else:
            q = q.reshape(B, -1, self.nhead, dim)
            k = k.reshape(B, -1, self.nhead, dim)
            v = v.reshape(B, -1, self.nhead, dim)
            attn = (linear_attention if self.attention == "linear"
                    else full_attention)
            msg = attn(q, k, v, x_mask, source_mask)
            msg = msg.reshape(B, -1, self.d_model)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=dt,
                       name="merge")(msg.astype(dt))
        msg = nn.LayerNorm(dtype=dt, name="norm1")(msg)

        msg = nn.Dense(2 * self.d_model, use_bias=False, dtype=dt,
                       name="mlp1")(jnp.concatenate([x, msg], axis=2))
        msg = nn.relu(msg)
        msg = nn.Dense(self.d_model, use_bias=False, dtype=dt,
                       name="mlp2")(msg)
        msg = nn.LayerNorm(dtype=dt, name="norm2")(msg)
        return x + msg


class LocalFeatureTransformer(nn.Module):
    """Alternating (self, cross) x n_pairs stack (ref transformer.py:61-101)."""

    d_model: int
    nhead: int
    n_pairs: int
    attention: str = "linear"
    dtype: str = "float32"

    @nn.compact
    def __call__(self, feat0, feat1, mask0=None, mask1=None):
        feat0 = feat0.astype(self.dtype)
        feat1 = feat1.astype(self.dtype)
        for i in range(self.n_pairs):
            slayer = LoFTREncoderLayer(self.d_model, self.nhead,
                                       self.attention, self.dtype,
                                       name=f"self_{i}")
            feat0 = slayer(feat0, feat0, mask0, mask0)
            feat1 = slayer(feat1, feat1, mask1, mask1)
            clayer = LoFTREncoderLayer(self.d_model, self.nhead,
                                       self.attention, self.dtype,
                                       name=f"cross_{i}")
            feat0 = clayer(feat0, feat1, mask0, mask1)
            feat1 = clayer(feat1, feat0, mask1, mask0)
        return feat0, feat1
