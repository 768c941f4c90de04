"""Fused ConvRefiner block: depthwise 5x5 + BN + ReLU + 1x1, one pass.

The DKM/RoMa refiner block (ref dkm.py:27-47 ConvRefiner.create_block:
dw-KxK conv, BatchNorm, ReLU, 1x1 conv) runs at the decoder's finest
scales on tensors like (B, 1152, 1536, 24) and (B, 576, 768, 144). In
NHWC those channel widths occupy 24/128 and 144/256 of the lane tile, so
every XLA conv pays 2-5x padded HBM traffic, and the four ops are four
round trips. This kernel runs the whole block in one HBM read + one HBM
write in a channel-leading (B, C, H, W) layout where W rides the full
128-lane axis:

  - depthwise 5x5 as 25 shifted multiply-accumulates on the VPU over a
    manually-DMA'd halo tile (grid blocks overlap by 4 rows, which
    BlockSpec index maps cannot express — the input stays in ANY/HBM and
    each step copies its (C, th+4, W+4) window),
  - BatchNorm folded into the dw weights/bias on the host side (running
    stats, inference only),
  - ReLU on the accumulator,
  - the 1x1 conv as one MXU contraction over C.

Parity: tests/test_pallas_kernels.py checks against the flax block
(NHWC lax.conv path) in interpret mode. Not used in training graphs
(BN needs batch stats there).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gim_tpu.ops.pallas_kernels.dsmax import _interpret


def _kernel(xp_hbm, wdw_ref, bdw_ref, w1_ref, b1_ref, out_ref,
            scratch, sem, *, th: int, K: int, W: int):
    b = pl.program_id(0)
    i = pl.program_id(1)
    C = wdw_ref.shape[0]

    # halo'd input window. Mosaic requires HBM->VMEM slice offsets/sizes
    # to be 8-row (sublane) aligned, so with th % 8 == 0 and top padding
    # of exactly r rows we copy the aligned window [i*th, i*th + th + 8):
    # output row t reads scratch rows t..t+K-1 (halo r above, the last
    # 8-(K-1) copied rows are unused alignment slack). The scratch shape
    # is the single source of truth for the window height (fused_dw_block
    # sizes it as th + (-(K-1)) % 8 + (K-1)).
    hwin = scratch.shape[1]
    dma = pltpu.make_async_copy(
        xp_hbm.at[b, :, pl.ds(i * th, hwin), :], scratch, sem)
    dma.start()
    dma.wait()

    x = scratch[:]                                   # (C, th+K-1, W+K-1)
    acc = jnp.zeros((C, th, W), jnp.float32)
    for a in range(K):
        for bb in range(K):
            tap = wdw_ref[:, a * K + bb]             # (C,)
            # cast BEFORE inserting minor dims: Mosaic only supports
            # non-no-op minor-dim insertion on 32-bit vectors (bf16
            # tap[:, None, None] fails to compile on real TPU)
            acc = acc + tap.astype(jnp.float32)[:, None, None] \
                * x[:, a:a + th, bb:bb + W].astype(jnp.float32)
    h = jnp.maximum(acc + bdw_ref[:, 0].astype(jnp.float32)[:, None, None],
                    0.0)
    h = h.astype(w1_ref.dtype)
    # 1x1 conv: contraction over the leading channel dim on the MXU.
    # Mosaic supports only 2D matmuls (a 2Dx3D dot_general fails layout
    # inference: "unsupported shape cast"), so run one (C_out,C)x(C,W)
    # matmul per row with direct stores — th is 8/16 and the kernel is
    # HBM-bound, so the unroll costs nothing.
    b1 = b1_ref[:, 0].astype(jnp.float32)[:, None]   # (C_out, 1)
    for t in range(th):
        row = jax.lax.dot_general(
            w1_ref[:], h[:, t, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)      # (C_out, W)
        out_ref[0, :, t, :] = (row + b1).astype(out_ref.dtype)


def _tiling(H: int, W: int, K: int, block_h: int):
    """Shared tile math for fused_dw_block and its VMEM estimator."""
    th = min(-(-block_h // 8) * 8, -(-H // 8) * 8)
    nh = -(-H // th)
    hwin = th + (-(K - 1)) % 8 + (K - 1)
    Wc = -(-W // 128) * 128
    Wp = Wc + 128
    return th, nh, hwin, Wc, Wp


def vmem_estimate(C: int, C_out: int, H: int, W: int, K: int,
                  block_h: int, itemsize: int) -> int:
    """Pessimistic per-grid-step scoped-VMEM bytes for fused_dw_block.

    Measured on a real v5e (round 4): Mosaic does NOT fully reuse stack
    slots across the K*K unrolled shifted-slice temporaries — the RoMa
    scale-2 shape (C=144, 336^2, th=8) needs 36.4 MB scoped vmem where a
    reuse-assuming estimate said 8 MB and the resulting 16 MB limit
    killed compilation. The dominant term is therefore K*K f32 slice
    temps, NOT the halo scratch."""
    th, _, hwin, Wc, Wp = _tiling(H, W, K, block_h)
    KK = K * K
    return (C * hwin * Wp * itemsize          # halo scratch
            + KK * C * th * Wc * 4            # unrolled dw slice temps
            + C * th * Wc * 4                 # f32 accumulator
            + (C + C_out) * th * Wc * itemsize  # h + out block
            + (C * KK + C_out * C + 2 * C_out) * 4)


@functools.partial(jax.jit, static_argnames=("block_h", "interpret"))
def fused_dw_block(x: jax.Array, wdw: jax.Array, bdw: jax.Array,
                   w1: jax.Array, b1: jax.Array, block_h: int = 16,
                   interpret: bool | None = None) -> jax.Array:
    """x: (B, C, H, W); wdw: (C, K*K) BN-folded depthwise taps (row-major
    dy, dx); bdw: (C,) folded bias; w1: (C_out, C); b1: (C_out,).
    Returns (B, C_out, H, W) in x.dtype."""
    B, C, H, W = x.shape
    KK = wdw.shape[1]
    K = int(round(KK ** 0.5))
    r = K // 2
    # th must be 8-row aligned (DMA slice offsets i*th and sizes must sit
    # on sublane boundaries) — round a non-multiple block_h up rather than
    # silently emitting unaligned DMA offsets on real TPU.
    # Lane alignment: both the DMA'd window and the output stores must be
    # 128-multiple wide (stores at W=1344 fail layout inference), so
    # compute on Wc = ceil(W/128)*128 columns (the slack is zero padding,
    # sliced off at the end) over a Wc+128 scratch that holds the halo.
    # Pad rows: dw halo (r top) + enough bottom rows that the last block's
    # aligned copy window [(nh-1)*th, (nh-1)*th + hwin) stays in bounds.
    th, nh, hwin, Wc, Wp = _tiling(H, W, K, block_h)
    hp = nh * th
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, (nh - 1) * th + hwin - r - H),
                     (r, Wp - W - r)))
    C_out = w1.shape[0]

    out = pl.pallas_call(
        functools.partial(_kernel, th=th, K=K, W=Wc),
        grid=(B, nh),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((C, KK), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out, C), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C_out, 1), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C_out, th, Wc),
                               lambda b, i: (b, 0, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, C_out, hp, Wc), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((C, hwin, Wp), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
        # Scoped-vmem limit from the measured-realistic estimator (see
        # vmem_estimate: Mosaic does not reuse the K*K unrolled slice
        # temps, so the old scratch-based 2x estimate produced a 16M limit
        # that the compiler then genuinely overran at RoMa/DKM eval
        # shapes). GIM_TPU_REFINER_VMEM_MB overrides for experiments; the
        # dispatcher (blocks._fuse_hidden_blocks) falls back to the XLA
        # path when the estimate exceeds the hardware budget.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=int(os.environ["GIM_TPU_REFINER_VMEM_MB"])
            * 1024 * 1024 if os.environ.get("GIM_TPU_REFINER_VMEM_MB")
            else max(16 * 1024 * 1024,
                     int(1.25 * vmem_estimate(C, C_out, H, W, K, block_h,
                                              x.dtype.itemsize)))),
        interpret=_interpret() if interpret is None else interpret,
    )(xp, wdw, bdw[:, None], w1, b1[:, None])
    return out[:, :, :H, :W]


def fold_block_params(conv1: dict, bn: dict, bn_stats: dict, conv2: dict,
                      eps: float = 1e-5):
    """Fold flax {conv1(dw), bn, conv2(1x1)} params into kernel inputs.

    conv1["kernel"]: (K, K, 1, C) depthwise; bn: scale/bias; bn_stats:
    mean/var; conv2["kernel"]: (1, 1, C, C_out).
    Returns (wdw (C, K*K), bdw (C,), w1 (C_out, C), b1 (C_out,))."""
    kd = conv1["kernel"]                             # (K, K, 1, C)
    K = kd.shape[0]
    C = kd.shape[-1]
    s = bn["scale"] / jnp.sqrt(bn_stats["var"] + eps)
    t = bn["bias"] - bn_stats["mean"] * s
    wdw = (kd[:, :, 0, :] * s[None, None, :]).transpose(2, 0, 1) \
        .reshape(C, K * K)
    bdw = conv1.get("bias", jnp.zeros(C, kd.dtype)) * s + t
    w1 = conv2["kernel"][0, 0].T                     # (C_out, C)
    b1 = conv2.get("bias", jnp.zeros(w1.shape[0], kd.dtype))
    return wdw, bdw, w1, b1
