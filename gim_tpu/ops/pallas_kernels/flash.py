"""Flash (online-softmax) attention for the frozen DINOv2 ViT (Pallas TPU).

The RoMa coarse encoder runs ViT-L/14 self-attention at 672^2 inputs:
(B=2, H=16, N=2305, D=64) per pair. The jnp sdpa path (ops/attention.py)
materializes the (B, H, N, N) attention matrix through HBM between the two
matmuls — ~340 MB bf16 per block x 24 blocks of pure traffic. This kernel
streams K/V tiles against VMEM-resident online-softmax accumulators
(row max / row sum / output accumulator), so the N^2 matrix never exists.

Replaces the reference's xformers memory_efficient_attention
(ref networks/roma/dino.py:303-318) — same memory-oblivious contract,
TPU-native tiling.

Layout: q/k/v (G, N, D) with G = B*H folded; grid (G, N/bq, N/bk), the
key axis fastest. Padding rows (N -> multiple of the block) are masked by
key index; padded QUERY rows produce garbage and are sliced off by the
caller. f32 accumulation; p is cast back to the input dtype for the PV
matmul (MXU bf16 path), matching the jnp path's precision to ~1e-3.

Enabled in gim_tpu/models/dinov2.py behind GIM_TPU_FLASH_VIT.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gim_tpu.ops.pallas_kernels.dsmax import _interpret

NEG = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, n_valid: int, block_k: int, scale: float):
    j = pl.program_id(2)
    nj = pl.num_programs(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref, NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    s = jax.lax.dot_general(
        q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * scale          # (bq, bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
    s = jnp.where(col < n_valid, s, NEG)

    m_old = m_ref[:]
    m_new = jnp.maximum(m_old, jnp.max(s, axis=1, keepdims=True))
    p = jnp.exp(s - m_new)
    alpha = jnp.exp(m_old - m_new)
    l_ref[:] = l_ref[:] * alpha + jnp.sum(p, axis=1, keepdims=True)
    acc_ref[:] = acc_ref[:] * alpha + jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    m_ref[:] = m_new

    @pl.when(j == nj - 1)
    def _():
        o_ref[0] = (acc_ref[:] / l_ref[:]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_sdpa(q: jax.Array, k: jax.Array, v: jax.Array,
               block_q: int = 256, block_k: int = 512) -> jax.Array:
    """Softmax(q k^T / sqrt(D)) v without materializing the N^2 matrix.

    q, k, v: (..., N, D) — leading dims are folded into the grid's batch
    axis (the torch-SDPA [..., H, L, D] contract of ops/attention.sdpa,
    unmasked self-attention case). Returns the same shape/dtype as q.
    """
    orig_shape = q.shape
    N, D = q.shape[-2:]
    G = 1
    for d in q.shape[:-2]:
        G *= d
    q3 = q.reshape(G, N, D)
    k3 = k.reshape(G, N, D)
    v3 = v.reshape(G, N, D)

    blk = max(block_q, block_k)
    npad = -(-N // blk) * blk
    if npad != N:
        pad = ((0, 0), (0, npad - N), (0, 0))
        q3 = jnp.pad(q3, pad)
        k3 = jnp.pad(k3, pad)
        v3 = jnp.pad(v3, pad)

    grid = (G, npad // block_q, npad // block_k)
    kernel = functools.partial(_flash_kernel, n_valid=N, block_k=block_k,
                               scale=1.0 / (D ** 0.5))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, D), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, D), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, D), lambda g, i, j: (g, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((G, npad, D), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),   # running max
            pltpu.VMEM((block_q, 1), jnp.float32),   # running sum
            pltpu.VMEM((block_q, D), jnp.float32),   # output accumulator
        ],
        cost_estimate=pl.CostEstimate(
            flops=4 * G * npad * npad * D,
            bytes_accessed=(3 * G * npad * D + G * npad * D) * q.dtype.itemsize,
            transcendentals=G * npad * npad,
        ),
        interpret=_interpret(),
    )(q3, k3, v3)
    return out[:, :N].reshape(orig_shape)
