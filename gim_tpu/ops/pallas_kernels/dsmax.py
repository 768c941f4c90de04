"""Fused dual-softmax mutual matching (Pallas TPU kernel).

The LoFTR coarse matcher needs, for features f0 (L, C) and f1 (S, C):
    conf = softmax_rows(sim) * softmax_cols(sim),  sim = f0 f1^T / T
followed by row-wise argmax/max (and the transposed side for the mutual
check). Materializing conf costs L*S floats of HBM (486 MB at 840px,
several round trips). This kernel streams sim tiles out of two MXU matmul
passes and never writes the matrix:

- pass 1 (`_stats_kernel`): per row-block, online max/sum of exp over all
  column tiles (flash-attention style rescaling) -> (max, sum) per row.
  Called twice (once transposed) for row and column stats.
- pass 2 (`_argmax_kernel`): recomputes sim tiles, forms
  conf = exp(s - rmax)/rsum * exp(s - cmax)/csum with both stats resident
  in VMEM, and tracks the per-row best column and value. Called twice for
  the mutual check.

Cost: 4 MXU sweeps of L*S*C MACs, zero conf-matrix HBM traffic.
Interpret mode keeps CPU tests exact.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _stats_kernel(f0_ref, f1_ref, inv_t_ref, mask1_ref, max_ref, sum_ref,
                  *, block_s: int):
    """Row-block program: online softmax stats over all column tiles.
    f0_ref: (BL, C); f1_ref: (S, C) resident; outputs (BL, 1) each."""
    S = f1_ref.shape[0]
    inv_t = inv_t_ref[0]
    n_s = S // block_s

    def body(si, carry):
        m, s = carry
        f1 = f1_ref[pl.ds(si * block_s, block_s), :]
        sim = jnp.dot(f0_ref[:], f1.T,
                      preferred_element_type=jnp.float32) * inv_t
        msk = mask1_ref[pl.ds(si * block_s, block_s)]
        sim = jnp.where(msk[None, :] > 0, sim, NEG)
        tile_max = jnp.max(sim, axis=1, keepdims=True)
        new_m = jnp.maximum(m, tile_max)
        s = s * jnp.exp(m - new_m) + jnp.sum(jnp.exp(sim - new_m), axis=1,
                                             keepdims=True)
        return new_m, s

    m0 = jnp.full((f0_ref.shape[0], 1), NEG, jnp.float32)
    s0 = jnp.zeros((f0_ref.shape[0], 1), jnp.float32)
    m, s = jax.lax.fori_loop(0, n_s, body, (m0, s0))
    max_ref[:] = m
    sum_ref[:] = s


def _argmax_kernel(f0_ref, f1_ref, inv_t_ref, mask1_ref, rmax_ref, rsum_ref,
                   cmax_ref, csum_ref, best_ref, conf_ref, *, block_s: int):
    """Row-block program: conf argmax over all column tiles."""
    S = f1_ref.shape[0]
    inv_t = inv_t_ref[0]
    n_s = S // block_s
    BL = f0_ref.shape[0]

    def body(si, carry):
        best_v, best_j = carry
        f1 = f1_ref[pl.ds(si * block_s, block_s), :]
        sim = jnp.dot(f0_ref[:], f1.T,
                      preferred_element_type=jnp.float32) * inv_t
        msk = mask1_ref[pl.ds(si * block_s, block_s)]
        sim = jnp.where(msk[None, :] > 0, sim, NEG)
        cm = cmax_ref[pl.ds(si * block_s, block_s)]
        cs = csum_ref[pl.ds(si * block_s, block_s)]
        conf = (jnp.exp(sim - rmax_ref[:]) / rsum_ref[:]
                * jnp.exp(sim - cm[None, :]) / cs[None, :])
        tile_v = jnp.max(conf, axis=1)
        tile_j = jnp.argmax(conf, axis=1).astype(jnp.int32) + si * block_s
        upd = tile_v > best_v
        return jnp.where(upd, tile_v, best_v), jnp.where(upd, tile_j, best_j)

    v0 = jnp.full((BL,), -1.0, jnp.float32)
    j0 = jnp.zeros((BL,), jnp.int32)
    v, j = jax.lax.fori_loop(0, n_s, body, (v0, j0))
    best_ref[:] = j
    conf_ref[:] = v


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _pad_rows(f, L_pad):
    return jnp.pad(f, ((0, L_pad - f.shape[0]), (0, 0)))


@functools.partial(jax.jit, static_argnames=("block_l", "block_s"))
def _stats(f0, f1, inv_t, mask1, block_l=256, block_s=256):
    L = f0.shape[0]
    grid = (L // block_l,)
    return pl.pallas_call(
        functools.partial(_stats_kernel, block_s=block_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_l, f0.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((f1.shape[0], f1.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((f1.shape[0],), lambda i: (0,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_l, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((L, 1), jnp.float32),
                   jax.ShapeDtypeStruct((L, 1), jnp.float32)],
        interpret=_interpret(),
    )(f0, f1, inv_t, mask1)


@functools.partial(jax.jit, static_argnames=("block_l", "block_s"))
def _argmax(f0, f1, inv_t, mask1, rmax, rsum, cmax, csum,
            block_l=256, block_s=256):
    L = f0.shape[0]
    S = f1.shape[0]
    grid = (L // block_l,)
    return pl.pallas_call(
        functools.partial(_argmax_kernel, block_s=block_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_l, f0.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S, f1.shape[1]), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((S,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_l,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l,), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((L,), jnp.int32),
                   jax.ShapeDtypeStruct((L,), jnp.float32)],
        interpret=_interpret(),
    )(f0, f1, inv_t, mask1, rmax, rsum, cmax, csum)


def dual_softmax_mutual(f0: jax.Array, f1: jax.Array, temperature: float,
                        mask0: jax.Array | None = None,
                        mask1: jax.Array | None = None,
                        block: int = 256):
    """Fused per-pair dual-softmax mutual matching.

    f0: (L, C), f1: (S, C) pre-scaled features (1/sqrt(C) applied);
    masks: (L,)/(S,) bool. Returns (j_best (L,), conf (L,), mutual (L,)):
    the column argmax of conf per row, its value, and whether the match is
    mutual. Equivalent to dense `dual_softmax` + row/col argmax without
    materializing (L, S).
    """
    L, C = f0.shape
    S = f1.shape[0]
    Lp = _round_up(L, block)
    Sp = _round_up(S, block)
    f0p = _pad_rows(f0.astype(jnp.float32), Lp)
    f1p = _pad_rows(f1.astype(jnp.float32), Sp)
    m0 = jnp.ones(L, jnp.float32) if mask0 is None else mask0.astype(jnp.float32)
    m1 = jnp.ones(S, jnp.float32) if mask1 is None else mask1.astype(jnp.float32)
    m0p = jnp.pad(m0, (0, Lp - L))
    m1p = jnp.pad(m1, (0, Sp - S))
    inv_t = jnp.array([1.0 / temperature], jnp.float32)

    rmax, rsum = _stats(f0p, f1p, inv_t, m1p, block, block)
    cmax, csum = _stats(f1p, f0p, inv_t, m0p, block, block)
    jbest, conf_r = _argmax(f0p, f1p, inv_t, m1p, rmax, rsum,
                            cmax[:, 0], csum[:, 0], block, block)
    ibest, _ = _argmax(f1p, f0p, inv_t, m0p, cmax, csum,
                       rmax[:, 0], rsum[:, 0], block, block)

    jbest = jbest[:L]
    conf_r = conf_r[:L]
    ibest = ibest[:S]
    mutual = jnp.take(ibest, jnp.clip(jbest, 0, S - 1)) == jnp.arange(L)
    valid_rows = (m0 > 0) if mask0 is not None else jnp.ones(L, bool)
    return jbest, jnp.where(valid_rows, conf_r, 0.0), mutual & valid_rows
