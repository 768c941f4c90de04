"""Fused dual-softmax mutual matching (Pallas TPU kernel).

The LoFTR coarse matcher needs, for features f0 (L, C) and f1 (S, C):
    conf = softmax_rows(sim) * softmax_cols(sim),  sim = f0 f1^T / T
followed by row-wise argmax/max (and the transposed side for the mutual
check). Materializing conf costs L*S floats of HBM (486 MB at 840px,
several round trips). This kernel streams sim tiles out of MXU matmul
passes and never writes the matrix.

Layout: 2-D grid (row tiles, column tiles), column axis iterating fastest,
outputs indexed by row tile only — the accumulator blocks stay resident in
VMEM across the column sweep (flash-attention style online rescaling), and
each step holds just one (BL, C) x (BS, C) tile pair, so VMEM use is
constant in L, S and batch (the bs>1 path vmaps into the grid).

- `_stats_kernel`: online max/sum of exp per row. Called twice (once
  transposed) for row and column stats.
- `_argmax_kernel`: recomputes sim tiles and maximizes conf IN THE LOG
  DOMAIN: log conf_ij = 2*s_ij - rowterm_i - colterm_j with
  rowterm = rmax + log rsum (resp. colterm) — the row term is constant per
  row, so the sweep is a biased-sim max/argmax with NO transcendentals
  (the winner's conf value is exponentiated once outside). Called twice
  for the mutual check.

Cost: 4 MXU sweeps of L*S*C MACs, zero conf-matrix HBM traffic, exp only
in the two stats sweeps. Interpret mode keeps CPU tests exact.
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


def _stats_kernel(f0_ref, f1_ref, inv_t_ref, mask1_ref, max_ref, sum_ref):
    """Grid (i, j): f0 block (BL, C), f1 block (BS, C), mask (1, BS);
    accumulates max/sum (BL, 1) across the j sweep."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        max_ref[:] = jnp.full_like(max_ref, NEG)
        sum_ref[:] = jnp.zeros_like(sum_ref)

    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * inv_t_ref[0]
    sim = jnp.where(mask1_ref[:] > 0, sim, NEG)   # (BL, BS) via (1, BS)
    tile_max = jnp.max(sim, axis=1, keepdims=True)
    m_old = max_ref[:]
    m_new = jnp.maximum(m_old, tile_max)
    sum_ref[:] = (sum_ref[:] * jnp.exp(m_old - m_new)
                  + jnp.sum(jnp.exp(sim - m_new), axis=1, keepdims=True))
    max_ref[:] = m_new


def _argmax_kernel(f0_ref, f1_ref, inv_t_ref, mask1_ref, colterm_ref,
                   best_ref, val_ref, *, block_s: int):
    """Grid (i, j): per-row max/argmax of (2*sim - colterm_j) — the
    log-domain conf up to the row-constant term. No transcendentals."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        best_ref[:] = jnp.zeros_like(best_ref)
        val_ref[:] = jnp.full_like(val_ref, NEG)

    sim = jnp.dot(f0_ref[:], f1_ref[:].T,
                  preferred_element_type=jnp.float32) * inv_t_ref[0]
    biased = 2.0 * sim - colterm_ref[:]
    biased = jnp.where(mask1_ref[:] > 0, biased, NEG)
    tile_v = jnp.max(biased, axis=1, keepdims=True)
    tile_j = (jnp.argmax(biased, axis=1).astype(jnp.int32)[:, None]
              + j * block_s)
    upd = tile_v > val_ref[:]
    val_ref[:] = jnp.where(upd, tile_v, val_ref[:])
    best_ref[:] = jnp.where(upd, tile_j, best_ref[:])


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, static_argnames=("block_l", "block_s"))
def _stats(f0, f1, inv_t, mask1, block_l=256, block_s=256):
    L, C = f0.shape
    S = f1.shape[0]
    grid = (L // block_l, S // block_s)
    return pl.pallas_call(
        _stats_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_l, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_l, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((L, 1), jnp.float32),
                   jax.ShapeDtypeStruct((L, 1), jnp.float32)],
        interpret=_interpret(),
    )(f0, f1, inv_t, mask1)


@functools.partial(jax.jit, static_argnames=("block_l", "block_s"))
def _argmax(f0, f1, inv_t, mask1, colterm_row, block_l=256, block_s=256):
    """colterm_row: (1, S) = cmax + log(csum) per column (0 where masked)."""
    L, C = f0.shape
    S = f1.shape[0]
    grid = (L // block_l, S // block_s)
    return pl.pallas_call(
        functools.partial(_argmax_kernel, block_s=block_s),
        grid=grid,
        in_specs=[
            pl.BlockSpec((block_l, C), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_s, C), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_s), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((block_l, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_l, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct((L, 1), jnp.int32),
                   jax.ShapeDtypeStruct((L, 1), jnp.float32)],
        interpret=_interpret(),
    )(f0, f1, inv_t, mask1, colterm_row)


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
    # keep the caller's dtype for the MXU sweeps (bf16 halves both FLOP
    # time and VMEM traffic; accumulation is f32 via preferred_element_type)
    f0p = jnp.pad(f0, ((0, Lp - L), (0, 0)))
    f1p = jnp.pad(f1, ((0, Sp - S), (0, 0)))
    m0 = (jnp.ones(L, jnp.float32) if mask0 is None
          else mask0.astype(jnp.float32))
    m1 = (jnp.ones(S, jnp.float32) if mask1 is None
          else mask1.astype(jnp.float32))
    m0p = jnp.pad(m0, (0, Lp - L))[None]        # (1, Lp)
    m1p = jnp.pad(m1, (0, Sp - S))[None]        # (1, Sp)
    inv_t = jnp.array([1.0 / temperature], jnp.float32)

    rmax, rsum = _stats(f0p, f1p, inv_t, m1p, block, block)
    cmax, csum = _stats(f1p, f0p, inv_t, m0p, block, block)
    # log-domain terms; masked slots get 0 (their sim is NEG in the sweep)
    rowterm = jnp.where(m0p.T > 0, rmax + jnp.log(rsum), 0.0)   # (Lp, 1)
    colterm = jnp.where(m1p.T > 0, cmax + jnp.log(csum), 0.0)   # (Sp, 1)
    jbest, vbest = _argmax(f0p, f1p, inv_t, m1p, colterm.T, block, block)
    ibest, _ = _argmax(f1p, f0p, inv_t, m0p, rowterm.T, block, block)

    jbest = jbest[:L, 0]
    # conf of the winner: exp once, outside the sweeps
    conf_r = jnp.exp(vbest[:L, 0] - rowterm[:L, 0])
    ibest = ibest[:S, 0]
    mutual = jnp.take(ibest, jnp.clip(jbest, 0, S - 1)) == jnp.arange(L)
    valid_rows = (m0 > 0) if mask0 is not None else jnp.ones(L, bool)
    return jbest, jnp.where(valid_rows, conf_r, 0.0), mutual & valid_rows
