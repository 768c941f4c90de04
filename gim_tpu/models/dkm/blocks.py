"""DKM building blocks, NHWC/TPU-native.

Parity targets in ref networks/dkm/models/dkm.py:
- ConvRefiner (:11-123) depthwise conv stacks + displacement embedding,
- CosKernel (:126-144), CAB (:147-170), RRB (:173-202), DFN (:205-254),
- GP (:257-370) cosine-kernel Gaussian process regression with fourier
  position basis — the K_yy^-1 is a batched symmetric solve (Cholesky via
  jnp.linalg.solve at fp32, SURVEY §7 hard part (c)) instead of
  torch.linalg.inv,
- local_correlation (ref networks/dkm/utils/local_correlation.py:5-41)
  computed in K^2 chunks so the (B, H, W, K^2, C) window tensor is never
  materialized at once,
- kde (ref networks/dkm/utils/kde.py:17-24).

Flow convention matches the reference: normalized [-1, 1] xy coords of the
match target, stored NHWC as (B, H, W, 2).
"""

from __future__ import annotations

import functools
import math
import os

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.ops.sampling import grid_sample
from gim_tpu.utils import highp


def coords_grid(b: int, h: int, w: int) -> jax.Array:
    """(b, h, w, 2) normalized pixel-center xy grid (torch linspace
    convention -1+1/h .. 1-1/h)."""
    ys = jnp.linspace(-1 + 1 / h, 1 - 1 / h, h)
    xs = jnp.linspace(-1 + 1 / w, 1 - 1 / w, w)
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    g = jnp.stack([gx, gy], axis=-1)
    return jnp.broadcast_to(g[None], (b, h, w, 2))


def resize_nhwc(x: jax.Array, h: int, w: int) -> jax.Array:
    """Bilinear resize, half-pixel centers (torch align_corners=False).

    antialias=False is load-bearing: torch F.interpolate never antialiases
    (the reference's every resize, e.g. dkm.py:670), while jax.image.resize
    defaults to an antialiased (PIL-style) kernel on downsampling."""
    B, _, _, C = x.shape
    return jax.image.resize(x, (B, h, w, C), method="bilinear",
                            antialias=False)


def resize_region_nhwc(x: jax.Array, h: int, w: int,
                       extent01: jax.Array) -> jax.Array:
    """Bilinear-resize the top-left sub-region of each canvas to (h, w).

    x: (B, H, W, C); extent01: (B, 2) per-image (w_frac, h_frac) — the
    fraction of the canvas holding real content (rest is pad). Equivalent
    to cropping the valid rectangle and F.interpolate-ing it to (h, w)
    with align_corners=False — the reference eval's aspect-distorting
    resize (ref networks/dkm/models/dkm.py:668-671) — but with static
    shapes. With extent01 == 1 this matches resize_nhwc.
    """
    B, H, W, _ = x.shape
    # output pixel centers in source-canvas pixel space, per image
    ys = (jnp.arange(h) + 0.5) / h           # (h,) in (0,1) of the region
    xs = (jnp.arange(w) + 0.5) / w
    src_y = ys[None, :] * (extent01[:, 1:2] * H) - 0.5       # (B, h)
    src_x = xs[None, :] * (extent01[:, 0:1] * W) - 0.5       # (B, w)
    # to grid_sample align_corners=False normalized coords
    ny = (2.0 * src_y + 1.0) / H - 1.0
    nx = (2.0 * src_x + 1.0) / W - 1.0
    coords = jnp.stack([
        jnp.broadcast_to(nx[:, None, :], (B, h, w)),
        jnp.broadcast_to(ny[:, :, None], (B, h, w)),
    ], axis=-1)
    return sample_nhwc(x, coords, padding_mode="border")


def sample_nhwc(img: jax.Array, coords: jax.Array,
                padding_mode: str = "zeros") -> jax.Array:
    """grid_sample NHWC: img (B, H, W, C), coords (B, ..., 2) in [-1, 1]
    -> (B, ..., C). align_corners=False (reference convention)."""
    B, H, W, C = img.shape
    lead = coords.shape[1:-1]
    pts = coords.reshape(B, -1, 2)
    chw = jnp.transpose(img, (0, 3, 1, 2))
    out = grid_sample(chw, pts, align_corners=False,
                      padding_mode=padding_mode)      # (B, C, P)
    return jnp.transpose(out, (0, 2, 1)).reshape(B, *lead, C)


def sample_nhwc_packed(img: jax.Array, coords: jax.Array) -> jax.Array:
    """Bilinear sample via ONE row gather on a 4C corner-packed layout.

    grid_sample costs 4 row gathers (one per bilinear corner); for the
    narrow-channel maps the refiners warp (x_hat at scales 1-2: C=3/64,
    i.e. 6-128 B rows vs the 256 B TPU lane tile) the gather is per-ROW
    bound, not byte bound — so pre-pack the 4 corners of every pixel into
    one 4C row (pack[h, w] = imgp[h..h+1, w..w+1] over a zero-padded
    canvas) and gather once at (floor(y)+1, floor(x)+1). Same bytes
    moved, 4x fewer gather rows. padding_mode='zeros' semantics,
    bit-identical to sample_nhwc (tests/test_dkm.py)."""
    B, H, W, C = img.shape
    lead = coords.shape[1:-1]
    pts = coords.reshape(B, -1, 2)
    x = (pts[..., 0].astype(jnp.float32) + 1.0) * (0.5 * W) - 0.5
    y = (pts[..., 1].astype(jnp.float32) + 1.0) * (0.5 * H) - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0)[..., None].astype(img.dtype)
    fy = (y - y0)[..., None].astype(img.dtype)
    imgp = jnp.pad(img, ((0, 0), (1, 1), (1, 1), (0, 0)))
    pack = jnp.concatenate([
        imgp[:, :-1, :-1, :], imgp[:, :-1, 1:, :],
        imgp[:, 1:, :-1, :], imgp[:, 1:, 1:, :]], axis=-1)
    rows = pack.reshape(B, (H + 1) * (W + 1), 4 * C)
    iy = jnp.clip(y0.astype(jnp.int32) + 1, 0, H)
    ix = jnp.clip(x0.astype(jnp.int32) + 1, 0, W)
    v = jnp.take_along_axis(rows, (iy * (W + 1) + ix)[..., None], axis=1)
    v00, v01, v10, v11 = jnp.split(v, 4, axis=-1)
    out = ((1 - fy) * (1 - fx) * v00 + (1 - fy) * fx * v01
           + fy * (1 - fx) * v10 + fy * fx * v11)
    # clipping corrupts rows only when ALL corners are out of bounds
    # (|y0| or |x0| fully outside) — exactly the zeros-mode zero cases
    ok = ((y > -1.0) & (y < float(H)) & (x > -1.0) & (x < float(W)))
    out = out * ok[..., None].astype(out.dtype)
    return out.reshape(B, *lead, C)


@functools.lru_cache(maxsize=None)
def _corner_selectors(K: int):
    """4 constant (Kp^2, K^2) 0/1 matrices picking each bilinear corner of
    every window offset out of the integer-corner correlation grid
    (Kp = K + 1). Numpy so lazy construction can't leak tracers."""
    Kp = K + 1
    sels = np.zeros((4, Kp * Kp, K * K), np.float32)
    for dy in range(K):
        for dx in range(K):
            for c, (cy, cx) in enumerate(((0, 0), (0, 1), (1, 0), (1, 1))):
                sels[c, (dy + cy) * Kp + (dx + cx), dy * K + dx] = 1.0
    return tuple(sels)


def local_correlation(x: jax.Array, y: jax.Array, radius: int,
                      flow: jax.Array | None = None,
                      chunk: int | None = None,
                      mem_budget_bytes: int = 300_000_000,
                      packed_rows: bool | None = None) -> jax.Array:
    """(2r+1)^2 window correlation (ref local_correlation.py:5-41).

    x, y: (B, H, W, C); flow: (B, H, W, 2) normalized sample centers in y
    (identity grid if None). Returns (B, H, W, (2r+1)^2) in the reference's
    (dy-major) window order.

    The reference grid_samples (2r+1)^2 bilinear window points per pixel.
    But the window offsets are EXACT 1-px steps (linspace(-2r/H, 2r/H, 2r+1)
    is 2/H-normalized = 1 px under align_corners=False), so every sample in
    a window shares one fractional part — and correlation is linear in the
    sampled feature: <x, lerp(y)> == lerp(<x, y>). So correlate against the
    (2r+2)^2 integer-corner positions once (ONE row-gather per corner
    instead of grid_sample's 4), then bilinearly blend the scalar
    correlation maps. Out-of-bounds corners are zeroed (grid_sample
    padding_mode='zeros'). Corner chunks are lax.map-serialized so the
    (B, H, W, chunk, C) gather stays under `mem_budget_bytes` (unbounded
    chunks OOM at DKM's 1152x1536 upsample pass).
    """
    B, H, W, C = x.shape
    r = radius
    K = 2 * r + 1
    Kp = K + 1
    if chunk is None:
        # sized as if f32 regardless of dtype: measured on DKM full-res,
        # LARGER chunks are slower (0.71 -> 0.77-0.84 s/pair) — small
        # per-offset gather+reduce steps pipeline better on this chip
        per_offset = B * H * W * C * 4
        chunk = max(1, min(Kp * Kp, mem_budget_bytes // max(per_offset, 1)))
    if flow is None:
        flow = coords_grid(B, H, W)

    # pixel centers, align_corners=False: p = (f + 1) * S/2 - 0.5
    px = (flow[..., 0].astype(jnp.float32) + 1.0) * (0.5 * W) - 0.5
    py = (flow[..., 1].astype(jnp.float32) + 1.0) * (0.5 * H) - 0.5
    ix0 = jnp.floor(px)
    iy0 = jnp.floor(py)
    fx = (px - ix0)[..., None]                           # (B, H, W, 1)
    fy = (py - iy0)[..., None]
    ix0 = ix0.astype(jnp.int32)
    iy0 = iy0.astype(jnp.int32)

    doy, dox = jnp.meshgrid(jnp.arange(-r, r + 2), jnp.arange(-r, r + 2),
                            indexing="ij")
    doffs = jnp.stack([doy.reshape(-1), dox.reshape(-1)], -1)  # (Kp^2, 2)

    scale = 1.0 / math.sqrt(C)
    # NOTE (measured, docs/PERF.md): a "wide-slice" variant gathering one
    # contiguous (Kp*C) slice per (pixel, dy) via lax.gather with
    # slice_sizes=(1, 1, Kp*C) lowers ~9x SLOWER end to end (6.4 vs 0.72
    # s/pair DKM full-res) — XLA serializes per start. Per-corner
    # take_along_axis row gathers in small lax.map chunks remain the
    # fastest known form on this hardware, except the packed-row form
    # below (same row-count reduction as the wide slice, but expressed as
    # take_along_axis over a shift-packed channel layout so it keeps the
    # fast gather lowering).
    # Default ON for inference (measured round 4, v5e, full model @ true
    # eval shapes: DKM 600.0 -> 547.3 ms/pair, RoMa 870.4 -> 847.5 —
    # docs/PERF.md). OFF under differentiation: the Kp-wide channel-packed
    # temps balloon the train-step HBM peak (round-4 learned-loop OOM at
    # 640px bs1: 600M+ padded HLO temps per refiner hidden block,
    # /tmp/loop_gim_dkm.log) — callers on a grad path (ConvRefiner with
    # train=True) pass packed_rows=False explicitly.
    if packed_rows is None:
        packed_rows = os.environ.get("GIM_TPU_PACKED_CORR_ROWS", "1") == "1"
    if packed_rows:
        # ONE gather row per (pixel, dy): the Kp window corners of a row
        # are contiguous (Kp*C) in row-major yflat, so pre-pack Kp
        # shifted copies of yflat on the channel axis (pack[i] =
        # ypadf[i..i+Kp-1] rows) and gather at the window's row base.
        # Kp x fewer gather rows for identical gathered bytes; the pack
        # build is Kp contiguous slice copies (full-bandwidth HBM).
        ii_all = iy0[..., None] + jnp.arange(-r, r + 2)        # (B,H,W,Kp)
        jj_all = ix0[..., None] + jnp.arange(-r, r + 2)
        vy = (ii_all >= 0) & (ii_all < H)
        vx = (jj_all >= 0) & (jj_all < W)
        valid = vy[..., :, None] & vx[..., None, :]            # (B,H,W,Kp,Kp)
        b_c = jnp.clip(ix0 - r, -Kp, W - 1)
        ypadf = jnp.pad(y.reshape(B, H * W, C),
                        ((0, 0), (Kp, Kp), (0, 0)))
        pack = jnp.concatenate(
            [ypadf[:, j:j + H * W + Kp, :] for j in range(Kp)], axis=-1)

        dys = jnp.arange(-r, r + 2)
        cdy = max(1, min(Kp, chunk // Kp)) if chunk else 1
        ndy = -(-Kp // cdy)
        dys = jnp.pad(dys, (0, ndy * cdy - Kp)).reshape(ndy, cdy)

        def one_dy_chunk(dy):                                  # (cdy,) int
            row = jnp.clip(iy0[..., None] + dy[None, None, None, :],
                           0, H - 1)                           # (B,H,W,cdy)
            base = row * W + b_c[..., None]
            base = jnp.clip(base, -Kp, H * W - 1) + Kp
            v = jnp.take_along_axis(
                pack.reshape(B, H * W + Kp, Kp * C),
                base.reshape(B, -1)[..., None], axis=1
            ).reshape(B, H, W, -1, Kp, C)                      # (B,H,W,cdy,Kp,C)
            return jnp.einsum("bhwc,bhwdjc->bhwdj", x, v) * scale

        ic = jax.lax.map(one_dy_chunk, dys)                    # (ndy,B,H,W,cdy,Kp)
        ic = jnp.moveaxis(ic, 0, -3).reshape(B, H, W, ndy * cdy, Kp)
        ic = ic[..., :Kp, :]
        ic = jnp.where(valid, ic, jnp.zeros((), ic.dtype))
        ic = ic.reshape(B, H, W, Kp * Kp)
        return _blend_corners(ic, fx, fy, K)
    nc = -(-(Kp * Kp) // chunk)
    pad = nc * chunk - Kp * Kp
    offs = jnp.pad(doffs, ((0, pad), (0, 0))).reshape(nc, chunk, 2)
    yflat = y.reshape(B, H * W, C)

    def one_chunk(off):                                  # (chunk, 2) int
        ii = iy0[..., None] + off[None, None, None, :, 0]
        jj = ix0[..., None] + off[None, None, None, :, 1]
        valid = (ii >= 0) & (ii < H) & (jj >= 0) & (jj < W)
        idx = jnp.clip(ii, 0, H - 1) * W + jnp.clip(jj, 0, W - 1)
        # batched row gather via take_along_axis — vmap(jnp.take)
        # scalarizes on TPU (measured 770x slower at this shape)
        feats = jnp.take_along_axis(
            yflat, idx.reshape(B, -1)[..., None], axis=1
        ).reshape(B, H, W, -1, C)
        # (a broadcast-multiply-reduce form of this contraction measured
        # identical end to end — XLA already handles the gather+dot here)
        ic = jnp.einsum("bhwc,bhwkc->bhwk", x, feats) * scale
        return jnp.where(valid, ic, jnp.zeros((), ic.dtype))

    ic = jax.lax.map(one_chunk, offs)                    # (nc, B, H, W, k)
    ic = jnp.moveaxis(ic, 0, -2).reshape(B, H, W, nc * chunk)[..., :Kp * Kp]
    return _blend_corners(ic, fx, fy, K)


def _blend_corners(ic: jax.Array, fx: jax.Array, fy: jax.Array,
                   K: int) -> jax.Array:
    """Bilinear-blend the (.., (K+1)^2) integer-corner correlation maps
    into the (.., K^2) window correlations.

    Blends on the FLAT (.., Kp^2) layout via constant 0/1 selection
    matmuls — a (.., Kp, Kp) view would put a <=16-wide dim on the
    128-lane axis (measured 1.7x slower end to end on DKM full-res)."""
    sel = _corner_selectors(K)
    fx = fx.astype(ic.dtype)
    fy = fy.astype(ic.dtype)

    def pick(c):
        # HIGHEST: pure data movement through a 0/1 matrix — default TPU
        # matmul precision would truncate f32 correlations to bf16
        return jnp.einsum("bhwk,kl->bhwl", ic,
                          jnp.asarray(sel[c], ic.dtype),
                          precision=jax.lax.Precision.HIGHEST)

    return ((1 - fy) * (1 - fx)) * pick(0) + ((1 - fy) * fx) * pick(1) \
        + (fy * (1 - fx)) * pick(2) + (fy * fx) * pick(3)


def kde_density(x: jax.Array, std: float = 0.1, chunk: int = 4096) -> jax.Array:
    """Gaussian KDE over row vectors (ref utils/kde.py:17-24). x: (N, D)."""
    n = x.shape[0]
    inv = 1.0 / (2 * std * std)
    sq = jnp.sum(x * x, axis=-1)

    def block(i):
        xs = jax.lax.dynamic_slice_in_dim(x, i, chunk, 0)
        ss = jax.lax.dynamic_slice_in_dim(sq, i, chunk, 0)
        d2 = ss[:, None] + sq[None, :] - 2.0 * (xs @ x.T)
        return jnp.exp(-jnp.maximum(d2, 0.0) * inv).sum(-1)

    nblocks = -(-n // chunk)
    pads = nblocks * chunk - n
    xp = jnp.pad(x, ((0, pads), (0, 0)))
    sqp = jnp.pad(sq, (0, pads))

    def blockp(i):
        xs = jax.lax.dynamic_slice_in_dim(xp, i * chunk, chunk, 0)
        ss = jax.lax.dynamic_slice_in_dim(sqp, i * chunk, chunk, 0)
        d2 = ss[:, None] + sq[None, :] - 2.0 * (xs @ x.T)
        return jnp.exp(-jnp.maximum(d2, 0.0) * inv).sum(-1)

    out = jax.lax.map(blockp, jnp.arange(nblocks)).reshape(-1)
    return out[:n]


class CosKernel:
    """exp((cos_sim - 1) / T) (ref dkm.py:126-144, learn_temperature off)."""

    def __init__(self, T: float = 0.2):
        self.T = T

    @highp
    def __call__(self, x, y, eps=1e-6):
        # norms via sqrt(sumsq + tiny): jnp.linalg.norm's VJP is NaN at an
        # exact-zero feature vector (see ops/sampling.safe_l2_normalize);
        # forward matches the reference's (|x||y| + eps) denominator to
        # ~1e-24 absolute under the sqrt
        nx = jnp.sqrt(jnp.sum(jnp.square(x), axis=-1) + 1e-24)
        ny = jnp.sqrt(jnp.sum(jnp.square(y), axis=-1) + 1e-24)
        c = jnp.einsum("bnd,bmd->bnm", x, y) / (
            nx[..., None] * ny[:, None] + eps)
        return jnp.exp((c - 1.0) / self.T)


def _sym_solve(A: jax.Array, b: jax.Array) -> jax.Array:
    """Solve A x = b for symmetric positive-definite A (f32).

    A = K + sigma*I with K = exp((cos_sim - 1)/T): the exponential of a
    PSD kernel is PSD (power series with non-negative coefficients), so A
    is SPD and a Cholesky solve is valid. GIM_TPU_GP_CHOLESKY=1 uses
    cholesky + two triangular solves (~half the factorization FLOPs of
    the default LU `jnp.linalg.solve`, and no pivoting — pivoting is the
    sequential part that hurts on TPU).

    Default stays LU: on the current axon runtime the cholesky path
    COMPILES but its first execute HANGS indefinitely (chip evidence
    2026-08-20: DKM full graph cached 11:23, process futex-stuck >20min;
    same signature killed a roma dec_c arm). Numerics are CPU-verified
    (tests/test_dkm.py::test_gp_cholesky_solve_matches_lu); re-A/B when
    the runtime's linalg custom-calls are fixed."""
    if os.environ.get("GIM_TPU_GP_CHOLESKY", "0") == "1":
        L = jnp.linalg.cholesky(A)
        z = jax.lax.linalg.triangular_solve(
            L, b, left_side=True, lower=True, transpose_a=False)
        return jax.lax.linalg.triangular_solve(
            L, z, left_side=True, lower=True, transpose_a=True)
    cg = int(os.environ.get("GIM_TPU_GP_CG", "0"))
    if cg:
        # batched conjugate gradients: GIM_TPU_GP_CG=<iters>. Trades the
        # LU factorization's sequential panel updates for cg matvecs
        # (B, n, n) @ (B, n, d) — pure MXU work. Each rhs column gets its
        # own alpha/beta (vectorized scalar recurrences). A is SPD with
        # unit-ish diagonal (kernel diag 1 + sigma), so plain CG with a
        # fixed iteration count is shape-static and jit-friendly.
        def matvec(X):
            return jnp.einsum("bij,bjd->bid", A, X)

        X = jnp.zeros_like(b)
        R = b - matvec(X)                      # = b at X=0
        P = R
        rs = jnp.sum(R * R, axis=1, keepdims=True)          # (B, 1, d)

        def step(_, carry):
            X, R, P, rs = carry
            AP = matvec(P)
            denom = jnp.sum(P * AP, axis=1, keepdims=True)
            alpha = rs / jnp.maximum(denom, 1e-30)
            X = X + alpha * P
            R = R - alpha * AP
            rs_new = jnp.sum(R * R, axis=1, keepdims=True)
            beta = rs_new / jnp.maximum(rs, 1e-30)
            P = R + beta * P
            return X, R, P, rs_new

        X, _, _, _ = jax.lax.fori_loop(0, cg, step, (X, R, P, rs))
        return X
    return jnp.linalg.solve(A, b)


class GP(nn.Module):
    """Cosine-kernel GP regression of fourier position embeddings
    (ref dkm.py:257-370, no_cov=True, basis='fourier')."""

    gp_dim: int = 256
    T: float = 0.2
    sigma_noise: float = 0.1
    # Reference BUG compatibility (ref dkm.py:355-359): for n > 2000 the
    # reference inverts K_yy in a per-row python loop whose sigma_noise
    # slice `sigma_noise[k:k+1]` is EMPTY for k >= 1 (sigma_noise has
    # batch dim 1), so torch broadcasts to an empty tensor, the cat
    # yields ONLY row 0's inverse, and the downstream matmul broadcasts
    # row 0's K_yy^-1 to EVERY batch row. At the ZEB eval geometry
    # (660x880 -> scale-16 n=2310) this poisons the symmetric B->A
    # direction with the A->B row's inverse — the published GIM-DKM
    # numbers include this behavior, so eval graphs replicate it
    # (bug_compat=True); training uses the correct batched solve
    # (diagnosed round 5: tools/diag_dkm_bisect.py — our correct math
    # diverged from torch by up to 1.02 in the B->A half).
    bug_compat: bool = False
    bug_compat_min_n: int = 2000

    @nn.compact
    def __call__(self, x: jax.Array, y: jax.Array) -> jax.Array:
        """x, y: (B, H, W, C) projected features. Returns (B, H, W, gp_dim)."""
        # GP solve is geometry-bearing: always f32 (SURVEY §7 hard part (c))
        x = x.astype(jnp.float32)
        y = y.astype(jnp.float32)
        B, H, W, C = y.shape
        pos_conv = nn.Conv(self.gp_dim, (1, 1), name="pos_conv")
        coords = coords_grid(B, H, W)
        f = jnp.cos(8 * math.pi * pos_conv(coords))      # fourier basis

        K = CosKernel(self.T)
        xf = x.reshape(B, -1, C)
        yf = y.reshape(B, -1, C)
        ff = f.reshape(B, -1, self.gp_dim)
        K_xy = K(xf, yf)
        K_yy = K(yf, yf)
        n = K_yy.shape[-1]
        if self.bug_compat and n > self.bug_compat_min_n and B > 1:
            # replicate the reference's empty-slice loop (see class note):
            # every row reads row 0's inverse. ff rows are identical (the
            # position encoding of the shared grid), so solving row 0
            # then broadcasting is exactly torch's buggy result.
            A = K_yy[:1] + self.sigma_noise * jnp.eye(n)[None]
            with jax.default_matmul_precision("highest"):
                K_yy_inv_f = _sym_solve(A, ff[:1])        # (1, n, d)
                mu = K_xy @ K_yy_inv_f                    # bcast to (B,.,d)
        else:
            A = K_yy + self.sigma_noise * jnp.eye(n)[None]
            with jax.default_matmul_precision("highest"):
                K_yy_inv_f = _sym_solve(A, ff)
                mu = K_xy @ K_yy_inv_f                    # (B, HW, gp_dim)
        return mu.reshape(B, x.shape[1], x.shape[2], self.gp_dim)


class RRB(nn.Module):
    """Refinement residual block (ref dkm.py:173-202)."""

    out_dim: int
    train: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        dt = self.dtype
        x = nn.Conv(self.out_dim, (1, 1), dtype=dt, name="conv1")(x)
        res = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=dt,
                      name="conv2")(x)
        res = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                           epsilon=1e-5, dtype=dt, name="bn")(res)
        res = nn.relu(res)
        res = nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=dt,
                      name="conv3")(res)
        return nn.relu(x + res)


class CAB(nn.Module):
    """Channel attention block over [high, low] pair (ref dkm.py:147-170)."""

    out_dim: int
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x1, x2):
        x = jnp.concatenate([x1, x2], axis=-1)
        g = jnp.mean(x, axis=(1, 2), keepdims=True)
        g = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv1")(g)
        g = nn.relu(g)
        g = nn.Conv(self.out_dim, (1, 1), dtype=self.dtype, name="conv2")(g)
        g = jax.nn.sigmoid(g)
        return g * x2 + x1


class DFNScale(nn.Module):
    """One scale of the DFN embedding decoder (ref dkm.py:205-254 +
    DKMv3.py:9-47 wiring): feat 1x1 proj -> concat(gp) -> RRB_d ->
    CAB(context) -> RRB_u -> 3ch terminal (1 certainty + 2 coord)."""

    feat_dim: int = 256
    internal_dim: int = 384
    train: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, embeddings, feats, context):
        dt = self.dtype
        feats = nn.Conv(self.feat_dim, (1, 1), dtype=dt,
                        name="feat_input")(feats)
        emb = jnp.concatenate([feats, embeddings.astype(feats.dtype)],
                              axis=-1)
        emb = RRB(self.internal_dim, self.train, dt, name="rrb_d")(emb)
        context = CAB(self.internal_dim, dt, name="cab")(
            context.astype(emb.dtype), emb)
        context = RRB(self.internal_dim, self.train, dt,
                      name="rrb_u")(context)
        preds = nn.Conv(3, (1, 1), dtype=dt, name="terminal")(context)
        # flow/certainty leave in f32 (geometry-bearing quantities)
        preds = preds.astype(jnp.float32)
        pred_coord = preds[..., -2:]
        pred_certainty = preds[..., :-2]
        return pred_coord, pred_certainty, context


class ConvRefiner(nn.Module):
    """Depthwise conv refiner (ref dkm.py:11-123; RoMa variant
    ref roma.py:436-580 adds emb scaling 40/32*scale_factor, optional
    logits concat, and puts displacement before certainty in out_conv)."""

    in_dim: int
    hidden_dim: int
    dw: bool = True
    kernel_size: int = 5
    hidden_blocks: int = 8
    displacement_emb_dim: int = 0
    local_corr_radius: int | None = None
    corr_in_other: bool = True
    train: bool = False
    disp_first: bool = False     # RoMa: out = [dx, dy, cert]; DKM: [cert, dx, dy]
    concat_logits: bool = False
    dtype: str = "float32"

    def block(self, x, out_dim, name):
        groups = x.shape[-1] if self.dw else 1
        k = self.kernel_size
        conv1 = nn.Conv(out_dim, (k, k), padding="SAME", dtype=self.dtype,
                        feature_group_count=groups, name=f"{name}_conv1")
        bn = nn.BatchNorm(use_running_average=not self.train, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name=f"{name}_bn")
        conv2 = nn.Conv(out_dim, (1, 1), dtype=self.dtype,
                        name=f"{name}_conv2")
        return conv2(nn.relu(bn(conv1(x))))

    def _fuse_hidden_blocks(self, H: int, W: int) -> bool:
        """Fused single-pass Pallas blocks for the narrow-channel scales:
        NHWC convs at C<=192 waste most of the 128-lane tile (see
        ops/pallas_kernels/refiner.py). Inference only (BN running
        stats); pure-depthwise hidden blocks only. Shape-gated: the
        kernel's scoped-VMEM need (dominated by the K*K unrolled slice
        temps — measured, not assumed; see refiner.vmem_estimate) must
        fit the chip budget (GIM_TPU_REFINER_VMEM_BUDGET_MB, default 100
        for v5e-class 128M VMEM) or the XLA path is used."""
        import os

        from gim_tpu.ops.pallas_kernels.dsmax import _interpret
        from gim_tpu.ops.pallas_kernels.refiner import vmem_estimate

        # Default OFF: measured on a real v5e (round 4, /tmp/repro2.py
        # methodology in docs/PERF.md) the fused kernel LOSES to XLA's
        # conv path at both target shapes — C=144 336^2: 5.9 vs 3.6
        # ms/block; C=24 1344^2: 9.8 vs 9.4. Kept behind the flag for
        # future kernel work; parity tests exercise it in force mode.
        flag = os.environ.get("GIM_TPU_FUSED_REFINER", "0")
        # off-TPU the kernel would run interpreted (orders of magnitude
        # slower than XLA CPU convs) — require the compiled path unless
        # explicitly forced (tests force it on small shapes)
        if not (self.dw and not self.train and self.hidden_dim <= 192
                and (flag == "force"
                     or (flag == "1" and not _interpret()))):
            return False
        budget = int(os.environ.get("GIM_TPU_REFINER_VMEM_BUDGET_MB",
                                    "100")) * 1024 * 1024
        bh = 16 if self.hidden_dim <= 64 else 8
        need = vmem_estimate(self.hidden_dim, self.hidden_dim, H, W,
                             self.kernel_size, bh, 2)
        return int(1.25 * need) <= budget

    def _block_fused_chan(self, xc, out_dim, name):
        """The same block math on channel-leading (B, C, H, W) input via
        the fused kernel. Materializes the identical flax param tree via
        a dummy NHWC call (DCE'd by XLA), so checkpoints are unaffected."""
        from gim_tpu.ops.pallas_kernels.refiner import (fold_block_params,
                                                        fused_dw_block)

        k = self.kernel_size
        conv1 = nn.Conv(out_dim, (k, k), padding="SAME", dtype=self.dtype,
                        feature_group_count=out_dim, name=f"{name}_conv1")
        bn = nn.BatchNorm(use_running_average=True, momentum=0.9,
                          epsilon=1e-5, dtype=self.dtype, name=f"{name}_bn")
        conv2 = nn.Conv(out_dim, (1, 1), dtype=self.dtype,
                        name=f"{name}_conv2")
        dummy = jnp.zeros((1, k, k, out_dim), xc.dtype)
        _ = conv2(nn.relu(bn(conv1(dummy))))
        params = self.variables["params"]
        stats = self.variables["batch_stats"]
        wdw, bdw, w1, b1 = fold_block_params(
            params[f"{name}_conv1"], params[f"{name}_bn"],
            stats[f"{name}_bn"], params[f"{name}_conv2"])
        bh = 16 if out_dim <= 64 else 8
        return fused_dw_block(xc, wdw.astype(xc.dtype),
                              bdw.astype(xc.dtype), w1.astype(xc.dtype),
                              b1.astype(xc.dtype), block_h=bh)

    @nn.compact
    def __call__(self, x, y, flow, logits=None, emb_scale: float = 1.0):
        """x, y: (B, H, W, C); flow: (B, H, W, 2). emb_scale: RoMa passes
        40/32 * scale_factor (ref roma.py:548-550). Returns (certainty
        (B,H,W,1), displacement (B,H,W,2))."""
        # cast BEFORE sampling/correlating: the gathers are the refiner's
        # dominant cost (ablation: x_hat ~205 ms + local corr ~222 ms of
        # DKM full-res's 717 ms) and halve in bf16; scale 1's "features"
        # are the raw f32 images otherwise
        x = x.astype(self.dtype)
        y = y.astype(self.dtype)
        flow = flow.astype(jnp.float32)
        B, H, W, C = x.shape
        # packed single-gather warp where rows are narrower than ~2 lane
        # tiles (scales 1-2, the big-resolution passes where x_hat cost
        # concentrates); wide-channel scales keep the 4-gather form
        # (packing there quadruples a >=1 KB row for no row-count win)
        import os
        packed = (4 * C <= 256
                  and os.environ.get("GIM_TPU_PACKED_WARP", "1") == "1")
        if packed:
            x_hat = jax.lax.stop_gradient(sample_nhwc_packed(y, flow))
        else:
            x_hat = jax.lax.stop_gradient(sample_nhwc(y, flow))
        parts = [x, x_hat]
        if self.displacement_emb_dim:
            disp = flow - coords_grid(B, H, W)
            emb = nn.Conv(self.displacement_emb_dim, (1, 1),
                          name="disp_emb")(emb_scale * disp)
            parts = [x, x_hat, emb]
            if self.local_corr_radius:
                # packed_rows=False on the train path: the packed layout's
                # gradient blows the HBM peak (see local_correlation note)
                pk = False if self.train else None
                if self.corr_in_other:
                    corr = local_correlation(x, y, self.local_corr_radius,
                                             flow=flow, packed_rows=pk)
                else:
                    corr = local_correlation(x, x_hat,
                                             self.local_corr_radius,
                                             packed_rows=pk)
                parts = [x, x_hat, emb, corr]
        if self.concat_logits:
            parts.append(logits)
        parts = [p.astype(self.dtype) for p in parts]
        d = jnp.concatenate(parts, axis=-1)
        d = self.block(d, self.hidden_dim, "block1")
        if self._fuse_hidden_blocks(H, W):
            # one layout change around the whole chain, not per block
            dc = jnp.transpose(d, (0, 3, 1, 2))
            for i in range(self.hidden_blocks):
                dc = self._block_fused_chan(dc, self.hidden_dim,
                                            f"hidden_{i}")
            d = jnp.transpose(dc, (0, 2, 3, 1))
        else:
            for i in range(self.hidden_blocks):
                d = self.block(d, self.hidden_dim, f"hidden_{i}")
        d = nn.Conv(3, (1, 1), dtype=self.dtype, name="out_conv")(d)
        d = d.astype(jnp.float32)  # flow/certainty stay f32
        if self.disp_first:
            return d[..., -1:], d[..., :-1]
        return d[..., :-2], d[..., -2:]
