"""Batched on-chip RANSAC for essential / fundamental / homography estimation.

TPU-native replacement for the reference's host-side OpenCV calls:
- cv2.findEssentialMat + cv2.recoverPose in the eval hot path
  (ref tools/metrics.py:77-103 — per-pair, serial, device->host sync),
- cv2.findFundamentalMat(USAC_MAGSAC) in demo/video pipelines
  (ref demo.py:514-518, video_preprocessor.py:569-583).

Design: instead of OpenCV's sequential adaptive RANSAC, we evaluate a large
fixed bank of hypotheses fully in parallel — every hypothesis is an
independent 8-point (or 4-point DLT) solve via a 9x9 symmetric eigensolve,
and all hypothesis x point residuals are one batched einsum. Numerical
conditioning follows Hartley: points are isotropically normalized once per
problem, models are solved in the conditioned frame and denormalized before
scoring, and all geometry matmuls run at full fp32 MXU precision (@highp).
Scoring is MSAC-truncated with inlier-count ranking; the winner gets fixed
rounds of locally-optimized IRLS refitting. Shapes are fully static:
invalid points carry a mask and padded slots never win.

vmap over the pair axis gives whole-batch pose estimation without leaving
HBM — the throughput sink the reference suffers from (SURVEY §3.2).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from gim_tpu.geometry.epipolar import sampson_distance, to_homogeneous
from gim_tpu.geometry.fivepoint import essential_candidates
from gim_tpu.utils import highp


class RansacResult(NamedTuple):
    model: jax.Array        # (3, 3) F / E / H
    inliers: jax.Array      # (M,) bool
    num_inliers: jax.Array  # () int32
    success: jax.Array      # () bool


# ---------------------------------------------------------------------------
# Hartley normalization
# ---------------------------------------------------------------------------

def hartley_transform(pts: jax.Array, valid: jax.Array) -> jax.Array:
    """Isotropic normalizing transform T (3, 3): centroid -> 0, RMS -> sqrt(2).
    Statistics over valid points only."""
    w = valid.astype(pts.dtype)
    n = jnp.maximum(w.sum(), 1.0)
    mean = (pts * w[:, None]).sum(axis=0) / n
    d = jnp.linalg.norm(pts - mean, axis=-1)
    rms = jnp.sqrt(((d ** 2) * w).sum() / n)
    s = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-12)
    T = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]])
    T = T.at[0, 0].set(s).at[1, 1].set(s)
    T = T.at[0, 2].set(-s * mean[0]).at[1, 2].set(-s * mean[1])
    return T


def _apply_T(pts: jax.Array, T: jax.Array) -> jax.Array:
    return pts * T[0, 0] + T[:2, 2]


# ---------------------------------------------------------------------------
# Minimal solvers (operate in the conditioned frame)
# ---------------------------------------------------------------------------

def _epipolar_rows(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """Rows of the DLT system p1^T F p0 = 0. p0/p1: (..., N, 2) -> (..., N, 9)."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    one = jnp.ones_like(x0)
    return jnp.stack([x1 * x0, x1 * y0, x1, y1 * x0, y1 * y0, y1,
                      x0, y0, one], axis=-1)


def _nullspace9(rows: jax.Array, w: jax.Array) -> jax.Array:
    """Right-singular vector of the smallest singular value of the weighted
    DLT system. rows: (..., M, 9); w: (..., M) non-negative weights.

    Solved via SVD of sqrt(w)-scaled rows directly — NOT eigh of A^T A,
    which squares the condition number and is fatally inaccurate in fp32
    (TPUs have no f64). M=8 systems are zero-padded to 9 rows so the thin
    SVD still exposes the nullspace."""
    a = rows * jnp.sqrt(w)[..., None]
    M = a.shape[-2]
    if M < 9:
        pad = [(0, 0)] * (a.ndim - 2) + [(0, 9 - M), (0, 0)]
        a = jnp.pad(a, pad)
    _, _, vt = jnp.linalg.svd(a, full_matrices=False)
    return vt[..., -1, :]


def project_fundamental(F: jax.Array) -> jax.Array:
    """Nearest rank-2 matrix (zero the smallest singular value)."""
    u, s, vt = jnp.linalg.svd(F)
    s = s.at[..., 2].set(0.0)
    return (u * s[..., None, :]) @ vt


def project_essential(F: jax.Array) -> jax.Array:
    """Nearest essential matrix: singular values -> (1, 1, 0)."""
    u, s, vt = jnp.linalg.svd(F)
    s = jnp.ones_like(s).at[..., 2].set(0.0)
    return (u * s[..., None, :]) @ vt


@highp
def solve_epipolar_raw(p0: jax.Array, p1: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted DLT solve of p1^T F p0 = 0 (no rank projection).
    p0/p1: (..., M, 2); w: (..., M). Returns (..., 3, 3)."""
    rows = _epipolar_rows(p0, p1)                      # (..., M, 9)
    f = _nullspace9(rows, w)
    return f.reshape(*f.shape[:-1], 3, 3)


def _homography_rows(p0: jax.Array, p1: jax.Array) -> jax.Array:
    """DLT rows for p1 ~ H p0. p0/p1: (..., N, 2) -> (..., N, 2, 9)."""
    x0, y0 = p0[..., 0], p0[..., 1]
    x1, y1 = p1[..., 0], p1[..., 1]
    one = jnp.ones_like(x0)
    zero = jnp.zeros_like(x0)
    r1 = jnp.stack([x0, y0, one, zero, zero, zero,
                    -x1 * x0, -x1 * y0, -x1], axis=-1)
    r2 = jnp.stack([zero, zero, zero, x0, y0, one,
                    -y1 * x0, -y1 * y0, -y1], axis=-1)
    return jnp.stack([r1, r2], axis=-2)


@highp
def solve_homography_raw(p0: jax.Array, p1: jax.Array,
                         w: jax.Array) -> jax.Array:
    rows = _homography_rows(p0, p1)                    # (..., M, 2, 9)
    rows = rows.reshape(*rows.shape[:-3], -1, 9)
    w2 = jnp.repeat(w, 2, axis=-1)
    h = _nullspace9(rows, w2)
    return h.reshape(*h.shape[:-1], 3, 3)


@highp
def homography_transfer_error(p0: jax.Array, p1: jax.Array,
                              H: jax.Array) -> jax.Array:
    """Squared symmetric transfer error. p0/p1: (..., M, 2); H: (..., 3, 3)."""
    p0h = to_homogeneous(p0)
    p1h = to_homogeneous(p1)
    q1 = p0h @ jnp.swapaxes(H, -1, -2)
    q1 = q1[..., :2] / jnp.where(jnp.abs(q1[..., 2:]) < 1e-12, 1e-12, q1[..., 2:])
    Hinv = jnp.linalg.inv(H)
    q0 = p1h @ jnp.swapaxes(Hinv, -1, -2)
    q0 = q0[..., :2] / jnp.where(jnp.abs(q0[..., 2:]) < 1e-12, 1e-12, q0[..., 2:])
    return (jnp.sum((q1 - p1) ** 2, axis=-1)
            + jnp.sum((q0 - p0) ** 2, axis=-1))


# ---------------------------------------------------------------------------
# Hypothesis sampling
# ---------------------------------------------------------------------------

def _sample_minimal(key: jax.Array, valid: jax.Array, num_hyp: int,
                    sample_size: int,
                    conf: jax.Array | None = None) -> jax.Array:
    """(num_hyp, sample_size) indices of valid points, sampled without
    replacement per hypothesis via the Gumbel-top-k trick.

    With `conf`, sampling is PROSAC-style progressive: points are ranked
    by confidence and hypothesis h draws only from the top-n_h prefix,
    n_h growing from ~2x the sample size to all valid points across the
    bank (Chum & Matas, "Matching with PROSAC", CVPR 2005 — early
    hypotheses concentrate on high-confidence matches, which is where
    OpenCV's USAC gets its low-inlier robustness)."""
    M = valid.shape[-1]
    noise = jax.random.uniform(key, (num_hyp, M))
    if conf is None:
        noise = jnp.where(valid[None, :], noise, -1.0)
        _, idx = jax.lax.top_k(noise, sample_size)
        return idx

    rank_key = jnp.where(valid, conf, -jnp.inf)
    order = jnp.argsort(-rank_key)                    # best first
    nvalid = jnp.sum(valid)
    n_min = jnp.minimum(jnp.maximum(2 * sample_size, 10), nvalid)
    frac = (jnp.arange(num_hyp, dtype=jnp.float32) + 1.0) / num_hyp
    n_h = n_min + (nvalid - n_min) * frac ** 2        # (H,) prefix sizes
    pos = jnp.arange(M, dtype=jnp.float32)
    allowed = pos[None, :] < n_h[:, None]
    noise = jnp.where(allowed, noise, -1.0)
    _, sidx = jax.lax.top_k(noise, sample_size)       # sorted positions
    # order[sidx] as take_along_axis (fancy indexing scalarizes on TPU)
    return jnp.take_along_axis(order[None, :].repeat(sidx.shape[0], 0),
                               sidx, axis=1)


# ---------------------------------------------------------------------------
# Core RANSAC loop (single pair; vmap for batches)
# ---------------------------------------------------------------------------

# sigma ladder for MAGSAC-like marginalized scoring: truncated-quadratic
# gains at several inlier scales, summed — a discrete marginalization over
# the noise scale (Barath et al., "MAGSAC: marginalizing sample
# consensus", CVPR 2019; here as a fixed ladder instead of the gamma
# integral so scoring stays one fused elementwise pass on chip).
_SIGMA_LADDER = (0.25, 1.0, 4.0)


def _magsac_gain(errs2: jax.Array, thr2, valid_f: jax.Array) -> jax.Array:
    """errs2: (..., M) squared residuals -> (...,) marginalized score."""
    g = 0.0
    for s in _SIGMA_LADDER:
        tau2 = thr2 * s
        g = g + jnp.sum(jnp.maximum(0.0, 1.0 - errs2 / tau2)
                        * valid_f, axis=-1)
    return g


@functools.partial(jax.jit, static_argnames=("model_kind", "num_hypotheses",
                                             "refine_rounds"))
@highp
def ransac(p0: jax.Array, p1: jax.Array, valid: jax.Array, key: jax.Array,
           threshold: float | jax.Array, *, model_kind: str = "essential",
           num_hypotheses: int = 1024, refine_rounds: int = 3,
           conf: jax.Array | None = None) -> RansacResult:
    """Parallel-hypothesis RANSAC on one correspondence set.

    p0/p1: (M, 2) points (normalized camera coords for 'essential', pixels
    for 'fundamental'/'homography'); valid: (M,) mask; threshold: inlier
    threshold in input units (distance, not squared); conf: optional (M,)
    match confidences enabling PROSAC-progressive sampling.

    'essential' uses genuine 5-point Nister minimal samples (up to 10
    candidate models per sample, gim_tpu.geometry.fivepoint) — the
    OpenCV-parity solver the eval metric depends on; 'fundamental' uses
    8-point and 'homography' 4-point DLT. All hypotheses are scored with
    the sigma-marginalized MAGSAC-like gain, then the winner gets IRLS
    local optimization.
    """
    M = p0.shape[0]
    essential = model_kind == "essential"
    homog = model_kind == "homography"
    sample_size = 5 if essential else (4 if homog else 8)
    thr2 = jnp.asarray(threshold, jnp.float32) ** 2

    # condition the problem (Hartley) — solve normalized, score original.
    # (The 5-point path solves directly in camera-normalized coords:
    # a similarity re-conditioning would not preserve the essential
    # manifold through denormalization.)
    T0 = hartley_transform(p0, valid)
    T1 = hartley_transform(p1, valid)
    q0 = _apply_T(p0, T0)
    q1 = _apply_T(p1, T1)
    T1inv = jnp.linalg.inv(T1)

    def denorm(Fhat):
        if homog:
            H = T1inv @ Fhat @ T0
            return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) < 1e-12, 1e-12,
                                 H[..., 2:3, 2:3])
        F = jnp.swapaxes(T1, -1, -2) @ Fhat @ T0
        return project_essential(F) if essential else project_fundamental(F)

    p0h = to_homogeneous(p0)
    p1h = to_homogeneous(p1)

    def residuals(model):
        # broadcasting: (M, 3) against (..., 3, 3) -> (..., M)
        if homog:
            return homography_transfer_error(p0, p1, model)
        return sampson_distance(p0h, p1h, model)

    valid_f = valid.astype(jnp.float32)

    def hypothesize_and_score(skey, n_hyp, sample_conf):
        """Sample n_hyp minimal sets, solve, score all candidates in
        memory-bounded chunks. Returns (best_gain, best_model)."""
        idx = _sample_minimal(skey, valid, n_hyp, sample_size, sample_conf)

        def rows(pts, ii):
            # take_along_axis: leading-dim fancy indexing with a 2-D index
            # scalarizes on TPU (docs/PERF.md 1-D/row gather measurements)
            out = jnp.take_along_axis(pts, ii.reshape(-1)[:, None], axis=0)
            return out.reshape(*ii.shape, pts.shape[-1])

        if essential:
            cand, cand_valid = essential_candidates(rows(p0, idx),
                                                    rows(p1, idx))
            models = cand.reshape(-1, 3, 3)           # (H*10, 3, 3)
            mvalid = cand_valid.reshape(-1)
        else:
            s0, s1 = rows(q0, idx), rows(q1, idx)     # (H, k, 2)
            ones = jnp.ones(idx.shape, jnp.float32)
            if homog:
                models = denorm(solve_homography_raw(s0, s1, ones))
            else:
                models = denorm(solve_epipolar_raw(s0, s1, ones))
            mvalid = jnp.ones(models.shape[0], bool)

        # chunked scoring: never materialize the full (N_models, M)
        # residual matrix (5-point banks are 10x the hypothesis count)
        N = models.shape[0]
        chunk = min(2048, N)
        n_chunks = -(-N // chunk)
        pad = n_chunks * chunk - N
        models_p = jnp.concatenate(
            [models, jnp.broadcast_to(jnp.eye(3), (pad, 3, 3))], axis=0)
        mvalid_p = jnp.concatenate([mvalid, jnp.zeros(pad, bool)])

        def score_chunk(args):
            mc, vc = args
            errs = residuals(mc)                      # (chunk, M)
            gain = _magsac_gain(errs, thr2, valid_f[None])
            gain = jnp.where(vc, gain, -jnp.inf)
            i = jnp.argmax(gain)
            return gain[i], mc[i]

        gains, bests = jax.lax.map(
            score_chunk, (models_p.reshape(n_chunks, chunk, 3, 3),
                          mvalid_p.reshape(n_chunks, chunk)))
        i = jnp.argmax(gains)
        return gains[i], bests[i]

    k1, k2 = jax.random.split(key)
    best_gain, best_model = hypothesize_and_score(k1, num_hypotheses, conf)

    # LO resampling round: draw fresh minimal samples preferentially from
    # the best model's (loose) inlier set — the inner-sampling step that
    # gives LO-RANSAC/USAC its low-inlier-ratio robustness (Chum, Matas &
    # Kittler, "Locally optimized RANSAC", 2003). One round at 1/4 the
    # bank: any better-than-random first model bootstraps to near-all-
    # inlier samples.
    e_best = residuals(best_model)
    loose_in = ((e_best < 4.0 * thr2) & valid).astype(jnp.float32)
    gain2, model2 = hypothesize_and_score(k2, max(num_hypotheses // 4, 32),
                                          loose_in)
    better = gain2 > best_gain
    best_model = jnp.where(better, model2, best_model)
    best_gain = jnp.where(better, gain2, best_gain)

    # Local optimization: IRLS refit on inliers (Torr-style), fixed rounds,
    # LO-RANSAC acceptance — a refit is kept only if it does not reduce the
    # marginalized gain (an unguarded accept can replace an exact minimal
    # 5-point model with a worse projected DLT fit).

    def refine(carry, _):
        model, gain = carry
        e = residuals(model)
        w = jnp.where((e < thr2) & valid, 1.0 / jnp.maximum(e, 1e-10 * thr2), 0.0)
        w = jnp.minimum(w, 1e6)
        # normalize weights so ATA stays O(1)
        w = w / jnp.maximum(w.max(), 1e-12)
        enough = jnp.sum(w > 0) >= sample_size
        if homog:
            new = denorm(solve_homography_raw(q0, q1, w))
        else:
            new = denorm(solve_epipolar_raw(q0, q1, w))
        new_gain = _magsac_gain(residuals(new), thr2, valid_f)
        accept = enough & (new_gain >= gain)
        model = jnp.where(accept, new, model)
        gain = jnp.where(accept, new_gain, gain)
        return (model, gain), None

    (best_model, _), _ = jax.lax.scan(refine, (best_model, best_gain), None,
                                      length=refine_rounds)

    final_err = residuals(best_model)
    inliers = (final_err < thr2) & valid
    n = jnp.sum(inliers).astype(jnp.int32)
    success = (jnp.sum(valid) >= sample_size) & (n >= sample_size)
    return RansacResult(best_model, inliers, n, success)


# ---------------------------------------------------------------------------
# Essential decomposition + cheirality (cv2.recoverPose equivalent)
# ---------------------------------------------------------------------------

@highp
def triangulate_depths(p0: jax.Array, p1: jax.Array, R: jax.Array,
                       t: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Two-view depths via least-squares on z0*R x0 + t = z1*x1.

    p0/p1: (M, 2) normalized coords. Returns (z0, z1) each (M,).
    Closed-form 2x2 normal equations — fully vectorized, no per-point SVD.
    """
    x0 = to_homogeneous(p0)                  # (M, 3) rays in cam0
    x1 = to_homogeneous(p1)                  # (M, 3) rays in cam1
    Rx0 = x0 @ R.T                            # (M, 3)
    # minimize || z0 * Rx0 - z1 * x1 + t ||^2 over (z0, z1)
    a = jnp.sum(Rx0 * Rx0, axis=-1)
    b = -jnp.sum(Rx0 * x1, axis=-1)
    c = jnp.sum(x1 * x1, axis=-1)
    rhs0 = -jnp.sum(Rx0 * t, axis=-1)
    rhs1 = jnp.sum(x1 * t, axis=-1)
    det = a * c - b * b
    det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
    z0 = (c * rhs0 - b * rhs1) / det
    z1 = (a * rhs1 - b * rhs0) / det
    return z0, z1


@highp
def decompose_essential(E: jax.Array):
    """E -> (R1, R2, t): the two rotations and translation direction."""
    u, _, vt = jnp.linalg.svd(E)
    # enforce proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))[..., None, None]
    vt = vt * jnp.sign(jnp.linalg.det(vt))[..., None, None]
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = u @ W @ vt
    R2 = u @ W.T @ vt
    t = u[..., :, 2]
    return R1, R2, t


@highp
def recover_pose(E: jax.Array, p0: jax.Array, p1: jax.Array,
                 weights: jax.Array, max_depth: float = 1e9):
    """Select the (R, t) with the most points in front of both cameras
    (cv2.recoverPose semantics, ref tools/metrics.py:94-101).

    p0/p1: (M, 2) normalized; weights: (M,) float mask (inliers).
    Returns (R (3,3), t (3,), num_good, good_mask (M,))."""
    R1, R2, t = decompose_essential(E)
    Rs = jnp.stack([R1, R1, R2, R2])
    ts = jnp.stack([t, -t, t, -t])

    def score(R, tt):
        z0, z1 = triangulate_depths(p0, p1, R, tt)
        ok = (z0 > 0) & (z1 > 0) & (z0 < max_depth) & (z1 < max_depth)
        return jnp.sum(ok * weights), ok

    counts, oks = jax.vmap(score)(Rs, ts)
    best = jnp.argmax(counts)
    return Rs[best], ts[best], counts[best], oks[best]
