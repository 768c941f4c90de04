"""Pose estimation and error metrics.

Ports of /root/reference/tools/metrics.py:11-29 (relative_pose_error),
:77-103 (estimate_pose — here batched and on-chip), :171-214 (error_auc /
aggregate_metrics) and /root/reference/analysis.py:34-53 (trapezoid AUC).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.geometry.epipolar import normalize_points
from gim_tpu.geometry.ransac import ransac, recover_pose
from gim_tpu.utils import highp


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
@highp
def estimate_pose(kpts0: jax.Array, kpts1: jax.Array, valid: jax.Array,
                  K0: jax.Array, K1: jax.Array, key: jax.Array,
                  thresh: float = 0.5, num_hypotheses: int = 1024,
                  conf: jax.Array | None = None):
    """On-chip equivalent of ref tools/metrics.py:77-103 (5-point Nister
    essential RANSAC + recoverPose cheirality).

    kpts: (M, 2) pixels with (M,) validity mask; conf: optional match
    confidences (PROSAC-ordered sampling). Returns dict with R (3,3),
    t (3,), inliers (M,), success (). Threshold is `thresh` pixels
    normalized by mean focal (reference: mean of [f0x, f1y, f0x, f1y])."""
    p0 = normalize_points(kpts0, K0)
    p1 = normalize_points(kpts1, K1)
    f_mean = (K0[0, 0] + K1[1, 1]) / 2.0
    thr = thresh / f_mean
    res = ransac(p0, p1, valid, key, thr, model_kind="essential",
                 num_hypotheses=num_hypotheses, conf=conf)
    R, t, n_good, good = recover_pose(res.model, p0, p1,
                                      res.inliers.astype(jnp.float32))
    enough = jnp.sum(valid) >= 5
    success = res.success & enough & (n_good > 0)
    R = jnp.where(success, R, jnp.eye(3))
    t = jnp.where(success, t, jnp.zeros(3))
    return {"R": R, "t": t, "inliers": res.inliers & good,
            "num_inliers": res.num_inliers, "success": success}


estimate_pose_batched = jax.vmap(
    estimate_pose, in_axes=(0, 0, 0, 0, 0, 0, None, None))


def relative_pose_error(T_0to1: jax.Array, R: jax.Array, t: jax.Array,
                        ignore_gt_t_thr: float = 0.0):
    """Angular translation / rotation errors + scaled translation L2
    (ref tools/metrics.py:11-29). Batched over leading dims."""
    t_gt = T_0to1[..., :3, 3]
    R_gt = T_0to1[..., :3, :3]
    n = jnp.linalg.norm(t, axis=-1) * jnp.linalg.norm(t_gt, axis=-1)
    cos_t = jnp.clip(jnp.sum(t * t_gt, axis=-1) / jnp.maximum(n, 1e-12),
                     -1.0, 1.0)
    t_err = jnp.rad2deg(jnp.arccos(cos_t))
    t_err = jnp.minimum(t_err, 180.0 - t_err)  # E-sign ambiguity
    t_err = jnp.where(jnp.linalg.norm(t_gt, axis=-1) < ignore_gt_t_thr,
                      0.0, t_err)

    r = jnp.linalg.norm(t_gt, axis=-1) / jnp.maximum(
        jnp.linalg.norm(t, axis=-1), 1e-12)
    t_err2 = jnp.linalg.norm(t * r[..., None] - t_gt, axis=-1)

    cos_r = (jnp.einsum("...ij,...ij->...", R, R_gt) - 1.0) / 2.0
    r_err = jnp.rad2deg(jnp.abs(jnp.arccos(jnp.clip(cos_r, -1.0, 1.0))))
    return t_err, r_err, t_err2


# ---------------------------------------------------------------------------
# Host-side aggregation (numpy; tiny)
# ---------------------------------------------------------------------------

def error_auc_ratio(errs, thresholds=(5, 10, 20)):
    """Pass-ratio "AUC" used by the in-run aggregate
    (ref tools/metrics.py:171-176)."""
    errs = np.asarray(errs, dtype=np.float64)
    return {f"AUC@{t}": float(np.sum(errs < t) / max(len(errs), 1))
            for t in thresholds}


def error_auc_trapezoid(r_errs, t_errs, thresholds=(5.0,)):
    """Offline trapezoid AUC over max(R_err, t_err), NaN/inf -> 180
    (ref analysis.py:34-53)."""
    r = np.asarray(r_errs, dtype=np.float64).copy()
    t = np.asarray(t_errs, dtype=np.float64).copy()
    r[~np.isfinite(r)] = 180.0
    t[~np.isfinite(t)] = 180.0
    errors = np.max(np.stack([r, t]), axis=0)
    errors = [0.0] + sorted(errors.tolist())
    recall = list(np.linspace(0, 1, len(errors)))
    out = {}
    for thr in thresholds:
        last = np.searchsorted(errors, thr)
        y = recall[:last] + [recall[last - 1]]
        x = errors[:last] + [thr]
        out[f"auc@{thr}"] = float(np.trapezoid(y, x) / thr)
    return out


def epidist_prec(errors, thresholds, ret_dict=False):
    """Mean matching precision at epipolar thresholds
    (ref tools/metrics.py:179-190)."""
    precs = []
    for thr in thresholds:
        per_pair = [np.mean(np.asarray(e) < thr) if len(e) > 0 else 0
                    for e in errors]
        precs.append(np.mean(per_pair) if len(per_pair) > 0 else 0)
    if ret_dict:
        return {f"Prec@{t:.0e}": p for t, p in zip(thresholds, precs)}
    return precs


def aggregate_metrics(metrics: dict, epi_err_thr: float = 5e-4,
                      test: bool = False) -> dict:
    """Dataset-level aggregation with identifier dedup
    (ref tools/metrics.py:193-214)."""
    seen = {}
    for i, iden in enumerate(metrics["identifiers"]):
        seen.setdefault(iden, i)
    unq = list(seen.values())

    pose_errors = np.max(np.stack([np.asarray(metrics["R_errs"]),
                                   np.asarray(metrics["t_errs"])]), axis=0)[unq]
    aucs = error_auc_ratio(pose_errors, (5, 10, 20))
    errs = [metrics["epi_errs"][i] for i in unq]
    precs = epidist_prec(errs, [epi_err_thr], True)
    out = {**aucs, **precs}
    if test:
        out["Num"] = len(unq)
    return out
