"""Geometry tests: epipolar math vs closed form, RANSAC vs OpenCV on
synthetic scenes (parity is statistical — SURVEY §7 hard part (a))."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.geometry import epipolar as E
from gim_tpu.geometry import pose as P
from gim_tpu.geometry import ransac as R


def make_scene(seed=0, n=200, outlier_frac=0.3, noise=0.25):
    """Synthetic two-view scene. Returns pixel kpts, K, R, t, T_0to1."""
    rng = np.random.default_rng(seed)
    K = np.array([[600.0, 0, 320], [0, 600, 240], [0, 0, 1]])
    pts3 = rng.uniform([-2, -2, 4], [2, 2, 10], (n, 3))
    angle = 0.25
    Rm = cv2.Rodrigues(np.array([0.05, angle, 0.02]))[0]
    t = np.array([1.0, 0.15, 0.1])
    p0 = pts3 @ K.T
    p0 = p0[:, :2] / p0[:, 2:]
    pts3_1 = pts3 @ Rm.T + t
    p1 = pts3_1 @ K.T
    p1 = p1[:, :2] / p1[:, 2:]
    p0 += rng.normal(0, noise, p0.shape)
    p1 += rng.normal(0, noise, p1.shape)
    n_out = int(n * outlier_frac)
    p1[:n_out] = rng.uniform([0, 0], [640, 480], (n_out, 2))
    inlier_gt = np.ones(n, bool)
    inlier_gt[:n_out] = False
    T = np.eye(4)
    T[:3, :3] = Rm
    T[:3, 3] = t
    return (p0.astype(np.float32), p1.astype(np.float32),
            K.astype(np.float32), Rm, t, T.astype(np.float32), inlier_gt)


def test_essential_from_pose_and_epipolar_distance():
    p0, p1, K, Rm, t, T, gt = make_scene(noise=0.0, outlier_frac=0.0)
    Em = np.asarray(E.essential_from_pose(jnp.asarray(T)))
    d = np.asarray(E.symmetric_epipolar_distance(
        jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(Em),
        jnp.asarray(K), jnp.asarray(K)))
    assert np.all(d < 1e-4)  # float32; units are squared normalized coords


def test_sampson_zero_for_perfect_points():
    p0, p1, K, Rm, t, T, gt = make_scene(noise=0.0, outlier_frac=0.0)
    Em = np.asarray(E.essential_from_pose(jnp.asarray(T)))
    n0 = E.normalize_points(jnp.asarray(p0), jnp.asarray(K))
    n1 = E.normalize_points(jnp.asarray(p1), jnp.asarray(K))
    d = np.asarray(E.sampson_distance(
        E.to_homogeneous(n0), E.to_homogeneous(n1), jnp.asarray(Em)))
    # float32 input quantization of the scene (pixel coords cast to f32)
    # bounds the achievable residual; 1e-6 squared-normalized ~ 0.6px at
    # f=600 is still 40x below the RANSAC threshold regime being tested.
    assert np.all(d < 1e-6)


def test_ransac_essential_recovers_pose():
    p0, p1, K, Rm, t_gt, T, gt = make_scene(seed=3)
    valid = np.ones(len(p0), bool)
    out = P.estimate_pose(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(valid),
                          jnp.asarray(K), jnp.asarray(K),
                          jax.random.PRNGKey(0), 0.5, 512)
    assert bool(out["success"])
    t_err, r_err, _ = P.relative_pose_error(
        jnp.asarray(T), out["R"], out["t"])
    assert float(r_err) < 1.5, float(r_err)
    assert float(t_err) < 3.0, float(t_err)
    # inliers should mostly agree with ground truth
    inl = np.asarray(out["inliers"])
    assert inl[gt].mean() > 0.8
    assert inl[~gt].mean() < 0.15


def test_ransac_comparable_to_opencv():
    """Statistical parity: our angular errors within ~1 deg of OpenCV's."""
    ours_r, cv_r = [], []
    for seed in range(5):
        p0, p1, K, Rm, t_gt, T, gt = make_scene(seed=seed, outlier_frac=0.4)
        out = P.estimate_pose(jnp.asarray(p0), jnp.asarray(p1),
                              jnp.asarray(np.ones(len(p0), bool)),
                              jnp.asarray(K), jnp.asarray(K),
                              jax.random.PRNGKey(seed), 0.5, 1024)
        t_err, r_err, _ = P.relative_pose_error(jnp.asarray(T), out["R"], out["t"])
        ours_r.append(max(float(r_err), float(t_err)))

        k0 = (p0 - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
        k1 = (p1 - K[[0, 1], [2, 2]][None]) / K[[0, 1], [0, 1]][None]
        thr = 0.5 / np.mean([K[0, 0], K[1, 1], K[0, 0], K[1, 1]])
        Ecv, mask = cv2.findEssentialMat(k0, k1, np.eye(3), threshold=thr,
                                         prob=0.99999, method=cv2.RANSAC)
        best = (np.inf, np.inf)
        for _E in np.split(Ecv, len(Ecv) / 3):
            n, Rr, tr, _ = cv2.recoverPose(_E, k0, k1, np.eye(3), 1e9,
                                           mask=mask.copy())
            terr, rerr, _ = map(float, (np.asarray(x) for x in
                                        P.relative_pose_error(
                                            jnp.asarray(T), jnp.asarray(Rr),
                                            jnp.asarray(tr[:, 0]))))
            if max(terr, rerr) < max(best):
                best = (terr, rerr)
        cv_r.append(max(best))
    # our median error should be within 1 degree of OpenCV's
    assert np.median(ours_r) <= np.median(cv_r) + 1.0, (ours_r, cv_r)


def test_ransac_fundamental_pixel_space():
    p0, p1, K, Rm, t_gt, T, gt = make_scene(seed=7, outlier_frac=0.3)
    res = R.ransac(jnp.asarray(p0), jnp.asarray(p1),
                   jnp.asarray(np.ones(len(p0), bool)),
                   jax.random.PRNGKey(1), 1.0, model_kind="fundamental",
                   num_hypotheses=1024)
    inl = np.asarray(res.inliers)
    assert bool(res.success)
    assert inl[gt].mean() > 0.7
    assert inl[~gt].mean() < 0.2


def test_ransac_homography():
    rng = np.random.default_rng(11)
    H_gt = np.array([[1.1, 0.02, 10], [-0.03, 0.95, -5], [1e-4, -2e-4, 1.0]])
    p0 = rng.uniform([0, 0], [640, 480], (150, 2))
    p1h = np.concatenate([p0, np.ones((150, 1))], 1) @ H_gt.T
    p1 = p1h[:, :2] / p1h[:, 2:]
    p1[:40] = rng.uniform([0, 0], [640, 480], (40, 2))
    res = R.ransac(jnp.asarray(p0.astype(np.float32)),
                   jnp.asarray(p1.astype(np.float32)),
                   jnp.asarray(np.ones(150, bool)),
                   jax.random.PRNGKey(2), 2.0, model_kind="homography",
                   num_hypotheses=512)
    inl = np.asarray(res.inliers)
    assert inl[40:].mean() > 0.9
    assert inl[:40].mean() < 0.1
    # H up to scale matches
    Hn = np.asarray(res.model)
    Hn = Hn / Hn[2, 2]
    np.testing.assert_allclose(Hn, H_gt, atol=5e-2)


def test_relative_pose_error_zero_for_gt():
    _, _, _, Rm, t, T, _ = make_scene(noise=0.0)
    t_err, r_err, t_err2 = P.relative_pose_error(
        jnp.asarray(T), jnp.asarray(Rm.astype(np.float32)),
        jnp.asarray(t.astype(np.float32)))
    assert float(r_err) < 1e-3 and float(t_err) < 1e-2 and float(t_err2) < 1e-4


def test_error_auc_trapezoid_known_values():
    # errors all below threshold -> recall ramps linearly, auc ~ 1 - mean/thr
    aucs = P.error_auc_trapezoid([1.0, 1.0], [1.0, 1.0], (5.0,))
    assert 0.7 < aucs["auc@5.0"] < 0.9
    aucs = P.error_auc_trapezoid([np.inf, np.nan], [0.0, 0.0], (5.0,))
    assert aucs["auc@5.0"] == 0.0


def test_aggregate_metrics_dedup():
    m = {"identifiers": ["a", "b", "a"],
         "R_errs": [1.0, 10.0, 99.0],
         "t_errs": [1.0, 2.0, 99.0],
         "epi_errs": [np.array([1e-5]), np.array([1.0]), np.array([1.0])]}
    out = P.aggregate_metrics(m, 5e-4, test=True)
    assert out["Num"] == 2
    assert out["AUC@5"] == 0.5
