"""API-level integration: real-signal matching through the public surface."""

import cv2
import jax
import jax.numpy as jnp
import numpy as np


def _textured(rng, H=240, W=320):
    img = np.zeros((H, W, 3), np.uint8)
    for _ in range(160):
        c = tuple(int(x) for x in rng.integers(40, 255, 3))
        p = (int(rng.integers(0, W)), int(rng.integers(0, H)))
        cv2.circle(img, p, int(rng.integers(2, 12)), c, -1)
    return cv2.GaussianBlur(img, (3, 3), 0)


def test_rootsift_matches_recover_known_homography():
    rng = np.random.default_rng(0)
    img0 = _textured(rng)
    H_gt = np.array([[0.98, 0.02, 6.0], [-0.01, 1.01, -4.0], [0, 0, 1.0]])
    img1 = cv2.warpPerspective(img0, H_gt, (320, 240),
                               borderMode=cv2.BORDER_REFLECT)

    from gim_tpu.models.root_sift import match_pair_rootsift

    k0, k1, conf = match_pair_rootsift(img0, img1, max_kpts=2048)
    assert len(k0) > 50

    from gim_tpu.geometry.ransac import ransac

    M = 2048
    p0 = np.zeros((M, 2), np.float32)
    p1 = np.zeros((M, 2), np.float32)
    v = np.zeros(M, bool)
    n = min(len(k0), M)
    p0[:n], p1[:n], v[:n] = k0[:n], k1[:n], True
    res = ransac(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(v),
                 jax.random.PRNGKey(0), 2.0, model_kind="homography",
                 num_hypotheses=512)
    Hn = np.asarray(res.model)
    Hn = Hn / Hn[2, 2]
    # recovered homography close to GT on the image domain
    corners = np.array([[10, 10, 1], [310, 10, 1], [10, 230, 1],
                        [310, 230, 1]], np.float64).T
    def proj(H):
        q = H @ corners
        return (q[:2] / q[2:]).T
    err = np.abs(proj(Hn) - proj(H_gt)).max()
    assert err < 3.0, err


def test_matcher_api_lightglue_smoke():
    from gim_tpu.api import Matcher

    m = Matcher("gim_lightglue")
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 64))
    res = m.match(img, img)
    assert res.kpts0.shape[0] == 1
    assert res.kpts0.shape == res.kpts1.shape
    assert res.conf.shape == res.valid.shape


def test_estimate_pose_batched():
    from tests.test_geometry import make_scene

    from gim_tpu.geometry.pose import estimate_pose_batched, \
        relative_pose_error

    p0s, p1s, Ks, Ts = [], [], [], []
    for seed in (0, 1):
        p0, p1, K, Rm, t, T, gt = make_scene(seed=seed, n=128,
                                             outlier_frac=0.2)
        p0s.append(p0)
        p1s.append(p1)
        Ks.append(K)
        Ts.append(T)
    B = 2
    kp0 = jnp.asarray(np.stack(p0s))
    kp1 = jnp.asarray(np.stack(p1s))
    valid = jnp.ones((B, 128), bool)
    K = jnp.asarray(np.stack(Ks))
    keys = jax.random.split(jax.random.PRNGKey(0), B)
    out = estimate_pose_batched(kp0, kp1, valid, K, K, keys, 0.5, 512)
    assert bool(out["success"].all())
    t_err, r_err, _ = relative_pose_error(
        jnp.asarray(np.stack(Ts)), out["R"], out["t"])
    assert np.asarray(r_err).max() < 2.0
    assert np.asarray(t_err).max() < 5.0
