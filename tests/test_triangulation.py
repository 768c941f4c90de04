"""Triangulation-from-known-poses tests (ref hloc/triangulation.py:35-239):
text-model reading, db-from-model, on-chip known-pose verification, track
building, and the batched DLT triangulation recovering synthetic 3D
points."""

import os
from os.path import join

import numpy as np

from gim_tpu.hloc import triangulation as T


def _make_model(tmp, n_views=4):
    """Synthetic scene: cameras on an arc looking at points near origin."""
    rng = np.random.default_rng(0)
    os.makedirs(tmp, exist_ok=True)
    f, W, H = 600.0, 640, 480
    with open(join(tmp, "cameras.txt"), "w") as fh:
        fh.write("# cameras\n")
        fh.write(f"1 PINHOLE {W} {H} {f} {f} {W / 2} {H / 2}\n")
    import cv2

    views = []
    with open(join(tmp, "images.txt"), "w") as fh:
        fh.write("# images\n")
        for i in range(n_views):
            ang = (i - n_views / 2) * 0.15
            R = cv2.Rodrigues(np.array([0.0, ang, 0.0]))[0]
            C = np.array([np.sin(ang) * 6.0, 0.0, 6.0 - np.cos(ang) * 6.0])
            t = -R @ C
            q = _rotmat_to_qvec(R)
            fh.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 img{i}.png\n\n")
            views.append((R, t))
    K = np.array([[f, 0, W / 2], [0, f, H / 2], [0, 0, 1.0]])
    X = rng.uniform([-2, -1.5, 4], [2, 1.5, 8], (60, 3))
    kpts, vis = {}, {}
    for i, (R, t) in enumerate(views):
        x = (X @ R.T + t) @ K.T
        uv = x[:, :2] / x[:, 2:]
        ok = (x[:, 2] > 0) & (uv[:, 0] > 0) & (uv[:, 0] < W) \
            & (uv[:, 1] > 0) & (uv[:, 1] < H)
        kpts[f"img{i}.png"] = uv.astype(np.float32)
        vis[f"img{i}.png"] = ok
    return K, X, kpts, vis, n_views


def _rotmat_to_qvec(R):
    import cv2

    rvec = cv2.Rodrigues(R)[0].ravel()
    ang = np.linalg.norm(rvec)
    if ang < 1e-12:
        return np.array([1.0, 0, 0, 0])
    axis = rvec / ang
    return np.array([np.cos(ang / 2), *(np.sin(ang / 2) * axis)])


def test_text_model_roundtrip(tmp_path):
    _make_model(str(tmp_path))
    m = T.read_text_model(str(tmp_path))
    assert len(m.cameras) == 1 and len(m.images) == 4
    np.testing.assert_allclose(m.cameras[1].K()[0, 0], 600.0)
    # qvec -> R is orthonormal
    R = m.images[1].R()
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-6)


def test_triangulation_end_to_end(tmp_path):
    model_dir = join(str(tmp_path), "model")
    K, X, kpts, vis, n = _make_model(model_dir)
    # exhaustive pairs with identity matches over co-visible points
    pairs, matches = [], {}
    names = [f"img{i}.png" for i in range(n)]
    for a in range(n):
        for b in range(a + 1, n):
            both = vis[names[a]] & vis[names[b]]
            idx = np.where(both)[0]
            pairs.append((names[a], names[b]))
            matches[(names[a], names[b])] = np.stack([idx, idx], -1)

    sfm = join(str(tmp_path), "sfm")
    xyz, ok, errs = T.main(sfm, model_dir, model_dir, pairs, kpts, matches)
    assert ok.sum() >= 50, int(ok.sum())
    assert os.path.exists(join(sfm, "points3D.txt"))
    assert os.path.exists(join(sfm, "database.db"))
    # triangulated points must land on the true 3D points. Tracks are
    # unordered; match each to its nearest GT point.
    d = np.linalg.norm(xyz[ok][:, None, :] - X[None], axis=-1).min(1)
    assert np.median(d) < 1e-2, np.median(d)


def test_known_pose_verification_rejects_outliers(tmp_path):
    model_dir = join(str(tmp_path), "model")
    K, X, kpts, vis, n = _make_model(model_dir)
    m = T.read_text_model(model_dir)
    name_to_id = {img.name: i for i, img in m.images.items()}
    both = vis["img0.png"] & vis["img1.png"]
    idx = np.where(both)[0]
    matches = np.stack([idx, idx], -1)
    # corrupt half the matches
    rng = np.random.default_rng(1)
    bad = rng.permutation(len(matches))[:len(matches) // 2]
    matches[bad, 1] = rng.permutation(matches[bad, 1])
    pairs = [("img0.png", "img1.png")]
    inl = T.verify_matches_known_poses(
        m, name_to_id, kpts, pairs, {pairs[0]: matches}, max_error=4.0)
    mask = inl[pairs[0]]
    good = np.ones(len(matches), bool)
    good[bad] = matches[bad, 1] == matches[bad, 0]  # shuffles may fix some
    assert mask[~good].mean() < 0.1       # outliers rejected
    assert mask[good].mean() > 0.95       # inliers kept
