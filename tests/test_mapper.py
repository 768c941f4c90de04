"""Native incremental SfM mapper (gim_tpu/hloc/mapper.py) on a synthetic
scene: COLMAP db of noisy projections -> init / PnP registration /
triangulation / resection-intersection BA -> poses + structure recovered
up to a similarity transform (the role of pycolmap.incremental_mapping in
ref hloc/reconstruction.py:61-100)."""

import numpy as np
import pytest

from gim_tpu.hloc.database import ColmapDB
from gim_tpu.hloc import mapper as M


def _look_at(eye, target):
    z = target - eye
    z = z / np.linalg.norm(z)
    x = np.cross(z, np.array([0.0, 1.0, 0.0]))
    x = x / np.linalg.norm(x)
    y = np.cross(z, x)
    R = np.stack([x, y, z])                      # world->cam rows
    t = -R @ eye
    return R, t


def _make_scene(n_cams=6, n_pts=300, noise_px=0.3, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.uniform([-1, -1, 4], [1, 1, 6], size=(n_pts, 3))
    K = np.array([[600.0, 0, 320], [0, 600.0, 240], [0, 0, 1]])
    w, h = 640, 480
    cams = []
    for i in range(n_cams):
        ang = (i / max(n_cams - 1, 1) - 0.5) * 1.2
        eye = np.array([2.5 * np.sin(ang), 0.3 * np.sin(2 * ang),
                        5.0 - 2.5 * np.cos(ang)])
        cams.append(_look_at(eye, np.array([0.0, 0.0, 5.0])))

    kpts, vis, order = {}, {}, {}
    names = [f"im{i}.png" for i in range(n_cams)]
    for name, (R, t) in zip(names, cams):
        y = pts @ R.T + t
        uv = (y[:, :2] / y[:, 2:]) * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        uv = uv + rng.normal(0, noise_px, uv.shape)
        ok = ((y[:, 2] > 0.1) & (uv[:, 0] > 0) & (uv[:, 0] < w)
              & (uv[:, 1] > 0) & (uv[:, 1] < h))
        # shuffle keypoint order so match indices are nontrivial
        ids = np.nonzero(ok)[0]
        perm = rng.permutation(len(ids))
        kpts[name] = uv[ids][perm].astype(np.float32)
        vis[name] = ids[perm]                    # row -> world point id
        order[name] = {int(p): r for r, p in enumerate(ids[perm])}
    return names, cams, pts, K, (w, h), kpts, vis, order


def _write_db(path, names, K, wh, kpts, order):
    db = ColmapDB(str(path))
    w, h = wh
    cam_id = db.add_camera(1, w, h, np.array([K[0, 0], K[1, 1],
                                              K[0, 2], K[1, 2]]))
    ids = {n: db.add_image(n, cam_id) for n in names}
    for n in names:
        db.add_keypoints(ids[n], kpts[n] + 0.5)
    for i, n0 in enumerate(names):
        for n1 in names[i + 1:]:
            shared = sorted(set(order[n0]) & set(order[n1]))
            m = np.array([[order[n0][p], order[n1][p]] for p in shared],
                         np.uint32)
            if len(m) < 8:
                continue
            db.add_matches(ids[n0], ids[n1], m)
            db.add_two_view_geometry(ids[n0], ids[n1], m, config=3)
    db.close()


def _align_similarity(A, B):
    """Similarity transform s,R,t minimizing ||s R A + t - B|| (Umeyama)."""
    muA, muB = A.mean(0), B.mean(0)
    Ac, Bc = A - muA, B - muB
    U, S, Vt = np.linalg.svd(Bc.T @ Ac / len(A))
    D = np.eye(3)
    D[2, 2] = np.sign(np.linalg.det(U @ Vt))
    R = U @ D @ Vt
    s = np.trace(np.diag(S) @ D) / (Ac ** 2).mean(0).sum()
    t = muB - s * R @ muA
    return s, R, t


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    names, cams, pts, K, wh, kpts, vis, order = _make_scene()
    db = tmp_path_factory.mktemp("mapper") / "database.db"
    _write_db(db, names, K, wh, kpts, order)
    rec = M.incremental_mapping_native(str(db), verbose=False)
    return names, cams, pts, rec


def test_all_images_registered(scene):
    names, cams, pts, rec = scene
    assert rec.num_reg_images() == len(names)
    assert rec.num_points3D() > 150


def test_recovered_poses_match_gt_up_to_similarity(scene):
    names, cams, pts, rec = scene
    # camera centers: C = -R^T t
    C_est = np.array([-(np.asarray(R).T @ t) for R, t in
                      (rec.poses[n] for n in names)])
    C_gt = np.array([-(R.T @ t) for R, t in cams])
    s, Rs, ts = _align_similarity(C_est, C_gt)
    err = np.linalg.norm((C_est @ (s * Rs).T + ts) - C_gt, axis=-1)
    # scene scale ~5 units; noisy projections -> centimeter-level centers
    assert err.max() < 0.05, err

    # rotation error after gauge alignment: R_gt ~ R_est @ Rs^T
    for n, (R_gt, _) in zip(names, cams):
        R_est = rec.poses[n][0]
        dR = R_gt @ (np.asarray(R_est) @ Rs.T).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0, (n, ang)


def test_structure_matches_gt(scene):
    names, cams, pts, rec = scene
    # match each estimated point to its track's GT world point via the
    # first observation's keypoint row
    names_, cams_, pts_, K, wh, kpts, vis, order = _make_scene()
    est, gt = [], []
    for pi, tr in enumerate(rec.track_obs):
        nm, ki = tr[0]
        est.append(rec.xyz[pi])
        gt.append(pts_[vis[nm][ki]])
    est, gt = np.array(est), np.array(gt)
    s, Rs, ts = _align_similarity(est, gt)
    err = np.linalg.norm(est @ (s * Rs).T + ts - gt, axis=-1)
    assert np.median(err) < 0.02, np.median(err)


@pytest.mark.slow
def test_sixty_image_scene(tmp_path):
    """The reference's operating envelope (hundreds of exhaustive pairs,
    ref hloc/reconstruction.py:61-100): 60 cameras, 1770 verified pairs.
    Exercises the batched multi-view triangulation + vectorized filtering
    paths at scale (VERDICT round-3 item 10)."""
    names, cams, pts, K, wh, kpts, vis, order = _make_scene(
        n_cams=60, n_pts=400, seed=1)
    db = tmp_path / "database.db"
    _write_db(db, names, K, wh, kpts, order)
    rec = M.incremental_mapping_native(str(db), verbose=False)
    assert rec.num_reg_images() == len(names)
    assert rec.num_points3D() > 200

    C_est = np.array([-(np.asarray(R).T @ t) for R, t in
                      (rec.poses[n] for n in names)])
    C_gt = np.array([-(R.T @ t) for R, t in cams])
    s, Rs, ts = _align_similarity(C_est, C_gt)
    err = np.linalg.norm((C_est @ (s * Rs).T + ts) - C_gt, axis=-1)
    assert err.max() < 0.08, err.max()

    # multi-view triangulation: points carry all-view tracks, and the
    # structure matches GT
    est, gt = [], []
    for pi, tr in enumerate(rec.track_obs):
        nm, ki = tr[0]
        est.append(rec.xyz[pi])
        gt.append(pts[vis[nm][ki]])
    est, gt = np.array(est), np.array(gt)
    s, Rs, ts = _align_similarity(est, gt)
    err = np.linalg.norm(est @ (s * Rs).T + ts - gt, axis=-1)
    assert np.median(err) < 0.02, np.median(err)


def test_text_model_written(scene, tmp_path):
    names, cams, pts, rec = scene
    rec.write_text(str(tmp_path))
    imgs = (tmp_path / "images.txt").read_text()
    assert all(n in imgs for n in names)
    n_pts = sum(1 for line in
                (tmp_path / "points3D.txt").read_text().splitlines()
                if line and not line.startswith("#"))
    assert n_pts == rec.num_points3D()
