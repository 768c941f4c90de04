"""Full reconstruction driver E2E on generated imagery (VERDICT round-2
item 10): render a true 3D two-plane scene from 4 known camera poses, run
the REAL driver (gim_tpu.hloc.reconstruction.main: exhaustive pairs ->
root_sift dense-path matching -> cell quantization -> canonical keypoints
-> COLMAP db with on-chip geometric verification), then known-pose
triangulation (ref hloc/triangulation.py), asserting the recovered 3D
points land on the two ground-truth planes. pycolmap stays gated (absent
here); the batched-DLT fallback triangulates."""

import os
from os.path import join

import h5py
import numpy as np
import pytest


F, W, H = 520.0, 640, 480
N1 = np.array([0.05, 0.02, -1.0])
N2 = np.array([-0.03, 0.06, -1.0])
D1, D2 = 4.0, 7.5


def _rotmat_to_qvec(R):
    import cv2

    rvec = cv2.Rodrigues(R)[0].ravel()
    ang = np.linalg.norm(rvec)
    if ang < 1e-12:
        return np.array([1.0, 0, 0, 0])
    axis = rvec / ang
    return np.array([np.cos(ang / 2), *(np.sin(ang / 2) * axis)])


def _render_scene(scene_dir, model_dir):
    """4 views of the rigid two-plane scene; cam0 = world. Writes
    images/ + a COLMAP text reference model with the TRUE poses."""
    import cv2

    from gim_tpu.data.synthetic import _texture, render_frame

    img_dir = join(scene_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(model_dir, exist_ok=True)
    rng = np.random.default_rng(42)
    base = _texture(rng, H, W)
    K = np.array([[F, 0, W / 2], [0, F, H / 2], [0, 0, 1.0]])

    poses = [
        (np.zeros(3), np.zeros(3)),
        (np.array([0.02, -0.06, 0.01]), np.array([0.55, 0.05, 0.05])),
        (np.array([-0.03, 0.05, -0.02]), np.array([-0.5, 0.1, 0.08])),
        (np.array([0.04, 0.02, 0.03]), np.array([0.2, -0.45, 0.12])),
    ]
    names = []
    with open(join(model_dir, "cameras.txt"), "w") as fh:
        fh.write("# cameras\n")
        fh.write(f"1 PINHOLE {W} {H} {F} {F} {W / 2} {H / 2}\n")
    with open(join(model_dir, "images.txt"), "w") as fh:
        fh.write("# images\n")
        for i, (rvec, t) in enumerate(poses):
            frame = render_frame(base, K, rvec, t, N1, N2, W, H)
            name = f"view{i}.png"
            cv2.imwrite(join(img_dir, name), frame[..., ::-1])
            R = cv2.Rodrigues(rvec)[0]
            q = _rotmat_to_qvec(R)
            fh.write(f"{i + 1} {q[0]} {q[1]} {q[2]} {q[3]} "
                     f"{t[0]} {t[1]} {t[2]} 1 {name}\n\n")
            names.append(name)
    return names


def _plane_residual(X):
    n1 = N1 / np.linalg.norm(N1)
    n2 = N2 / np.linalg.norm(N2)
    r1 = np.abs(X @ n1 - (-D1))
    r2 = np.abs(X @ n2 - (-D2))
    return np.minimum(r1, r2)


@pytest.mark.slow
def test_reconstruction_driver_recovers_plane_structure(tmp_path):
    scene = str(tmp_path / "scene")
    model_dir = str(tmp_path / "ref_model")
    names = _render_scene(scene, model_dir)

    from gim_tpu.hloc import reconstruction as R
    from gim_tpu.hloc import triangulation as T
    from gim_tpu.hloc.pipeline import names_to_pair

    out_dir = str(tmp_path / "out")
    R.main(["--scene_dir", scene, "--model", "root_sift",
            "--out_dir", out_dir])
    assert os.path.exists(join(out_dir, "database.db"))

    # read the driver's canonical keypoints + matches back
    kpts, matches, pairs = {}, {}, []
    with h5py.File(join(out_dir, "features.h5"), "r") as fd:
        for n in names:
            kpts[n] = fd[n]["keypoints"][...]
            assert len(kpts[n]) > 100, (n, len(kpts[n]))
    with h5py.File(join(out_dir, "matches.h5"), "r") as fd:
        for a in range(len(names)):
            for b in range(a + 1, len(names)):
                key = names_to_pair(names[a], names[b])
                if key in fd:
                    m = fd[key]["matches"][...]
                    if len(m):
                        pairs.append((names[a], names[b]))
                        matches[(names[a], names[b])] = m
    assert len(pairs) >= 5, pairs

    sfm = str(tmp_path / "sfm")
    xyz, ok, errs = T.main(sfm, model_dir, join(scene, "images"),
                           pairs, kpts, matches)
    assert int(ok.sum()) > 100, int(ok.sum())
    res = _plane_residual(xyz[ok])
    # recovered structure must BE the two planes (depths 4 / 7.5; cell
    # quantization max_error 2px adds up to ~0.3 depth noise at this
    # baseline); and both planes must be populated
    assert np.median(res) < 0.3, float(np.median(res))
    n1 = N1 / np.linalg.norm(N1)
    on1 = np.abs(xyz[ok] @ n1 - (-D1)) < 0.5
    assert 0.1 < on1.mean() < 0.95, float(on1.mean())
