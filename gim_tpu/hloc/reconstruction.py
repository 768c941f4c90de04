"""3D reconstruction driver (ref reconstruction.py:56-136 +
hloc/reconstruction.py:15-135 + hloc/triangulation.py import steps).

Pipeline: exhaustive pairs -> (optional) segmentation masks -> dense
(gim_dkm) or sparse (gim_lightglue) matching -> COLMAP database -> on-chip
two-view geometric verification (replacing COLMAP's host RANSAC) ->
pycolmap incremental mapping when available (SfM itself stays host C++,
out of model scope per SURVEY §2.9).
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import numpy as np


def geometric_verification_onchip(kpts0, kpts1, matches, key=None,
                                  thresh_px: float = 1.0,
                                  num_hypotheses: int = 2048):
    """Fundamental RANSAC on matched keypoints, on-chip. Returns inlier
    mask over `matches` rows."""
    import jax
    import jax.numpy as jnp

    from gim_tpu.geometry.ransac import ransac

    if len(matches) < 8:
        return np.zeros(len(matches), bool)
    p0 = kpts0[matches[:, 0]]
    p1 = kpts1[matches[:, 1]]
    M = 1 << int(np.ceil(np.log2(max(len(p0), 8))))
    pad = M - len(p0)
    p0p = np.pad(p0, ((0, pad), (0, 0)))
    p1p = np.pad(p1, ((0, pad), (0, 0)))
    valid = np.zeros(M, bool)
    valid[:len(p0)] = True
    res = ransac(jnp.asarray(p0p, jnp.float32), jnp.asarray(p1p, jnp.float32),
                 jnp.asarray(valid), key or jax.random.PRNGKey(0),
                 thresh_px, model_kind="fundamental",
                 num_hypotheses=num_hypotheses)
    return np.asarray(res.inliers)[:len(p0)]


def build_database(db_path: str, image_dir: str, names: list[str],
                   feature_path: str, match_path: str,
                   shared_camera: bool = True, verify: bool = True):
    """Create COLMAP db with features + verified matches
    (ref hloc/reconstruction.py:16-58 incl. unique_camera_ids forcing a
    shared camera :51-58)."""
    import cv2
    import h5py

    from gim_tpu.hloc.database import ColmapDB

    db = ColmapDB(db_path)
    image_ids = {}
    cam_id = None
    for name in names:
        img = cv2.imread(join(image_dir, name))
        h, w = img.shape[:2]
        if cam_id is None or not shared_camera:
            # SIMPLE_RADIAL (model 2): f, cx, cy, k
            cam_id = db.add_camera(2, w, h,
                                   np.array([1.2 * max(w, h), w / 2, h / 2,
                                             0.0]))
        image_ids[name] = db.add_image(name, cam_id)

    with h5py.File(feature_path, "r") as fd:
        kpts = {n: fd[n]["keypoints"][...] for n in names}
        for name in names:
            db.add_keypoints(image_ids[name], kpts[name] + 0.5)

    with h5py.File(match_path, "r") as fd:
        # names_to_pair keys are 'name0/name1' -> h5 nests them two deep
        for n0 in fd:
            for n1 in fd[n0]:
                grp = fd[n0][n1]
                if "matches" in grp:
                    m = grp["matches"][...]
                else:  # sparse layout: matches0 per-kpt partner
                    m0 = grp["matches0"][...]
                    sel = m0 >= 0
                    m = np.stack([np.nonzero(sel)[0], m0[sel]], axis=1)
                _db_add_pair(db, image_ids, kpts, n0, n1, m, verify)
    db.close()
    return image_ids


def _db_add_pair(db, image_ids, kpts, n0, n1, m, verify):
    db.add_matches(image_ids[n0], image_ids[n1], m)
    if verify and len(m) >= 8:
        inl = geometric_verification_onchip(kpts[n0], kpts[n1], m)
        db.add_two_view_geometry(image_ids[n0], image_ids[n1],
                                 m[inl], config=3)
    else:
        db.add_two_view_geometry(image_ids[n0], image_ids[n1], m,
                                 config=3)


def incremental_mapping(db_path: str, image_dir: str, out_dir: str):
    """Incremental SfM, largest model kept (ref
    hloc/reconstruction.py:61-100). Uses pycolmap when present (exact
    reference behavior); otherwise runs the native batched mapper
    (gim_tpu/hloc/mapper.py) and writes the same COLMAP text-model
    artifacts."""
    try:
        import pycolmap
    except ImportError:
        from gim_tpu.hloc.mapper import incremental_mapping_native

        print("[reconstruction] pycolmap not installed - running the "
              "native incremental mapper")
        os.makedirs(out_dir, exist_ok=True)
        return incremental_mapping_native(db_path, out_dir=join(out_dir, "0"))
    os.makedirs(out_dir, exist_ok=True)
    maps = pycolmap.incremental_mapping(db_path, image_dir, out_dir)
    if not maps:
        return None
    best = max(maps, key=lambda i: maps[i].num_reg_images())
    return maps[best]


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--scene_dir", required=True,
                   help="dir with images/ subdir")
    p.add_argument("--out_dir", default=None)
    p.add_argument("--model", default="gim_dkm",
                   choices=["gim_dkm", "gim_lightglue", "root_sift"])
    p.add_argument("--ckpt", default=None)
    args = p.parse_args(argv)

    from gim_tpu.api import Matcher
    from gim_tpu.hloc import pipeline as P

    image_dir = join(args.scene_dir, "images")
    out_dir = args.out_dir or join(args.scene_dir, "outputs", args.model)
    os.makedirs(out_dir, exist_ok=True)
    names = P.list_images(image_dir)
    pairs = P.pairs_from_exhaustive(names)
    print(f"[reconstruction] {len(names)} images, {len(pairs)} pairs")

    feature_path = join(out_dir, "features.h5")
    match_path = join(out_dir, "matches.h5")
    matcher = (Matcher.from_checkpoint(args.model, args.ckpt) if args.ckpt
               else Matcher(args.model))
    if args.model in ("gim_dkm", "root_sift"):
        # root_sift rides the dense path: its matches have no repeatable
        # detector ids either, so they go through the same cell
        # quantization -> canonical-keypoint aggregation (match_dense.py)
        P.match_dense(pairs, image_dir, feature_path, match_path, matcher)
    else:
        P.extract_features(image_dir, names, feature_path, matcher)
        P.match_features(pairs, feature_path, match_path, matcher)

    db_path = join(out_dir, "database.db")
    build_database(db_path, image_dir, names, feature_path, match_path)
    print(f"[reconstruction] wrote {db_path}")
    model = incremental_mapping(db_path, image_dir, join(out_dir, "sfm"))
    if model is not None:
        print(f"[reconstruction] registered {model.num_reg_images()} images")


if __name__ == "__main__":
    main()
