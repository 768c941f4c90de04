"""Native incremental SfM mapper — the pycolmap-free fallback.

Fills the role of the reference's `pycolmap.incremental_mapping` call
(ref hloc/reconstruction.py:61-100): read the COLMAP database that
`gim_tpu.hloc.reconstruction.build_database` wrote, register images
incrementally, and emit a COLMAP text model. Where COLMAP is sequential
host C++, every solver here is a batched device computation:

- two-view init: the on-chip 5-point essential RANSAC
  (gim_tpu/geometry/ransac.py) via `geometry.pose.estimate_pose`;
- registration: PnP RANSAC as a bank of 6-point DLT hypotheses solved in
  one batched (H, 12, 12) eigendecomposition;
- triangulation: batched multi-view DLT (hloc/triangulation.py);
- bundle adjustment: resection-intersection — alternating batched
  per-camera 6x6 and per-point 3x3 damped Gauss-Newton solves assembled
  with `segment_sum` over the observation list. No host sparse Schur
  factorization: two dense batched solves are the shape the hardware
  wants, and per-camera / per-point subproblems are exactly independent.

Scale note: this mapper targets the hloc driver's scene sizes (tens of
images). Observation/point counts are padded to power-of-two buckets so
the jitted BA step compiles once per bucket, not once per registration.
"""

from __future__ import annotations

import functools
import os
import sqlite3
from os.path import join

import jax
import numpy as np

from gim_tpu.hloc.database import MAX_IMAGE_ID


# ---------------------------------------------------------------------------
# database reading (inverse of gim_tpu/hloc/database.py writers)
# ---------------------------------------------------------------------------

def read_database(db_path: str):
    """Return (cameras, images, kpts, pairs) from a COLMAP sqlite db.

    cameras: {camera_id: dict(model, width, height, params)}
    images:  {name: dict(image_id, camera_id)}
    kpts:    {name: (N, 2) float32 pixel coords (COLMAP +0.5 removed)}
    pairs:   {(name0, name1): (M, 2) uint32 verified match indices}
             (from two_view_geometries; falls back to raw matches rows)
    """
    con = sqlite3.connect(db_path)
    cameras = {}
    for cid, model, w, h, params in con.execute(
            "SELECT camera_id, model, width, height, params FROM cameras"):
        cameras[cid] = {"model": model, "width": w, "height": h,
                        "params": np.frombuffer(params, np.float64).copy()}
    images, id_to_name = {}, {}
    for iid, name, cid in con.execute(
            "SELECT image_id, name, camera_id FROM images"):
        images[name] = {"image_id": iid, "camera_id": cid}
        id_to_name[iid] = name
    kpts = {}
    for iid, rows, cols, data in con.execute(
            "SELECT image_id, rows, cols, data FROM keypoints"):
        arr = np.frombuffer(data, np.float32).reshape(rows, cols)
        kpts[id_to_name[iid]] = arr[:, :2] - 0.5
    pairs = {}
    table_rows = list(con.execute(
        "SELECT pair_id, rows, data FROM two_view_geometries"))
    if not table_rows:
        table_rows = list(con.execute(
            "SELECT pair_id, rows, data FROM matches"))
    for pair_id, rows, data in table_rows:
        if rows == 0 or data is None:
            continue
        i1, i2 = divmod(pair_id, MAX_IMAGE_ID)
        m = np.frombuffer(data, np.uint32).reshape(rows, 2)
        pairs[(id_to_name[i1], id_to_name[i2])] = m.copy()
    con.close()
    return cameras, images, kpts, pairs


def camera_K(cam: dict) -> np.ndarray:
    """Intrinsics from the COLMAP camera models build_database emits
    (SIMPLE_PINHOLE=0, PINHOLE=1, SIMPLE_RADIAL=2; distortion ignored —
    the db writer sets k=0)."""
    p = cam["params"]
    if cam["model"] == 1:                       # PINHOLE fx fy cx cy
        fx, fy, cx, cy = p[:4]
    else:                                       # f cx cy [k]
        fx = fy = p[0]
        cx, cy = p[1], p[2]
    return np.array([[fx, 0, cx], [0, fy, cy], [0, 0, 1]], np.float64)


# ---------------------------------------------------------------------------
# SO(3) helpers
# ---------------------------------------------------------------------------

def so3_exp(w):
    """Batched Rodrigues: (..., 3) axis-angle -> (..., 3, 3)."""
    import jax.numpy as jnp

    th = jnp.linalg.norm(w, axis=-1, keepdims=True)
    th = jnp.maximum(th, 1e-12)
    k = w / th
    th = th[..., None]
    K = jnp.zeros(w.shape[:-1] + (3, 3), w.dtype)
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    K = K.at[..., 0, 1].set(-kz).at[..., 0, 2].set(ky)
    K = K.at[..., 1, 0].set(kz).at[..., 1, 2].set(-kx)
    K = K.at[..., 2, 0].set(-ky).at[..., 2, 1].set(kx)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), K.shape)
    return eye + jnp.sin(th) * K + (1 - jnp.cos(th)) * (K @ K)


def rotmat_to_qvec(R: np.ndarray) -> np.ndarray:
    """(3,3) -> COLMAP qvec (w, x, y, z)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        q = np.array([0.25 * s, (R[2, 1] - R[1, 2]) / s,
                      (R[0, 2] - R[2, 0]) / s, (R[1, 0] - R[0, 1]) / s])
    else:
        i = int(np.argmax(np.diag(R)))
        j, k = (i + 1) % 3, (i + 2) % 3
        s = np.sqrt(max(R[i, i] - R[j, j] - R[k, k] + 1.0, 1e-12)) * 2
        q = np.zeros(4)
        q[0] = (R[k, j] - R[j, k]) / s
        q[1 + i] = 0.25 * s
        q[1 + j] = (R[j, i] + R[i, j]) / s
        q[1 + k] = (R[k, i] + R[i, k]) / s
    return q / np.linalg.norm(q)


# ---------------------------------------------------------------------------
# PnP RANSAC (batched 6-point DLT hypothesis bank)
# ---------------------------------------------------------------------------

def _pnp_rows(X, uv):
    """DLT rows for P=[R|t] on K-normalized points. X: (..., n, 3),
    uv: (..., n, 2) -> (..., 2n, 12)."""
    import jax.numpy as jnp

    Xh = jnp.concatenate([X, jnp.ones_like(X[..., :1])], -1)   # (..., n, 4)
    z = jnp.zeros_like(Xh)
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    r0 = jnp.concatenate([Xh, z, -u * Xh], -1)                 # (..., n, 12)
    r1 = jnp.concatenate([z, Xh, -v * Xh], -1)
    return jnp.concatenate([r0, r1], -2)


@functools.partial(jax.jit, static_argnames=("num_hypotheses",))
def _pnp_ransac_device(X, uv, w, key, thresh, num_hypotheses=512):
    """Batched PnP RANSAC on K-normalized observations.

    X: (N, 3) float32 (padded), uv: (N, 2), w: (N,) 1/0 validity.
    Returns (R (3,3), t (3,), inliers (N,), num_inliers ())."""
    import jax
    import jax.numpy as jnp

    N = X.shape[0]
    H = num_hypotheses

    # 6-point samples: independent uniform draws re-weighted to valid rows
    # (duplicate-index hypotheses just produce a rank-deficient A whose
    # nullspace model scores poorly — same treatment as ransac.py)
    logits = jnp.where(w > 0, 0.0, -1e9)
    idx = jax.random.categorical(key, logits[None, :], shape=(H, 6))
    # take_along_axis row gathers (flat jnp.take scalarizes on TPU,
    # docs/PERF.md gather-purge notes)
    fidx = idx.reshape(-1, 1)
    Xs = jnp.take_along_axis(X, fidx, axis=0).reshape(H, 6, 3)
    uvs = jnp.take_along_axis(uv, fidx, axis=0).reshape(H, 6, 2)

    A = _pnp_rows(Xs, uvs)                                     # (H, 12, 12)
    AtA = jnp.einsum("hri,hrj->hij", A, A)
    # smallest eigenvector of the 12x12 normal matrix = DLT nullspace.
    # eigh on (H, 12, 12) is tiny and off the hot path (once per
    # registered image), so the batched LAPACK/XLA path is acceptable.
    _, vecs = jnp.linalg.eigh(AtA)
    P = vecs[..., 0].reshape(H, 3, 4)

    # orthonormalize: P = s * [R|t] up to sign. Procrustes via SVD(3x3).
    M = P[:, :, :3]
    U, S, Vt = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt)
    D = jnp.stack([jnp.ones_like(detUV), jnp.ones_like(detUV), detUV], -1)
    R = U @ (D[..., None] * Vt)                                # (H, 3, 3)
    s = jnp.mean(S, -1) * jnp.sign(detUV)                      # signed scale
    t = P[:, :, 3] / jnp.where(jnp.abs(s) < 1e-12, 1e-12, s)[:, None]

    # score every hypothesis against all observations
    y = jnp.einsum("hij,nj->hni", R, X) + t[:, None]           # (H, N, 3)
    z = y[..., 2]
    pr = y[..., :2] / jnp.where(jnp.abs(z[..., None]) < 1e-9, 1e-9,
                                z[..., None])
    err = jnp.linalg.norm(pr - uv[None], axis=-1)
    inl = (err < thresh) & (z > 1e-6) & (w[None] > 0)
    # flip-sign cheirality: if most points are behind, -P was the model
    scores = inl.sum(-1)
    best = jnp.argmax(scores)
    Rb, tb = R[best], t[best]
    inl_b = inl[best]

    # GN refinement on se3 over the inliers (5 damped iterations)
    def step(carry, _):
        Rc, tc = carry
        y = X @ Rc.T + tc                                      # (N, 3)
        z = jnp.maximum(y[:, 2], 1e-9)
        pr = y[:, :2] / z[:, None]
        r = (pr - uv) * inl_b[:, None]                         # (N, 2)
        iz = 1.0 / z
        Jx = jnp.stack([
            jnp.stack([iz, jnp.zeros_like(iz), -pr[:, 0] * iz], -1),
            jnp.stack([jnp.zeros_like(iz), iz, -pr[:, 1] * iz], -1),
        ], 1)                                                  # (N, 2, 3)
        yx = jnp.zeros((N, 3, 3), X.dtype)
        yx = yx.at[:, 0, 1].set(-y[:, 2]).at[:, 0, 2].set(y[:, 1])
        yx = yx.at[:, 1, 0].set(y[:, 2]).at[:, 1, 2].set(-y[:, 0])
        yx = yx.at[:, 2, 0].set(-y[:, 1]).at[:, 2, 1].set(y[:, 0])
        Jw = -jnp.einsum("nij,njk->nik", Jx, yx)               # (N, 2, 3)
        J = jnp.concatenate([Jw, Jx], -1) * inl_b[:, None, None]
        Hm = jnp.einsum("nri,nrj->ij", J, J) + 1e-8 * jnp.eye(6)
        g = jnp.einsum("nri,nr->i", J, r)
        d = jnp.linalg.solve(Hm, -g)
        return (so3_exp(d[:3]) @ Rc, tc + d[3:]), None

    (Rb, tb), _ = jax.lax.scan(step, (Rb, tb), None, length=5)
    y = X @ Rb.T + tb
    z = y[:, 2]
    pr = y[:, :2] / jnp.where(jnp.abs(z[:, None]) < 1e-9, 1e-9, z[:, None])
    err = jnp.linalg.norm(pr - uv, axis=-1)
    inl_b = (err < thresh) & (z > 1e-6) & (w > 0)
    return Rb, tb, inl_b, inl_b.sum()


def pnp_ransac(X: np.ndarray, uv_norm: np.ndarray, key,
               thresh: float, num_hypotheses: int = 512):
    """Host wrapper: pad N to a power of two, run the device RANSAC."""
    import jax.numpy as jnp

    n = len(X)
    N = 1 << int(np.ceil(np.log2(max(n, 8))))
    Xp = np.zeros((N, 3), np.float32)
    uvp = np.zeros((N, 2), np.float32)
    w = np.zeros(N, np.float32)
    Xp[:n], uvp[:n], w[:n] = X, uv_norm, 1.0
    R, t, inl, ninl = _pnp_ransac_device(
        jnp.asarray(Xp), jnp.asarray(uvp), jnp.asarray(w), key,
        thresh, num_hypotheses=num_hypotheses)
    return (np.asarray(R, np.float64), np.asarray(t, np.float64),
            np.asarray(inl)[:n], int(ninl))


# ---------------------------------------------------------------------------
# resection-intersection bundle adjustment
# ---------------------------------------------------------------------------

@functools.partial(jax.jit, static_argnames=("iters",))
def _ba_steps(R, t, X, cam_idx, pt_idx, uv, w, cam_free, iters=12,
              lam=1e-3):
    """Alternating batched GN. R: (C,3,3), t: (C,3), X: (P,3);
    observations cam_idx/pt_idx/uv/w: (O,) / (O,) / (O,2) / (O,).
    cam_free: (C,) 0/1 — gauge-fixed cameras get no update."""
    import jax
    import jax.numpy as jnp

    C, P = R.shape[0], X.shape[0]

    def residual_jac(R, t, X):
        y = jnp.einsum("oij,oj->oi", R[cam_idx], X[pt_idx]) + t[cam_idx]
        z = jnp.maximum(y[:, 2], 1e-6)
        pr = y[:, :2] / z[:, None]
        ww = w * (y[:, 2] > 1e-6)
        r = (pr - uv) * ww[:, None]
        iz = 1.0 / z
        Jx = jnp.stack([
            jnp.stack([iz, jnp.zeros_like(iz), -pr[:, 0] * iz], -1),
            jnp.stack([jnp.zeros_like(iz), iz, -pr[:, 1] * iz], -1),
        ], 1)                                                  # (O, 2, 3)
        return y, r, Jx * ww[:, None, None]

    def body(_, carry):
        R, t, X = carry

        # --- resection: per-camera 6x6 GN (points fixed) ---
        y, r, Jx = residual_jac(R, t, X)
        yx = jnp.zeros(y.shape[:1] + (3, 3), y.dtype)
        yx = yx.at[:, 0, 1].set(-y[:, 2]).at[:, 0, 2].set(y[:, 1])
        yx = yx.at[:, 1, 0].set(y[:, 2]).at[:, 1, 2].set(-y[:, 0])
        yx = yx.at[:, 2, 0].set(-y[:, 1]).at[:, 2, 1].set(y[:, 0])
        Jc = jnp.concatenate([-jnp.einsum("oij,ojk->oik", Jx, yx), Jx], -1)
        Hc = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jc, Jc),
                                 cam_idx, num_segments=C)
        gc = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jc, r),
                                 cam_idx, num_segments=C)
        diag = jnp.eye(6) * (lam * jnp.einsum("cii->c", Hc)[:, None, None]
                             / 6.0 + 1e-9)
        d = jnp.linalg.solve(Hc + diag, -gc[..., None])[..., 0]   # (C, 6)
        d = d * cam_free[:, None]
        R = so3_exp(d[:, :3]) @ R
        t = t + d[:, 3:]

        # --- intersection: per-point 3x3 GN (cameras fixed) ---
        _, r, Jx = residual_jac(R, t, X)
        Jp = jnp.einsum("oij,ojk->oik", Jx, R[cam_idx])        # (O, 2, 3)
        Hp = jax.ops.segment_sum(jnp.einsum("ori,orj->oij", Jp, Jp),
                                 pt_idx, num_segments=P)
        gp = jax.ops.segment_sum(jnp.einsum("ori,or->oi", Jp, r),
                                 pt_idx, num_segments=P)
        diagp = jnp.eye(3) * (lam * jnp.einsum("pii->p", Hp)[:, None, None]
                              / 3.0 + 1e-9)
        dX = jnp.linalg.solve(Hp + diagp, -gp[..., None])[..., 0]
        # points with < 2 observations are unconstrained: leave them
        nobs = jax.ops.segment_sum(w, pt_idx, num_segments=P)
        X = X + dX * (nobs >= 2)[:, None]
        return R, t, X

    return jax.lax.fori_loop(0, iters, body, (R, t, X))


def _pow2(n: int, lo: int = 8) -> int:
    return 1 << int(np.ceil(np.log2(max(n, lo))))


def bundle_adjust(poses: dict, X: np.ndarray, obs: list, iters: int = 12):
    """poses: {name: [R (3,3), t (3,)]} (mutated in place); X: (P, 3)
    (returned updated); obs: list of (name, point_index, uv_normalized).
    The first pose in insertion order is gauge-fixed."""
    import jax.numpy as jnp

    names = list(poses.keys())
    cmap = {n: i for i, n in enumerate(names)}
    C, P, O = len(names), len(X), len(obs)
    if O == 0 or P == 0:
        return X
    Cp, Pp, Op = _pow2(C, 2), _pow2(P), _pow2(O)

    Rb = np.tile(np.eye(3, dtype=np.float32), (Cp, 1, 1))
    tb = np.zeros((Cp, 3), np.float32)
    for n, (R, t) in poses.items():
        Rb[cmap[n]], tb[cmap[n]] = R, t
    Xb = np.zeros((Pp, 3), np.float32)
    Xb[:P] = X
    ci = np.zeros(Op, np.int32)
    pi = np.zeros(Op, np.int32)
    uv = np.zeros((Op, 2), np.float32)
    w = np.zeros(Op, np.float32)
    for o, (n, p, xy) in enumerate(obs):
        ci[o], pi[o], uv[o], w[o] = cmap[n], p, xy, 1.0
    free = np.ones(Cp, np.float32)
    free[0] = 0.0                                   # gauge: fix first camera
    free[C:] = 0.0
    Rn, tn, Xn = _ba_steps(jnp.asarray(Rb), jnp.asarray(tb),
                           jnp.asarray(Xb), jnp.asarray(ci),
                           jnp.asarray(pi), jnp.asarray(uv),
                           jnp.asarray(w), jnp.asarray(free), iters=iters)
    Rn, tn, Xn = np.asarray(Rn, np.float64), np.asarray(tn, np.float64), \
        np.asarray(Xn, np.float64)
    for n in names:
        poses[n] = [Rn[cmap[n]], tn[cmap[n]]]
    return Xn[:P]


# ---------------------------------------------------------------------------
# the incremental mapper
# ---------------------------------------------------------------------------

class NativeReconstruction:
    """Minimal pycolmap.Reconstruction analog: registered poses + points,
    COLMAP text-model output."""

    def __init__(self, cameras: dict, images: dict):
        self.cameras = cameras                       # camera_id -> dict
        self.images = images                         # name -> db row
        self.poses: dict[str, list] = {}             # name -> [R, t]
        self.xyz = np.zeros((0, 3))
        self.track_obs: list[list] = []              # per point: (name, kid)

    def num_reg_images(self) -> int:
        return len(self.poses)

    def num_points3D(self) -> int:
        return len(self.xyz)

    def write_text(self, out_dir: str):
        os.makedirs(out_dir, exist_ok=True)
        with open(join(out_dir, "cameras.txt"), "w") as f:
            f.write("# camera_id model w h params\n")
            names = {0: "SIMPLE_PINHOLE", 1: "PINHOLE", 2: "SIMPLE_RADIAL"}
            for cid, cam in self.cameras.items():
                ps = " ".join(f"{p:.6f}" for p in cam["params"])
                f.write(f"{cid} {names.get(cam['model'], cam['model'])} "
                        f"{cam['width']} {cam['height']} {ps}\n")
        with open(join(out_dir, "images.txt"), "w") as f:
            f.write("# image_id qw qx qy qz tx ty tz camera_id name\n")
            for name, (R, t) in self.poses.items():
                q = rotmat_to_qvec(R)
                row = self.images[name]
                f.write(f"{row['image_id']} "
                        + " ".join(f"{v:.8f}" for v in q) + " "
                        + " ".join(f"{v:.8f}" for v in t)
                        + f" {row['camera_id']} {name}\n\n")
        with open(join(out_dir, "points3D.txt"), "w") as f:
            f.write("# point3D_id x y z r g b error track\n")
            for i, p in enumerate(self.xyz):
                f.write(f"{i + 1} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                        f"128 128 128 0.0\n")


def _triangulate_two(P0, P1, uv0, uv1):
    """Batched two-view DLT. P: (3,4) K-normalized projection,
    uv: (n, 2) normalized coords -> (n, 3)."""
    n = len(uv0)
    A = np.zeros((n, 4, 4), np.float64)
    A[:, 0] = uv0[:, 0, None] * P0[2] - P0[0]
    A[:, 1] = uv0[:, 1, None] * P0[2] - P0[1]
    A[:, 2] = uv1[:, 0, None] * P1[2] - P1[0]
    A[:, 3] = uv1[:, 1, None] * P1[2] - P1[1]
    _, _, vt = np.linalg.svd(A)
    X = vt[:, -1]
    return X[:, :3] / np.where(np.abs(X[:, 3:]) < 1e-12, 1e-12, X[:, 3:])


def _triangulate_multiview(Ps, uvs, w):
    """Batched MULTI-VIEW DLT (the reference gets this from COLMAP's C++
    IncrementalTriangulator; /root/reference/hloc/reconstruction.py:61-100).
    Ps: (T, M, 3, 4) K-normalized projections, uvs: (T, M, 2) normalized
    coords, w: (T, M) observation mask (rows with w=0 are padding).
    Returns (T, 3); cheirality is checked by the caller."""
    r0 = uvs[..., 0:1] * Ps[:, :, 2, :] - Ps[:, :, 0, :]   # (T, M, 4)
    r1 = uvs[..., 1:2] * Ps[:, :, 2, :] - Ps[:, :, 1, :]
    A = np.concatenate([r0 * w[..., None], r1 * w[..., None]], 1)
    B = A.transpose(0, 2, 1) @ A                            # (T, 4, 4)
    _, vecs = np.linalg.eigh(B)
    Xh = vecs[..., 0]                                       # (T, 4)
    s = Xh[:, 3:]
    s = np.where(np.abs(s) < 1e-12, 1e-12, s)
    return Xh[:, :3] / s


def incremental_mapping_native(db_path: str, out_dir: str | None = None,
                               reproj_thresh_px: float = 4.0,
                               min_pnp_points: int = 8,
                               seed: int = 0,
                               verbose: bool = True):
    """Incremental SfM over a verified-matches COLMAP database.

    Returns a NativeReconstruction (poses are world->camera [R|t],
    COLMAP convention). Writes the text model to `out_dir` if given.
    """
    import jax
    import jax.numpy as jnp

    from gim_tpu.geometry.pose import estimate_pose
    from gim_tpu.hloc.triangulation import build_tracks

    cameras, images, kpts, pairs = read_database(db_path)
    rec = NativeReconstruction(cameras, images)
    if len(pairs) == 0:
        return rec
    Ks = {n: camera_K(cameras[images[n]["camera_id"]]) for n in images}

    # normalized keypoints precomputed once per image (hot in
    # triangulation/filtering inner loops)
    nkpts = {n: ((kpts[n] - Ks[n][[0, 1], [2, 2]]) / Ks[n][[0, 1], [0, 1]])
             if len(kpts[n]) else kpts[n] for n in images}

    def norm(name, idx):
        return nkpts[name][idx]

    # thresholds in normalized coords (per-image mean focal)
    def nthr(name):
        K = Ks[name]
        return reproj_thresh_px / ((K[0, 0] + K[1, 1]) / 2.0)

    # --- correspondence tracks over the verified matches ---
    tracks = build_tracks(list(pairs.keys()), pairs, {})
    # membership: (name, kpt) -> track id
    node_to_track = {}
    for ti, tr in enumerate(tracks):
        for node in tr:
            node_to_track[node] = ti
    track_of = {name: {} for name in images}
    for (name, ki), ti in node_to_track.items():
        track_of[name][ki] = ti

    # --- init pair: most verified matches ---
    init_pair = max(pairs, key=lambda k: len(pairs[k]))
    n0, n1 = init_pair
    m = pairs[init_pair]
    M = 1 << int(np.ceil(np.log2(max(len(m), 8))))
    p0 = np.zeros((M, 2), np.float32)
    p1 = np.zeros((M, 2), np.float32)
    val = np.zeros(M, bool)
    p0[:len(m)] = kpts[n0][m[:, 0]]
    p1[:len(m)] = kpts[n1][m[:, 1]]
    val[:len(m)] = True
    res = estimate_pose(jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(val),
                        jnp.asarray(Ks[n0], jnp.float32),
                        jnp.asarray(Ks[n1], jnp.float32),
                        jax.random.PRNGKey(seed), thresh=1.0)
    if not bool(res["success"]):
        return rec
    R1 = np.asarray(res["R"], np.float64)
    t1 = np.asarray(res["t"], np.float64)
    inl = np.asarray(res["inliers"])[:len(m)]
    rec.poses[n0] = [np.eye(3), np.zeros(3)]
    rec.poses[n1] = [R1, t1]
    if verbose:
        print(f"[mapper] init pair {n0} - {n1}: {int(inl.sum())} inliers")

    # triangulate the init pair's inlier tracks
    point_of_track: dict[int, int] = {}
    P0 = np.concatenate([np.eye(3), np.zeros((3, 1))], 1)
    P1 = np.concatenate([R1, t1[:, None]], 1)
    mi = m[inl]
    uv0 = norm(n0, mi[:, 0])
    uv1 = norm(n1, mi[:, 1])
    X = _triangulate_two(P0, P1, uv0, uv1)
    z0 = X[:, 2]
    z1 = (X @ R1.T + t1)[:, 2]
    keep = (z0 > 1e-6) & (z1 > 1e-6)
    xyz = []
    track_obs = []
    for row, ok in zip(range(len(mi)), keep):
        ti = track_of[n0].get(int(mi[row, 0]))
        if not ok or ti is None or ti in point_of_track:
            continue
        point_of_track[ti] = len(xyz)
        xyz.append(X[row])
        track_obs.append([(nm, ki) for nm, ki in tracks[ti]])
    rec.xyz = np.array(xyz) if xyz else np.zeros((0, 3))
    rec.track_obs = track_obs

    def observations():
        obs = []
        for pi, tr in enumerate(rec.track_obs):
            for nm, ki in tr:
                if nm in rec.poses:
                    obs.append((nm, pi, norm(nm, ki)))
        return obs

    def filter_points():
        """Drop points with bad reprojection in any registered view
        (vectorized over the whole observation set)."""
        if len(rec.xyz) == 0:
            return
        pis, Rs, ts, uvn, thr = [], [], [], [], []
        for pi, tr in enumerate(rec.track_obs):
            for nm, ki in tr:
                if nm not in rec.poses:
                    continue
                R, t = rec.poses[nm]
                pis.append(pi)
                Rs.append(R)
                ts.append(t)
                uvn.append(nkpts[nm][ki])
                thr.append(nthr(nm))
        keep = np.ones(len(rec.xyz), bool)
        if pis:
            pis = np.asarray(pis)
            y = (np.einsum("oij,oj->oi", np.stack(Rs), rec.xyz[pis])
                 + np.stack(ts))
            behind = y[:, 2] < 1e-6
            proj = y[:, :2] / np.where(behind[:, None], 1.0, y[:, 2:])
            err = np.linalg.norm(proj - np.stack(uvn), axis=1)
            keep[pis[behind | (err > np.asarray(thr))]] = False
        if keep.all():
            return
        remap = -np.ones(len(rec.xyz), int)
        remap[keep] = np.arange(int(keep.sum()))
        rec.xyz = rec.xyz[keep]
        rec.track_obs = [tr for tr, k in zip(rec.track_obs, keep) if k]
        for ti in list(point_of_track):
            np_ = remap[point_of_track[ti]]
            if np_ < 0:
                del point_of_track[ti]
            else:
                point_of_track[ti] = int(np_)

    rec.xyz = bundle_adjust(rec.poses, rec.xyz, observations())
    filter_points()

    # registered-observation count per track (drives candidate selection
    # for batched multi-view triangulation)
    reg_count = np.zeros(len(tracks), np.int32)
    for nm in rec.poses:
        for _ki, _ti in track_of[nm].items():
            reg_count[_ti] += 1

    MAX_TRI_OBS = 16   # DLT observation cap per track (memory bound)

    def triangulate_new() -> int:
        """Batched multi-view triangulation of all untriangulated tracks
        with >= 2 registered observations. Returns #points added."""
        untri = np.ones(len(tracks), bool)
        for ti in point_of_track:
            untri[ti] = False
        cand = np.where(untri & (reg_count >= 2))[0]
        if len(cand) == 0:
            return 0
        Pcache = {nm: np.concatenate([R, np.asarray(t).reshape(3, 1)], 1)
                  for nm, (R, t) in rec.poses.items()}
        per_track = [[(nm, ki) for nm, ki in tracks[ti]
                      if nm in rec.poses][:MAX_TRI_OBS] for ti in cand]
        T = len(cand)
        M = max(len(r) for r in per_track)
        P_arr = np.zeros((T, M, 3, 4))
        uv_arr = np.zeros((T, M, 2))
        w_arr = np.zeros((T, M))
        for i, reg in enumerate(per_track):
            for j, (nm, ki) in enumerate(reg):
                P_arr[i, j] = Pcache[nm]
                uv_arr[i, j] = nkpts[nm][ki]
                w_arr[i, j] = 1.0
        X = _triangulate_multiview(P_arr, uv_arr, w_arr)
        # cheirality in EVERY registered view (padding rows exempt)
        z = (np.einsum("tmij,tj->tmi", P_arr[..., :3], X)[..., 2]
             + P_arr[:, :, 2, 3])
        ok = (((z > 1e-6) | (w_arr == 0)).all(1)
              & np.isfinite(X).all(1))
        acc = np.where(ok)[0]
        if len(acc) == 0:
            return 0
        base = len(rec.xyz)
        rec.xyz = (np.concatenate([rec.xyz, X[acc]], 0)
                   if len(rec.xyz) else X[acc])
        for k, i in enumerate(acc):
            ti = int(cand[i])
            point_of_track[ti] = base + k
            rec.track_obs.append(list(tracks[ti]))
        return len(acc)

    # --- incremental registration ---
    key = jax.random.PRNGKey(seed + 1)
    while True:
        # 2D-3D correspondence counts per unregistered image
        best_name, best_c = None, 0
        for name in images:
            if name in rec.poses:
                continue
            c = sum(1 for ki, ti in track_of[name].items()
                    if ti in point_of_track)
            if c > best_c:
                best_name, best_c = name, c
        if best_name is None or best_c < min_pnp_points:
            break
        corr = [(ki, point_of_track[ti])
                for ki, ti in track_of[best_name].items()
                if ti in point_of_track]
        kis = np.array([c[0] for c in corr])
        pis = np.array([c[1] for c in corr])
        key, sk = jax.random.split(key)
        R, t, inl, ninl = pnp_ransac(
            rec.xyz[pis].astype(np.float32), norm(best_name, kis),
            sk, nthr(best_name))
        if ninl < min_pnp_points:
            if verbose:
                print(f"[mapper] {best_name}: PnP failed "
                      f"({ninl}/{len(corr)} inliers) — stopping")
            break
        rec.poses[best_name] = [R, t]
        if verbose:
            print(f"[mapper] registered {best_name}: "
                  f"{ninl}/{len(corr)} PnP inliers")

        # triangulate tracks that now have >= 2 registered observations —
        # multi-view DLT over ALL registered observations (capped), batched
        # across tracks (one eigh over (T, 4, 4) instead of a per-track
        # Python loop)
        for ki, ti in track_of[best_name].items():
            reg_count[ti] += 1
        new_pts = triangulate_new()
        rec.xyz = bundle_adjust(rec.poses, rec.xyz, observations())
        filter_points()
        if verbose:
            print(f"[mapper] +{new_pts} points, total "
                  f"{len(rec.xyz)} after filtering")

    if out_dir is not None:
        rec.write_text(out_dir)
    return rec
