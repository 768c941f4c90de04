"""Why does the learned DKM get Bef.Prec 0.78 but AUC@5 0.03?

Signature in the r5 learned-loop dump: R_errs ~3 deg, t_errs ~36 deg,
Aft.Prec 0.95+ — accurate matches, degenerate translation. Suspected:
matches concentrated on ONE plane of the two-plane synthetic scene
(planar degeneracy leaves t poorly constrained). This loads the learned
ckpt, runs the EXACT eval path on a few pairs, and reports per-plane
match counts, per-plane epipolar precision, and pose errors from
all/left-plane/right-plane subsets.

Run: nice -n 19 python tools/diag_dkm_auc.py   (JAX_PLATFORMS=cpu ok)
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np

CKPT = os.environ.get("CKPT", "/root/repo/.loopwork/ckpt_gim_dkm")
N_PAIRS = int(os.environ.get("N_PAIRS", "3"))
IMG = int(os.environ.get("IMG", "840"))


def main():
    import jax
    import jax.numpy as jnp

    from gim_tpu import data
    from gim_tpu.cli.zeb_eval import build_matcher
    from gim_tpu.data import zeb as Z
    from gim_tpu.data.synthetic import write_synthetic_benchmark
    from gim_tpu.eval.zeb import identifier_key, pair_metrics
    from gim_tpu.geometry.epipolar import (essential_from_pose,
                                           symmetric_epipolar_distance)

    root = "/tmp/diag_dkm_auc_bench"
    write_synthetic_benchmark(root, n_pairs=N_PAIRS, seed=0)
    pairs = Z.load_benchmark(root, "GL3D", N_PAIRS)
    print(f"{len(pairs)} pairs; ckpt {CKPT}", flush=True)
    match = build_matcher("gim_dkm", CKPT, IMG, "float32")

    for pair in pairs[:N_PAIRS]:
        batch = Z.batch_pairs([Z.load_pair_images(pair, IMG, 8, "pad")])
        res = match(batch)
        k0 = np.asarray(res.kpts0[0])
        k1 = np.asarray(res.kpts1[0])
        v = np.asarray(res.valid[0])
        k0v, k1v = k0[v], k1[v]
        K0 = jnp.asarray(batch["K0"])
        T = jnp.asarray(batch["T_0to1"])
        E = essential_from_pose(T)
        epi = np.asarray(symmetric_epipolar_distance(
            jnp.asarray(k0[None]), jnp.asarray(k1[None]), E, K0,
            jnp.asarray(batch["K1"])))[0][v]
        W = 640  # make_pair original width; plane split at W/2
        left = k0v[:, 0] < W / 2
        print(f"\n{pair.identifier}: {v.sum()} matches | "
              f"left {left.sum()} right {(~left).sum()}", flush=True)
        print(f"  epi<5e-4: all {np.mean(epi < 5e-4):.3f} "
              f"left {np.mean(epi[left] < 5e-4) if left.any() else -1:.3f} "
              f"right {np.mean(epi[~left] < 5e-4) if (~left).any() else -1:.3f}")
        xs = k0v[:, 0]
        ys = k0v[:, 1]
        print(f"  kpts0 x: [{xs.min():.0f},{xs.max():.0f}] "
              f"median {np.median(xs):.0f}; y: [{ys.min():.0f},{ys.max():.0f}]")

        keys = jnp.asarray(np.stack([identifier_key(pair.identifier)]))
        for tag, sel in [("all", np.ones(len(k0), bool)),
                         ("left", (k0[:, 0] < W / 2)),
                         ("right", (k0[:, 0] >= W / 2))]:
            vv = jnp.asarray(v & sel)
            if int(np.asarray(vv).sum()) < 8:
                print(f"  pose[{tag}]: too few")
                continue
            m = pair_metrics(res.kpts0, res.kpts1, vv[None], K0,
                             jnp.asarray(batch["K1"]), T, keys, 0.5, 2048,
                             conf=res.conf)
            print(f"  pose[{tag}]: R {float(m['R_errs'][0]):.2f} "
                  f"t {float(m['t_errs'][0]):.2f} "
                  f"t2 {float(m['t_errs2'][0]):.4f} "
                  f"inl {int(np.asarray(m['inliers'][0]).sum())}")


if __name__ == "__main__":
    main()
