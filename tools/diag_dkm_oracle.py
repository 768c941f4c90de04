"""f64-oracle bound for the DKM B->A half at true eval shapes (r5).

After replicating the reference GP's n>2000 batched-inverse bug, the B->A
half agrees with torch at median 1.2e-7 but p99 1.5e-2 / max 3.5e-2
(coarse 660x880 — tools/diag_dkm_bisect.py). Hypothesis: the buggy path
applies a MISMATCHED K_yy^-1 (cond ~2e4) to the other image's K_xy, so
any two f32 linear-algebra implementations legitimately differ at the
1e-2 scale after refiner amplification. Evidence, LoFTR-840 style: run
the torch reference itself in f32 AND f64 at the same geometry — the
f32-vs-f64 distance is the accumulation floor no reimplementation can
beat.

Run: nice -n 19 python tools/diag_dkm_oracle.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np
import torch

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, "/root/reference")

import ref_shims

ref_shims.install()


def _smooth_noise(rng, h, w):
    import cv2

    img = rng.random((h // 8, w // 8, 3), np.float32)
    img = cv2.resize(img, (w, h), interpolation=cv2.INTER_CUBIC)
    return np.clip(img, 0, 1)


def stats(tag, a, b):
    d = np.abs(a.astype(np.float64) - b.astype(np.float64))
    q = np.quantile(d, [0.5, 0.99])
    print(f"[{tag}] max {d.max():.4g} median {q[0]:.4g} p99 {q[1]:.4g} "
          f"frac>1e-2 {(d > 1e-2).mean():.5f} "
          f"frac>5e-2 {(d > 5e-2).mean():.6f}", flush=True)


def run(dtype):
    torch.manual_seed(5)
    from networks.dkm.models.model_zoo.DKMv3 import DKMv3

    hs, ws = 660, 880
    ref = DKMv3(None, hs, ws, upsample_preds=False)
    ref.h_resized, ref.w_resized = hs, ws
    ref = ref.eval()
    if dtype == "f64":
        ref = ref.double()

    rng = np.random.default_rng(5)
    im0 = _smooth_noise(rng, 1152, 1536)
    im1 = np.roll(im0, (96, 128), axis=(0, 1))
    cast = np.float64 if dtype == "f64" else np.float32
    t0 = torch.from_numpy(im0.transpose(2, 0, 1).astype(cast))[None]
    t1 = torch.from_numpy(im1.transpose(2, 0, 1).astype(cast))[None]
    with torch.no_grad():
        w, c = ref.match(t0, t1, batched=False)
    print(f"[oracle] torch {dtype} coarse done", flush=True)
    return w.numpy(), c.numpy()


if __name__ == "__main__":
    w32, c32 = run("f32")
    w64, c64 = run("f64")
    W = w32.shape[1] // 2
    stats("torch f32 vs f64: A->B warp", w32[:, :W], w64[:, :W])
    stats("torch f32 vs f64: B->A warp", w32[:, W:], w64[:, W:])
    stats("torch f32 vs f64: A->B cert", c32[:, :W], c64[:, :W])
    stats("torch f32 vs f64: B->A cert", c32[:, W:], c64[:, W:])
    np.savez("/tmp/dkm_oracle.npz", w32=w32, w64=w64, c32=c32, c64=c64)
