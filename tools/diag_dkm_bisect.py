"""Bisect the DKM true-eval-shape B->A divergence (round-5).

diag_dkm_sensitivity found: at 660x880 -> 1152x1536 two-pass, the A->B
half of the symmetric warp matches torch to ~1e-7 median while the B->A
half is a degenerate near-constant (jax) vs real flow (torch), and torch
is NOT chaotic (1e-6-noise self-sensitivity max 3e-5). This bisects:

  stage 1: coarse-only (upsample_preds=False) at 660x880 — is B->A already
           broken before the second pass?
  stage 2: same at 656x880 (/16-divisible control) — shape-rounding or not?

Run: nice -n 19 python tools/diag_dkm_bisect.py
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
    d = np.abs(a - b)
    q = np.quantile(d, [0.5, 0.99])
    print(f"[{tag}] max {d.max():.4g} median {q[0]:.4g} p99 {q[1]:.4g} "
          f"frac>1e-2 {(d > 1e-2).mean():.5f}", flush=True)


def run_case(hs, ws, img_h, img_w):
    torch.manual_seed(5)
    from networks.dkm.models.model_zoo.DKMv3 import DKMv3

    ref = DKMv3(None, hs, ws, upsample_preds=False)
    ref.h_resized, ref.w_resized = hs, ws
    ref = ref.eval()

    rng = np.random.default_rng(5)
    im0 = _smooth_noise(rng, img_h, img_w)
    im1 = np.roll(im0, (img_h // 12, img_w // 12), axis=(0, 1))
    t0 = torch.from_numpy(im0.transpose(2, 0, 1))[None]
    t1 = torch.from_numpy(im1.transpose(2, 0, 1))[None]
    with torch.no_grad():
        w_ref, c_ref = ref.match(t0, t1, batched=False)
    w_ref = w_ref.numpy()
    c_ref = c_ref.numpy()
    print(f"[bisect] torch coarse {hs}x{ws} done", flush=True)

    import jax.numpy as jnp

    from gim_tpu.weights import port
    from gim_tpu.config import DKMConfig
    from gim_tpu.models.dkm.model import DKMMatcher

    sd = {"model." + k: v.numpy() for k, v in ref.state_dict().items()}
    variables = port.port_dkm(sd)
    cfg = DKMConfig(h_resized=hs, w_resized=ws, upsample_preds=False)
    warp, cert = DKMMatcher(cfg).apply(variables, jnp.asarray(t0.numpy()),
                                       jnp.asarray(t1.numpy()))
    warp = np.asarray(warp[0])
    cert = np.asarray(cert[0])
    print(f"[bisect] jax coarse {hs}x{ws} done", flush=True)
    W = warp.shape[1] // 2
    stats(f"{hs}x{ws} A->B warp", warp[:, :W], w_ref[:, :W])
    stats(f"{hs}x{ws} B->A warp", warp[:, W:], w_ref[:, W:])
    stats(f"{hs}x{ws} A->B cert", cert[:, :W], c_ref[:, :W])
    stats(f"{hs}x{ws} B->A cert", cert[:, W:], c_ref[:, W:])
    np.savez(f"/tmp/dkm_bisect_{hs}x{ws}.npz", warp_jax=warp, cert_jax=cert,
             warp_torch=w_ref, cert_torch=c_ref)


if __name__ == "__main__":
    run_case(660, 880, 1152, 1536)   # true eval coarse geometry
    run_case(656, 880, 1152, 1536)   # /16-divisible control
