"""Decide the DKM true-eval-shape parity bound (VERDICT r3 item 1b).

test_dkm_parity_at_true_eval_resolution fails in max norm (0.197) while
almost all pixels agree to ~1e-5 — the signature of isolated chaotic
pixels, not a systematic port bug. This tool measures, at the exact test
geometry (660x880 coarse, 1152x1536 upsample, seed-5 smooth noise + roll):

1. the torch reference's OWN sensitivity: clean f32 run vs f32 run with
   1e-6-uniform input noise — if isolated pixels move O(0.1) under 1e-6
   input perturbation, a max-norm bound is unachievable for ANY
   reimplementation and the test must use robust statistics;
2. the JAX port vs torch: max / median / p99 / fraction-over thresholds
   for warp and certainty.

Run: python tools/diag_dkm_sensitivity.py  (CPU, ~1-2h on this host)
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
    q = np.quantile(d, [0.5, 0.99, 0.999])
    print(f"[{tag}] max {d.max():.4g} median {q[0]:.4g} p99 {q[1]:.4g} "
          f"p99.9 {q[2]:.4g} frac>1e-2 {(d > 1e-2).mean():.5f} "
          f"frac>2e-3 {(d > 2e-3).mean():.5f}", flush=True)
    return d


def main():
    torch.manual_seed(5)
    from networks.dkm.models.model_zoo.DKMv3 import DKMv3

    hs, ws = 660, 880
    ref = DKMv3(None, hs, ws, upsample_preds=True)
    ref.h_resized, ref.w_resized = hs, ws
    ref.upsample_res = (1152, 1536)
    ref = ref.eval()

    rng = np.random.default_rng(5)
    im0 = _smooth_noise(rng, 1152, 1536)
    im1 = np.roll(im0, (96, 128), axis=(0, 1))
    t0 = torch.from_numpy(im0.transpose(2, 0, 1))[None]
    t1 = torch.from_numpy(im1.transpose(2, 0, 1))[None]

    with torch.no_grad():
        w_clean, c_clean = ref.match(t0, t1, batched=False)
    w_clean = w_clean.numpy()
    c_clean = c_clean.numpy()
    print("[diag] clean torch run done", flush=True)

    # 1. reference self-sensitivity under 1e-6 input noise
    pert = torch.from_numpy(
        rng.uniform(-1e-6, 1e-6, t0.shape).astype(np.float32))
    with torch.no_grad():
        w_p, c_p = ref.match(t0 + pert, t1, batched=False)
    print("[diag] perturbed torch run done", flush=True)
    stats("torch f32 self-sensitivity (1e-6 input noise): warp",
          w_clean, w_p.numpy())
    stats("torch f32 self-sensitivity: cert", c_clean, c_p.numpy())

    # 2. JAX port vs torch
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    from gim_tpu.weights import port
    from gim_tpu.config import DKMConfig
    from gim_tpu.models.dkm.model import DKMMatcher

    sd = {"model." + k: v.numpy() for k, v in ref.state_dict().items()}
    variables = port.port_dkm(sd)
    cfg = DKMConfig(h_resized=hs, w_resized=ws, upsample_res=(1152, 1536))
    warp, cert = DKMMatcher(cfg).apply(variables, jnp.asarray(t0.numpy()),
                                       jnp.asarray(t1.numpy()))
    print("[diag] jax run done", flush=True)
    stats("jax vs torch: warp", np.asarray(warp[0]), w_clean)
    stats("jax vs torch: cert", np.asarray(cert[0]), c_clean)
    np.savez("/tmp/dkm_parity_arrays.npz", warp_jax=np.asarray(warp[0]),
             cert_jax=np.asarray(cert[0]), warp_torch=w_clean,
             cert_torch=c_clean, warp_torch_pert=w_p.numpy(),
             cert_torch_pert=c_p.numpy())
    print("[diag] arrays saved to /tmp/dkm_parity_arrays.npz", flush=True)


if __name__ == "__main__":
    main()
