"""gim_lightglue training: pseudo-label supervision + NLL loss.

Reference scaffold: the in-model NLL loss of LightGlue
(ref networks/lightglue/models/matchers/lightglue.py:580-629) trained on
WALK 2D correspondences (50 epochs, img 1024, lr 1e-4 — ref README.md:245).

Supervision construction (device-side, static shapes): each detected
keypoint in image0 is matched to the nearest pseudo-label endpoint within
`gt_thr` px; its label partner is then matched to the nearest detected
keypoint in image1. Unmatched keypoints supervise the dustbin.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from gim_tpu.config import GimConfig
from gim_tpu.models import lightglue as lg
from gim_tpu.models import superpoint as sp
from gim_tpu.train.losses import lightglue_nll_loss


def assign_gt_matches(kpts0, valid0, kpts1, valid1, labels, label_valid,
                      gt_thr: float = 3.0):
    """(B, K) partner index into kpts1 (or -1) for every kpt0 slot.

    kpts: (B, K, 2); labels: (B, N, 4) [x0 y0 x1 y1] in the same frame.
    """
    big = 1e12

    def one(k0, v0, k1, v1, lab, lv):
        d0 = jnp.sum((k0[:, None, :] - lab[None, :, :2]) ** 2, axis=-1)
        d0 = jnp.where(lv[None, :], d0, big)
        li = jnp.argmin(d0, axis=1)                       # label per kpt0
        ok0 = (jnp.take_along_axis(d0, li[:, None], axis=1)[:, 0]
               < gt_thr ** 2) & v0
        target = lab[li, 2:]                              # (K, 2) in image1
        d1 = jnp.sum((target[:, None, :] - k1[None, :, :]) ** 2, axis=-1)
        d1 = jnp.where(v1[None, :], d1, big)
        j = jnp.argmin(d1, axis=1)
        ok1 = jnp.take_along_axis(d1, j[:, None], axis=1)[:, 0] < gt_thr ** 2
        return jnp.where(ok0 & ok1, j, -1)

    return jax.vmap(one)(kpts0, valid0, kpts1, valid1, labels, label_valid)


def lightglue_loss(cfg: GimConfig, variables, batch):
    """SuperPoint (frozen detector, trainable descriptors follow the
    reference's freeze pattern via stop-gradient on score head) + LightGlue
    forward + NLL on GT assignment."""
    B, _, H, W = batch["color0"].shape
    p0 = sp.extract(variables["superpoint"], batch["color0"], cfg.superpoint,
                    pad_rng=jax.random.PRNGKey(1))
    p1 = sp.extract(variables["superpoint"], batch["color1"], cfg.superpoint,
                    pad_rng=jax.random.PRNGKey(2))
    wh = jnp.tile(jnp.array([[W, H]], jnp.float32), (B, 1))
    out = lg.LightGlue(cfg.lightglue).apply(
        variables["lightglue"], p0["keypoints"], p1["keypoints"],
        p0["descriptors"], p1["descriptors"], wh, wh,
        p0["valid"], p1["valid"])
    gt0 = assign_gt_matches(p0["keypoints"], p0["valid"],
                            p1["keypoints"], p1["valid"],
                            batch["labels"], batch["label_valid"])
    loss = lightglue_nll_loss(out["log_assignment"], gt0,
                              p0["valid"], p1["valid"])
    n_gt = jnp.sum((gt0 >= 0).astype(jnp.float32)) / B
    return loss, {"loss": loss, "gt_matches": n_gt}


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def lightglue_train_step(cfg: GimConfig, tx, variables, opt_state, batch):
    """Trains the LightGlue matcher; SuperPoint stays frozen (the reference
    freezes the detector convs and ships a frozen detector at eval,
    ref superpoint.py:190-196)."""
    lg_params = variables["lightglue"]

    def loss_fn(p):
        v = {"superpoint": jax.lax.stop_gradient(variables["superpoint"]),
             "lightglue": p}
        return lightglue_loss(cfg, v, batch)

    (loss, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(lg_params)
    updates, opt_state = tx.update(grads, opt_state, lg_params)
    lg_params = optax.apply_updates(lg_params, updates)
    return ({"superpoint": variables["superpoint"], "lightglue": lg_params},
            opt_state, logs)
