"""gim_lightglue training: joint SuperPoint bootstrap + LightGlue NLL.

Reference scaffold: the in-model NLL loss of LightGlue
(ref networks/lightglue/models/matchers/lightglue.py:580-629) trained on
WALK 2D correspondences (50 epochs, img 1024, lr 1e-4 — ref README.md:245).

Documented divergence: the reference fine-tunes LightGlue on top of a
FROZEN PRETRAINED SuperPoint (ref superpoint.py:190-196 ships the frozen
detector). From scratch — no pretrained detector exists in this
environment — a frozen random detector is unlearnable-from: its keypoints
are neither repeatable across views nor sub-pixel meaningful, so the GT
assignment is empty and pose AUC stays 0 (measured in the round-3
learned-loop session; that mislabeled artifact was removed in commit
6264009). The loop therefore bootstraps the detector from the SAME
pseudo-labels the matcher trains on, SuperPoint-paper style:

  1. detector CE: 65-way cell softmax classification — each 8x8 cell
     whose pixel holds a pseudo-label endpoint targets that pixel's class,
     all other cells target the dustbin (class 64);
  2. descriptor InfoNCE at label correspondences (dense maps sampled at
     both endpoints; negatives outside an 8 px radius);
  3. LightGlue NLL on the GT assignment built from the *detected*
     keypoints — meaningful once (1) converges.

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
from gim_tpu.models.superpoint import SuperPointNet
from gim_tpu.ops.detect import remove_borders, simple_nms, topk_keypoints
from gim_tpu.ops.sampling import sample_descriptors
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


def _dense_forward(params, image_bchw, cfg):
    """One SuperPoint forward returning (scores (B,H,W), desc (B,Hc,Wc,D),
    logits (B,hc,wc,65)) — the train path needs the raw cell logits."""
    image = image_bchw
    if image.shape[1] == 3:
        w = jnp.array([0.299, 0.587, 0.114], image.dtype).reshape(1, 3, 1, 1)
        image = jnp.sum(image * w, axis=1, keepdims=True)
    nhwc = jnp.transpose(image, (0, 2, 3, 1))
    net = SuperPointNet(descriptor_dim=cfg.descriptor_dim)
    return net.apply(params, nhwc, return_logits=True)


def _sparse_from_dense(scores, desc, cfg, pad_rng):
    """Mirror of models.superpoint.extract's sparse stage, reusing an
    already-computed dense forward (avoids a second net.apply in the loss)."""
    s = simple_nms(scores, cfg.nms_radius)
    s = remove_borders(s, cfg.remove_borders)
    kpts, kscores, valid = topk_keypoints(
        s, cfg.max_num_keypoints, cfg.detection_threshold,
        pad_rng=pad_rng if cfg.force_num_keypoints else None)
    desc_chw = jnp.transpose(desc, (0, 3, 1, 2))
    d = sample_descriptors(kpts, desc_chw, 8, legacy=cfg.legacy_sampling)
    return {"keypoints": kpts + 0.5, "scores": kscores, "valid": valid,
            "descriptors": d}


def superpoint_detection_loss(logits, pts_xy, pts_valid):
    """65-way cell CE: cells holding a pseudo-label endpoint target the
    endpoint's pixel class, all others the dustbin (SuperPoint's MagicPoint
    objective, ref superpoint.py:229-235 head). Balanced: positive and
    dustbin cells contribute equally so ~2% positives aren't drowned.

    logits: (B, hc, wc, 65); pts_xy: (B, N, 2) full-res px; pts_valid (B, N).
    """
    B, hc, wc, _ = logits.shape
    xi = jnp.clip(pts_xy[..., 0].astype(jnp.int32), 0, wc * 8 - 1)
    yi = jnp.clip(pts_xy[..., 1].astype(jnp.int32), 0, hc * 8 - 1)
    cell = (yi // 8) * wc + (xi // 8)                     # (B, N)
    cls = (yi % 8) * 8 + (xi % 8)
    ncell = hc * wc
    # scatter targets; invalid points parked in an extra slot. Duplicate
    # endpoints in one cell: last writer wins (the reference picks one
    # arbitrarily too).
    cell = jnp.where(pts_valid, cell, ncell)
    tgt = jnp.full((B, ncell + 1), 64, jnp.int32)
    tgt = jax.vmap(lambda t, c, k: t.at[c].set(k))(tgt, cell, cls)
    tgt = tgt[:, :ncell]
    ll = jax.nn.log_softmax(logits.reshape(B, ncell, 65), axis=-1)
    ce = -jnp.take_along_axis(ll, tgt[..., None], axis=-1)[..., 0]
    pos = (tgt != 64).astype(jnp.float32)
    n_pos = jnp.maximum(jnp.sum(pos), 1.0)
    n_neg = jnp.maximum(jnp.sum(1.0 - pos), 1.0)
    return (jnp.sum(ce * pos) / n_pos
            + jnp.sum(ce * (1.0 - pos)) / n_neg) * 0.5


def superpoint_descriptor_loss(desc0, desc1, labels, label_valid,
                               n_max: int = 1024, temp: float = 0.1,
                               safe_px: float = 8.0):
    """Symmetric InfoNCE between descriptors sampled at the two endpoints of
    each pseudo-label. Negatives within `safe_px` of the positive are masked
    (SIFT endpoints cluster; sub-cell neighbours are not true negatives).

    desc: (B, Hc, Wc, D) dense maps; labels (B, N, 4); label_valid (B, N).
    """
    lab = labels[:, :n_max]
    lv = label_valid[:, :n_max]
    d0c = jnp.transpose(desc0, (0, 3, 1, 2))
    d1c = jnp.transpose(desc1, (0, 3, 1, 2))
    f0 = sample_descriptors(lab[..., :2], d0c, 8)         # (B, n, D)
    f1 = sample_descriptors(lab[..., 2:], d1c, 8)
    sim = jnp.einsum("bnd,bmd->bnm", f0, f1) / temp
    # spatial safety mask per direction
    close1 = (jnp.sum((lab[:, :, None, 2:] - lab[:, None, :, 2:]) ** 2, -1)
              < safe_px ** 2)
    close0 = (jnp.sum((lab[:, :, None, :2] - lab[:, None, :, :2]) ** 2, -1)
              < safe_px ** 2)
    eye = jnp.eye(lab.shape[1], dtype=bool)[None]
    neg_inf = -1e9
    valid_pair = lv[:, :, None] & lv[:, None, :]
    m01 = jnp.where((close1 & ~eye) | ~valid_pair, neg_inf, sim)
    m10 = jnp.where((close0 & ~eye) | ~valid_pair, neg_inf, sim)
    ll01 = jax.nn.log_softmax(m01, axis=2)
    ll10 = jax.nn.log_softmax(m10, axis=1)
    diag01 = jnp.diagonal(ll01, axis1=1, axis2=2)
    diag10 = jnp.diagonal(ll10, axis1=1, axis2=2)
    w = lv.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    return -(jnp.sum(diag01 * w) + jnp.sum(diag10 * w)) / (2.0 * n)


def lightglue_loss(cfg: GimConfig, variables, batch,
                   w_det: float = 1.0, w_desc: float = 1.0):
    """Joint loss: SuperPoint detector CE + descriptor InfoNCE (both from
    pseudo-labels) + LightGlue NLL on the detected-keypoint GT assignment."""
    B, _, H, W = batch["color0"].shape
    spv = variables["superpoint"]
    s0, dm0, lg0 = _dense_forward(spv, batch["color0"], cfg.superpoint)
    s1, dm1, lg1 = _dense_forward(spv, batch["color1"], cfg.superpoint)
    p0 = _sparse_from_dense(s0, dm0, cfg.superpoint, jax.random.PRNGKey(1))
    p1 = _sparse_from_dense(s1, dm1, cfg.superpoint, jax.random.PRNGKey(2))
    wh = jnp.tile(jnp.array([[W, H]], jnp.float32), (B, 1))
    out = lg.LightGlue(cfg.lightglue).apply(
        variables["lightglue"], p0["keypoints"], p1["keypoints"],
        p0["descriptors"], p1["descriptors"], wh, wh,
        p0["valid"], p1["valid"])
    gt0 = assign_gt_matches(p0["keypoints"], p0["valid"],
                            p1["keypoints"], p1["valid"],
                            batch["labels"], batch["label_valid"])
    nll = lightglue_nll_loss(out["log_assignment"], gt0,
                             p0["valid"], p1["valid"])
    det = (superpoint_detection_loss(lg0, batch["labels"][..., :2],
                                     batch["label_valid"])
           + superpoint_detection_loss(lg1, batch["labels"][..., 2:],
                                       batch["label_valid"])) * 0.5
    desc = superpoint_descriptor_loss(dm0, dm1, batch["labels"],
                                      batch["label_valid"])
    loss = nll + w_det * det + w_desc * desc
    n_gt = jnp.sum((gt0 >= 0).astype(jnp.float32)) / B
    return loss, {"loss": loss, "nll": nll, "det": det, "desc": desc,
                  "gt_matches": n_gt}


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def lightglue_train_step(cfg: GimConfig, tx, variables, opt_state, batch):
    """Trains SuperPoint AND LightGlue jointly (see module docstring for why
    the from-scratch loop cannot freeze the detector)."""
    (loss, logs), grads = jax.value_and_grad(
        lambda v: lightglue_loss(cfg, v, batch), has_aux=True)(variables)
    updates, opt_state = tx.update(grads, opt_state, variables)
    variables = optax.apply_updates(variables, updates)
    return variables, opt_state, logs
