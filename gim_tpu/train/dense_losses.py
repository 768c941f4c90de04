"""Training losses for the dense matchers (gim_dkm / gim_roma).

The reference's train code lives on its train-gim-* branches (not in this
snapshot — SURVEY §3.3); what IS specified here: GIM fine-tunes DKM/RoMa
on WALK video pseudo-labels (100k x 4 2D correspondences, identity K/T —
ref datasets/walk/walk.py:367-418, README.md:239-245). Supervision design:

- sparse pseudo-labels are scattered into the per-scale grid: each coarse
  cell of image0 that contains >= 1 label gets the mean normalized target
  coordinate in image1 as its ground-truth flow;
- flow loss: generalized Charbonnier on (flow - gt_flow) over labeled
  cells, per scale, weighted coarser->finer like the DKM/RoMa papers
  (DKM: Edstedt et al. CVPR 2023 eq. 8; RoMa: arXiv 2305.15404 sec 3.4);
- certainty loss: balanced BCE — positive at labeled cells, negative
  elsewhere with a weight that equalizes the class masses (labels are a
  sparse subset of covisible pixels, so unlabeled != non-covisible;
  balancing keeps the head from collapsing to all-negative);
- RoMa additionally supervises the scale-16 anchor classifier (gm_cls)
  with cross-entropy against the anchor bin that contains the gt target
  (the match-decoder-as-classifier objective, ref roma.py:276-297).

Both matchers train through their symmetric 2B forward: the last B rows
get the swapped labels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax

from gim_tpu.config import GimConfig

# coarser scales get more weight (they set up the refinement cascade)
SCALE_WEIGHTS = {32: 1.0, 16: 1.0, 8: 0.5, 4: 0.25, 2: 0.125, 1: 0.125}
CERT_WEIGHT = 0.5


def scatter_sparse_warp(labels: jax.Array, label_valid: jax.Array,
                        in_hw: tuple[int, int], hs: int, ws: int):
    """labels (B, N, 4) [x0, y0, x1, y1] pixels in the (H, W) input frame
    -> per-cell gt flow at (hs, ws): mean normalized target coordinate.

    Returns (gt_flow (B, hs, ws, 2) in [-1, 1], gt_mask (B, hs, ws))."""
    H, W = in_hw
    B, N, _ = labels.shape
    ix = jnp.clip((labels[..., 0] * ws / W).astype(jnp.int32), 0, ws - 1)
    iy = jnp.clip((labels[..., 1] * hs / H).astype(jnp.int32), 0, hs - 1)
    cell = iy * ws + ix                                  # (B, N)
    # normalized target coords (torch grid convention, pixel centers)
    tx = 2.0 * (labels[..., 2] + 0.5) / W - 1.0
    ty = 2.0 * (labels[..., 3] + 0.5) / H - 1.0
    tgt = jnp.stack([tx, ty], axis=-1)                   # (B, N, 2)
    w = label_valid.astype(jnp.float32)

    acc = jnp.zeros((B, hs * ws, 2))
    acc = jax.vmap(lambda a, c, t, ww: a.at[c].add(t * ww[:, None]))(
        acc, cell, tgt, w)
    cnt = jnp.zeros((B, hs * ws))
    cnt = jax.vmap(lambda a, c, ww: a.at[c].add(ww))(cnt, cell, w)
    gt_flow = (acc / jnp.maximum(cnt[..., None], 1.0)).reshape(B, hs, ws, 2)
    gt_mask = (cnt > 0).reshape(B, hs, ws)
    return gt_flow, gt_mask


def _charbonnier(d: jax.Array, eps: float = 1e-3) -> jax.Array:
    return jnp.sqrt(jnp.sum(d * d, axis=-1) + eps * eps) - eps


def _balanced_bce(logits: jax.Array, pos_mask: jax.Array) -> jax.Array:
    """BCE with the negative class downweighted to the positive mass."""
    pos = pos_mask.astype(jnp.float32)
    n_pos = jnp.maximum(pos.sum(), 1.0)
    n_neg = jnp.maximum((1.0 - pos).sum(), 1.0)
    w = pos + (1.0 - pos) * (n_pos / n_neg)
    ll = optax.sigmoid_binary_cross_entropy(logits, pos)
    return jnp.sum(ll * w) / jnp.maximum(w.sum(), 1.0)


def _flow_key(d: dict) -> tuple[str, str]:
    return (("dense_flow", "dense_certainty") if "dense_flow" in d
            else ("flow", "certainty"))


def dense_warp_loss(corresps: dict, labels, label_valid, in_hw,
                    roma_cls: bool = False,
                    cls_res: int = 64):
    """Per-scale flow + certainty loss over a symmetric 2B batch.

    corresps: {scale: {flow/dense_flow (2B, h, w, 2), certainty (..., 1),
    [gm_cls]}}. labels are image0->image1; rows B..2B use swapped labels.
    """
    lab_fwd = labels
    lab_bwd = jnp.concatenate([labels[..., 2:4], labels[..., 0:2]], -1)
    lab2 = jnp.concatenate([lab_fwd, lab_bwd], axis=0)   # (2B, N, 4)
    lv2 = jnp.concatenate([label_valid, label_valid], axis=0)

    total = 0.0
    logs = {}
    for s, d in corresps.items():
        fkey, ckey = _flow_key(d)
        flow = d[fkey]
        cert = d[ckey]
        hs, ws = flow.shape[1:3]
        gt_flow, gt_mask = scatter_sparse_warp(lab2, lv2, in_hw, hs, ws)
        m = gt_mask.astype(jnp.float32)
        l_flow = jnp.sum(_charbonnier(flow - gt_flow) * m) \
            / jnp.maximum(m.sum(), 1.0)
        l_cert = _balanced_bce(cert[..., 0], gt_mask)
        wsc = SCALE_WEIGHTS.get(int(s), 0.25)
        total = total + wsc * (l_flow + CERT_WEIGHT * l_cert)
        logs[f"flow_{s}"] = l_flow
        if roma_cls and "gm_cls" in d:
            total = total + wsc * _anchor_cls_loss(
                d["gm_cls"], gt_flow, gt_mask, cls_res)
    return total, logs


def _anchor_cls_loss(cls_logits, gt_flow, gt_mask, res: int):
    """Cross-entropy against the anchor bin containing the gt target
    (RoMa's match-decoder-as-classifier head, ref roma.py:276-297;
    anchor grid layout matches models/roma/model.py:cls_to_flow_refine)."""
    B, H, W, C = cls_logits.shape
    gx = jnp.clip(((gt_flow[..., 0] + 1.0) / 2.0 * res).astype(jnp.int32),
                  0, res - 1)
    gy = jnp.clip(((gt_flow[..., 1] + 1.0) / 2.0 * res).astype(jnp.int32),
                  0, res - 1)
    target = gy * res + gx                               # (B, H, W)
    logp = jax.nn.log_softmax(cls_logits[..., :res * res], axis=-1)
    nll = -jnp.take_along_axis(logp, target[..., None], axis=-1)[..., 0]
    m = gt_mask.astype(jnp.float32)
    return jnp.sum(nll * m) / jnp.maximum(m.sum(), 1.0)


# ---------------------------------------------------------------------------
# per-head losses + jitted train steps
# ---------------------------------------------------------------------------

def dkm_loss(cfg: GimConfig, variables, batch):
    from gim_tpu.models.dkm.model import DKMMatcher

    model = DKMMatcher(cfg.dkm, train=True)
    corresps, mutated = model.apply(
        variables, batch["color0"], batch["color1"],
        method="train_corresps", mutable=["batch_stats"])
    in_hw = batch["color0"].shape[2:]
    loss, logs = dense_warp_loss(corresps, batch["labels"],
                                 batch["label_valid"], in_hw)
    return loss, (mutated, logs)


def roma_loss(cfg: GimConfig, variables, batch):
    from gim_tpu.models.roma.model import RoMaMatcher

    model = RoMaMatcher(cfg.roma, train=True)
    corresps, mutated = model.apply(
        variables, batch["color0"], batch["color1"],
        method="train_corresps", mutable=["batch_stats"])
    in_hw = batch["color0"].shape[2:]
    loss, logs = dense_warp_loss(corresps, batch["labels"],
                                 batch["label_valid"], in_hw,
                                 roma_cls=True,
                                 cls_res=cfg.roma.cls_to_coord_res)
    return loss, (mutated, logs)


def _make_step(loss_fn):
    @functools.partial(jax.jit, static_argnames=("cfg", "tx"))
    def step(cfg: GimConfig, tx, variables, opt_state, batch):
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        def f(p):
            return loss_fn(cfg, {"params": p, "batch_stats": stats}, batch)

        (loss, (mutated, logs)), grads = jax.value_and_grad(
            f, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        new_vars = {"params": params,
                    "batch_stats": mutated.get("batch_stats", stats)}
        return new_vars, opt_state, dict(logs, loss=loss)

    return step


dkm_train_step = _make_step(dkm_loss)
roma_train_step = _make_step(roma_loss)
