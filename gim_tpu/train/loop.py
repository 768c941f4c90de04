"""pjit data-parallel training loop for gim_loftr.

The TPU-native analog of the reference's PL DDP fit path (ref test.py:233,
README multi-node recipe): params replicated over the mesh's `data` axis,
pair batch sharded, gradients averaged by XLA's sharding propagation (the
collective the reference gets from NCCL allreduce). BatchNorm batch stats
are computed over the GLOBAL batch automatically under jit sharding — the
built-in equivalent of sync_batchnorm=True (ref test.py:196).

Optimizer follows ref trainer/config.py:24-41 + test.py:158-165: AdamW
(decay 0.1), linear warmup (TRUE scaling rule), MultiStep gamma decay,
global-norm clip 0.5.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import optax

from gim_tpu.config import GimConfig, TrainerConfig
from gim_tpu.models.loftr.model import LoFTRMatcher
from gim_tpu.train import losses as L


def make_schedule(tcfg: TrainerConfig, world_size: int, batch_size: int,
                  steps_per_epoch: int) -> optax.Schedule:
    lr = tcfg.true_lr(world_size, batch_size)
    warmup = tcfg.true_warmup(world_size, batch_size)
    warm = optax.linear_schedule(tcfg.warmup_ratio * lr, lr, warmup)
    boundaries = {int(m * steps_per_epoch): tcfg.scheduler_gamma
                  for m in tcfg.scheduler_milestones}
    decay = optax.piecewise_constant_schedule(lr, boundaries)

    def schedule(step):
        return jnp.where(step < warmup, warm(step), decay(step))

    return schedule


def make_optimizer(tcfg: TrainerConfig, world_size: int, batch_size: int,
                   steps_per_epoch: int) -> optax.GradientTransformation:
    sched = make_schedule(tcfg, world_size, batch_size, steps_per_epoch)
    return optax.chain(
        optax.clip_by_global_norm(tcfg.gradient_clipping),
        optax.adamw(sched, weight_decay=tcfg.adamw_decay),
    )


def loftr_loss(cfg: GimConfig, variables, batch, rngs=None):
    """Forward + pseudo-label supervision (WALK-style 2D correspondences).

    batch: color0/color1 (B,3,H,W), labels (B,N,4) resized-frame px,
    label_valid (B,N). The forward runs with the reference's train-time
    coarse sampling: GT cell pairs (from the labels) pad the fine-stage
    slots (ref coarse_matching.py:199-234)."""
    c = cfg.loftr
    model = LoFTRMatcher(c, train_mode=True)

    B, _, H, W = batch["color0"].shape
    hw_c = (H // c.resolution[0], W // c.resolution[0])
    hc_, wc_ = hw_c
    spv_i = (jnp.clip(batch["labels"][..., 1] // c.resolution[0], 0, hc_ - 1)
             * wc_ + jnp.clip(batch["labels"][..., 0] // c.resolution[0],
                              0, wc_ - 1)).astype(jnp.int32)
    spv_j = (jnp.clip(batch["labels"][..., 3] // c.resolution[0], 0, hc_ - 1)
             * wc_ + jnp.clip(batch["labels"][..., 2] // c.resolution[0],
                              0, wc_ - 1)).astype(jnp.int32)
    spv = {"i_ids": spv_i, "j_ids": spv_j, "valid": batch["label_valid"]}
    sample_rng = None if rngs is None else rngs.get("sample")

    out, mutated = model.apply(
        variables, batch["color0"], batch["color1"],
        spv=spv, sample_rng=sample_rng,
        mutable=["batch_stats"])
    conf_gt = L.coarse_gt_from_labels(batch["labels"], batch["label_valid"],
                                      hw_c, c.resolution[0])
    loss_c = L.coarse_focal_loss(out["conf_matrix"], conf_gt,
                                 c.focal_alpha, c.focal_gamma,
                                 c.pos_weight, c.neg_weight)

    # fine supervision at the coarse grid point (local-translation warp
    # estimate from the labels — see fine_gt_from_labels)
    denom = (c.fine_window_size // 2) * c.resolution[1]
    expec_gt, has_gt = L.fine_gt_from_labels(
        batch["labels"], batch["label_valid"], out["i_ids"],
        out["mkpts1_c"], hw_c, c.resolution[0], float(denom))
    gt_valid = has_gt & out["valid"]
    loss_f = L.fine_l2_std_loss(out["expec_f"], expec_gt, gt_valid,
                                c.fine_correct_thr)
    return loss_c + loss_f, (mutated, {"loss_c": loss_c, "loss_f": loss_f})


@functools.partial(jax.jit, static_argnames=("cfg", "tx"))
def loftr_train_step(cfg: GimConfig, tx, variables, opt_state, batch):
    params = variables["params"]
    stats = variables.get("batch_stats", {})

    def loss_fn(p):
        return loftr_loss(cfg, {"params": p, "batch_stats": stats}, batch)

    (loss, (mutated, logs)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    new_vars = {"params": params,
                "batch_stats": mutated.get("batch_stats", stats)}
    logs = dict(logs, loss=loss)
    return new_vars, opt_state, logs
