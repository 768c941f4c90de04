"""Training losses for the matcher heads.

gim_loftr: focal loss on the dual-softmax coarse confidence matrix +
L2-with-std fine refinement loss — the loss family configured in
ref networks/loftr/config.py:49-68 (FOCAL_ALPHA 0.25, FOCAL_GAMMA 2.0,
FINE_TYPE 'l2_with_std', FINE_CORRECT_THR 1.0). The training branches
(train-gim-*) supervise with 2D pseudo-label correspondences
(ref datasets/walk/walk.py:367-418: `pseudo_labels` (100k, 4), gt=False).

Supervision construction maps label points to coarse cells in both images
(the analog of LoFTR's spvs_coarse for pseudo labels) as a scatter into a
(L, S) one-hot matrix — static shapes, on device.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def coarse_gt_from_labels(labels: jax.Array, label_valid: jax.Array,
                          hw_c: tuple[int, int], scale: int = 8):
    """Pseudo-label correspondences -> coarse GT assignment matrix.

    labels: (B, N, 4) [x0, y0, x1, y1] pixel coords in the resized frame;
    label_valid: (B, N). Returns conf_gt (B, L, S) in {0, 1}.
    """
    hc, wc = hw_c
    L = hc * wc

    def cell(xy):
        cx = jnp.clip((xy[..., 0] // scale).astype(jnp.int32), 0, wc - 1)
        cy = jnp.clip((xy[..., 1] // scale).astype(jnp.int32), 0, hc - 1)
        return cy * wc + cx

    i = cell(labels[..., 0:2])
    j = cell(labels[..., 2:4])
    B, N = i.shape
    conf_gt = jnp.zeros((B, L, L), jnp.float32)
    w = label_valid.astype(jnp.float32)
    flat = i * L + j
    upd = jnp.zeros((B, L * L), jnp.float32)
    upd = jax.vmap(lambda u, f, ww: u.at[f].max(ww))(upd, flat, w)
    return upd.reshape(B, L, L)


def fine_gt_from_labels(labels: jax.Array, label_valid: jax.Array,
                        i_ids: jax.Array, mkpts1_c: jax.Array,
                        hw_c: tuple[int, int], scale: int,
                        denom: float):
    """Pseudo-label correspondences -> fine-stage GT offsets.

    The fine head refines the correspondence of the coarse GRID POINT
    mkpts0_c = (cx, cy) * scale (coarse_matching.py:240-248 convention),
    so the GT target is warp(grid_pt), NOT the label centroid — the
    centroid sits up to ~scale/2 px from the grid point, a multi-degree
    translation-direction bias at typical focal lengths (measured on the
    learned loop: t_errs 2.4-7.9 deg). warp(grid_pt) is estimated from
    the labels by a local-translation model:
    warp(g) ~= centroid1 + (g - centroid0).

    labels: (B, N, 4) resized-frame px; i_ids: (B, M) matched image0
    cells; mkpts1_c: (B, M, 2). Returns (expec_gt (B, M, 2) normalized
    by denom, has_gt (B, M))."""
    hc, wc = hw_c
    B = labels.shape[0]
    Lc = hc * wc
    cell0 = (jnp.clip((labels[..., 1] // scale), 0, hc - 1) * wc
             + jnp.clip((labels[..., 0] // scale), 0, wc - 1)
             ).astype(jnp.int32)
    w = label_valid.astype(jnp.float32)
    sum01 = jnp.zeros((B, Lc, 4))
    sum01 = jax.vmap(lambda s, i, p, ww: s.at[i].add(p * ww[:, None]))(
        sum01, cell0, labels, w)
    cnt = jnp.zeros((B, Lc))
    cnt = jax.vmap(lambda s, i, ww: s.at[i].add(ww))(cnt, cell0, w)
    pos0 = sum01[..., 0:2] / jnp.maximum(cnt[..., None], 1.0)
    pos1 = sum01[..., 2:4] / jnp.maximum(cnt[..., None], 1.0)

    x = (i_ids % wc).astype(jnp.float32)
    y = (i_ids // wc).astype(jnp.float32)
    grid0 = jnp.stack([x, y], axis=-1) * float(scale)
    gt1 = (jnp.take_along_axis(pos1, i_ids[..., None], axis=1)
           + grid0 - jnp.take_along_axis(pos0, i_ids[..., None], axis=1))
    has_gt = jnp.take_along_axis(cnt > 0, i_ids, axis=1)
    return (gt1 - mkpts1_c) / denom, has_gt


def coarse_focal_loss(conf: jax.Array, conf_gt: jax.Array,
                      alpha: float = 0.25, gamma: float = 2.0,
                      pos_weight: float = 1.0, neg_weight: float = 1.0,
                      valid: jax.Array | None = None) -> jax.Array:
    """Dual-softmax focal loss (LoFTR-style) on conf in [0, 1].

    conf/conf_gt: (B, L, S). valid: (B, L, S) cells that are in-image.

    The reference clamps conf to [1e-6, 1-1e-6] (LoFTR loss convention)
    BEFORE the log. That is fine for fine-tuning (conf is structured),
    but from scratch at L ~ 1e4 the dual-softmax starts uniform at
    1/L^2 ~ 1e-8 — every positive cell sits below the clamp, the clip
    zeroes its gradient, and the coarse head never trains (measured:
    loss_c frozen at -alpha*ln(1e-6) = 3.4539 for 600+ steps at 840px).
    We clamp only as a -inf guard (1e-30): d log(conf)/d logits is the
    bounded log-softmax gradient, and the loss value is identical to the
    reference's in its operating regime (conf > 1e-6).
    """
    pos = conf_gt > 0.5
    loss_pos = -alpha * (1 - conf) ** gamma \
        * jnp.log(jnp.maximum(conf, 1e-30))
    loss_neg = -(1 - alpha) * conf ** gamma \
        * jnp.log(jnp.maximum(1 - conf, 1e-30))
    if valid is None:
        valid = jnp.ones_like(conf, bool)
    pos_m = pos & valid
    neg_m = (~pos) & valid
    lp = jnp.sum(loss_pos * pos_m) / jnp.maximum(jnp.sum(pos_m), 1.0)
    ln = jnp.sum(loss_neg * neg_m) / jnp.maximum(jnp.sum(neg_m), 1.0)
    return pos_weight * lp + neg_weight * ln


def fine_l2_std_loss(expec_f: jax.Array, expec_f_gt: jax.Array,
                     valid: jax.Array, correct_thr: float = 1.0) -> jax.Array:
    """L2 fine loss weighted by inverse predicted std ('l2_with_std').

    expec_f: (B, M, 3) [x, y, std] normalized window coords;
    expec_f_gt: (B, M, 2) GT offsets in the same normalized frame;
    valid: (B, M) matches that exist and whose GT lies inside the window
    (|gt| < correct_thr, ref config FINE_CORRECT_THR)."""
    std = expec_f[..., 2]
    inverse_std = 1.0 / jnp.clip(std, 1e-10)
    weight = (inverse_std / jnp.maximum(inverse_std.mean(), 1e-10))
    weight = jax.lax.stop_gradient(weight)
    in_win = jnp.max(jnp.abs(expec_f_gt), axis=-1) < correct_thr
    m = valid & in_win
    offset_l2 = jnp.sum((expec_f[..., :2] - expec_f_gt) ** 2, axis=-1)
    return jnp.sum(offset_l2 * weight * m) / jnp.maximum(jnp.sum(m), 1.0)


def lightglue_nll_loss(log_assignment: jax.Array, gt_matches0: jax.Array,
                       valid0: jax.Array, valid1: jax.Array) -> jax.Array:
    """Negative log-likelihood of the GT assignment (LightGlue training,
    ref matchers/lightglue.py:580-629 scaffold; the referenced NLLLoss is
    the glue-factory one, which BALANCES positives and negatives:
    nll = (mean over matched rows + mean over dustbin rows) / 2).
    Unbalanced averaging lets the ~100%-dustbin early phase of
    from-scratch training drown the positive signal once matches appear.

    log_assignment: (B, L+1, S+1); gt_matches0: (B, L) partner index or -1.
    """
    B, Lp1, Sp1 = log_assignment.shape
    L, S = Lp1 - 1, Sp1 - 1
    matched = (gt_matches0 >= 0) & valid0
    idx = jnp.where(matched, gt_matches0, S)  # unmatched -> dustbin column
    rows = jnp.take_along_axis(log_assignment[:, :L, :], idx[..., None],
                               axis=2)[..., 0]
    w_pos = matched.astype(jnp.float32)
    w_neg = (valid0 & ~matched).astype(jnp.float32)
    nll_pos = -jnp.sum(rows * w_pos) / jnp.maximum(jnp.sum(w_pos), 1.0)
    nll_neg = -jnp.sum(rows * w_neg) / jnp.maximum(jnp.sum(w_neg), 1.0)
    return 0.5 * (nll_pos + nll_neg)
