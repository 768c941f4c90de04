"""Training-path tests: losses, GT assignment, one real optimization step."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu.config import GimConfig, LightGlueConfig, LoFTRConfig
from gim_tpu.train import losses as L
from gim_tpu.train import losses as L_mod


def test_coarse_focal_loss_prefers_correct_confidence():
    conf_gt = jnp.zeros((1, 4, 4)).at[0, 1, 2].set(1.0)
    good = jnp.full((1, 4, 4), 0.01).at[0, 1, 2].set(0.95)
    bad = jnp.full((1, 4, 4), 0.01).at[0, 1, 2].set(0.01).at[0, 3, 3].set(0.9)
    lg = L.coarse_focal_loss(good, conf_gt)
    lb = L.coarse_focal_loss(bad, conf_gt)
    assert float(lg) < float(lb)


def test_fine_l2_std_loss_masks_out_of_window():
    expec = jnp.zeros((1, 3, 3)).at[..., 2].set(1.0)  # std 1
    gt = jnp.array([[[0.1, 0.1], [5.0, 5.0], [0.2, 0.2]]])
    valid = jnp.array([[True, True, False]])
    loss = L.fine_l2_std_loss(expec, gt, valid, correct_thr=1.0)
    # only the first entry contributes: 0.1^2 + 0.1^2
    np.testing.assert_allclose(float(loss), 0.02, rtol=1e-4)


def test_coarse_gt_from_labels_scatter():
    labels = jnp.array([[[4.0, 4.0, 12.0, 4.0],
                         [20.0, 20.0, 20.0, 20.0]]])
    valid = jnp.array([[True, False]])
    gt = L.coarse_gt_from_labels(labels, valid, hw_c=(4, 4), scale=8)
    assert gt.shape == (1, 16, 16)
    assert float(gt[0, 0, 1]) == 1.0      # (0,0) cell -> (0,1) cell
    assert float(gt.sum()) == 1.0         # invalid label ignored


def test_fine_gt_targets_grid_point_not_centroid():
    """Labels drawn from an exact affine warp: the fine GT must be the
    warp of the coarse grid point (cx, cy)*8, not of the label centroid
    (which sits ~half a cell away — the round-2 learned-loop t_err bug)."""
    rng = np.random.default_rng(0)
    A = np.array([[1.02, 0.01], [-0.015, 0.98]])
    b = np.array([3.3, -2.1])
    # many labels scattered inside a 64x64 image (8x8 coarse grid)
    p0 = rng.uniform(0, 64, (800, 2))
    p1 = p0 @ A.T + b
    labels = jnp.asarray(np.concatenate([p0, p1], -1)[None])
    valid = jnp.ones((1, 800), bool)

    i_ids = jnp.array([[9, 18, 27]])  # cells (1,1), (2,2), (3,3)
    grid0 = np.array([[8.0, 8.0], [16.0, 16.0], [24.0, 24.0]])
    # pretend the coarse stage matched to the true warped cell
    true1 = grid0 @ A.T + b
    mkpts1_c = jnp.asarray((np.floor(true1 / 8) * 8)[None])
    denom = 4.0
    expec_gt, has_gt = L.fine_gt_from_labels(
        labels, valid, i_ids, mkpts1_c, (8, 8), 8, denom)
    assert bool(has_gt.all())
    got = np.asarray(expec_gt[0]) * denom + np.asarray(mkpts1_c[0])
    # local-translation estimate is exact to first order; with A~I the
    # second-order term is ~|A-I| * cell/2 ~ 0.08 px
    np.testing.assert_allclose(got, true1, atol=0.3)


def test_lightglue_gt_assignment_and_step():
    from gim_tpu.train.lightglue_loop import (assign_gt_matches,
                                              lightglue_loss,
                                              lightglue_train_step)
    import optax

    k0 = jnp.array([[[10.0, 10.0], [50.0, 50.0], [0.0, 0.0]]])
    k1 = jnp.array([[[11.0, 12.0], [52.0, 49.0], [0.0, 0.0]]])
    v = jnp.array([[True, True, False]])
    labels = jnp.array([[[10.0, 10.0, 11.5, 11.5],
                         [50.0, 50.0, 51.0, 49.5]]])
    lv = jnp.array([[True, True]])
    gt = assign_gt_matches(k0, v, k1, v, labels, lv, gt_thr=3.0)
    np.testing.assert_array_equal(np.asarray(gt)[0], [0, 1, -1])

    # one optimization step on a tiny problem (dims must match SuperPoint's
    # 256-d descriptors)
    from gim_tpu.config import SuperPointConfig

    cfg = GimConfig(
        superpoint=SuperPointConfig(max_num_keypoints=64),
        lightglue=LightGlueConfig(n_layers=2))
    from gim_tpu.models import lightglue as lgm
    from gim_tpu.models import superpoint as spm

    rng = jax.random.PRNGKey(0)
    variables = {
        "superpoint": spm.init_params(rng, cfg.superpoint),
        "lightglue": lgm.init_params(rng, cfg.lightglue, k=64),
    }
    batch = {
        "color0": jax.random.uniform(rng, (1, 3, 64, 64)),
        "color1": jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64)),
        "labels": jnp.tile(jnp.array([[8.0, 8.0, 8.0, 8.0]]), (1, 32, 1))
                  .reshape(1, 32, 4),
        "label_valid": jnp.ones((1, 32), bool),
    }
    tx = optax.adam(1e-4)
    opt_state = tx.init(variables)
    l0, parts = lightglue_loss(cfg, variables, batch)
    variables, opt_state, logs = lightglue_train_step(cfg, tx, variables,
                                                      opt_state, batch)
    l1 = logs["loss"]
    assert np.isfinite(float(l0)) and np.isfinite(float(l1))
    for k in ("nll", "det", "desc"):
        assert np.isfinite(float(parts[k])), k


def test_normalize_grad_finite_at_zero_vector():
    """Round-4 joint-train NaN regression (VERDICT r4 item 3): the VJP of
    `x / max(||x||, eps)` at an exact-zero vector is NaN. Repro'd on the
    real store: first non-finite grad leaves = superpoint convDb
    kernel/bias at step 1 (/tmp/debug_nan_prefix.log, 2026-08-20). All
    grad-path normalizations must be finite at zero."""
    from gim_tpu.ops.sampling import safe_l2_normalize, sample_descriptors

    g = jax.grad(lambda x: jnp.sum(safe_l2_normalize(x)))(jnp.zeros((4,)))
    assert bool(jnp.all(jnp.isfinite(g)))

    # zeros-padded sample at a far-out-of-bounds keypoint -> zero vector
    kpts = jnp.array([[[-500.0, -500.0], [8.0, 8.0]]])
    desc = jnp.ones((1, 16, 4, 4))
    g = jax.grad(lambda d: jnp.sum(sample_descriptors(kpts, d, 8)))(desc)
    assert bool(jnp.all(jnp.isfinite(g)))


def test_superpoint_backward_finite_on_black_image():
    """All-black input + zero-init biases -> every ReLU dead -> the dense
    descriptor is an exact-zero vector at every position: the minimal
    repro of the round-4 NaN (a dark-augmented batch had ReLU-dead
    positions). The backward must stay finite."""
    from gim_tpu.config import SuperPointConfig
    from gim_tpu.models import superpoint as spm
    from gim_tpu.train.lightglue_loop import _dense_forward

    cfg = SuperPointConfig(max_num_keypoints=16)
    params = spm.init_params(jax.random.PRNGKey(0), cfg)

    def loss(p):
        scores, desc, logits = _dense_forward(p, jnp.zeros((1, 3, 32, 32)),
                                              cfg)
        return jnp.sum(desc) + jnp.sum(scores) + jnp.sum(logits)

    grads = jax.grad(loss)(params)
    bad = [jax.tree_util.keystr(kp)
           for kp, g in jax.tree_util.tree_leaves_with_path(grads)
           if not bool(jnp.all(jnp.isfinite(g)))]
    assert not bad, bad


@pytest.mark.slow
def test_lightglue_joint_train_50_steps_stays_finite_and_matches():
    """VERDICT r4 weak #4: the one-step degenerate-label test passed while
    the real 320px run NaN'd at step 20 (logged) / step 1 (grads). This
    runs 50 REAL optimizer steps on store-shaped data — a textured pair
    under a known homography with dark warp borders (the ReLU-dead-region
    trigger) and scattered correspondence labels — asserting every step
    stays finite and the GT assignment is non-empty at the end."""
    import cv2
    import optax  # noqa: F401  (make_optimizer returns an optax chain)

    from gim_tpu.config import SuperPointConfig, TrainerConfig, replace
    from gim_tpu.data.synthetic import _texture
    from gim_tpu.models import lightglue as lgm
    from gim_tpu.models import superpoint as spm
    from gim_tpu.train.lightglue_loop import lightglue_train_step
    from gim_tpu.train.loop import make_optimizer

    S, N, K = 128, 256, 512
    rng = np.random.default_rng(0)
    img0 = _texture(rng, S, S)
    Hm = np.array([[0.95, 0.08, 6.0], [-0.06, 1.02, -4.0],
                   [1e-4, -8e-5, 1.0]])
    # BORDER_CONSTANT: black border regions, like the dark-augmented store
    img1 = cv2.warpPerspective(img0, Hm, (S, S))

    p0 = rng.uniform(8, S - 8, (N, 2))
    ph = np.concatenate([p0, np.ones((N, 1))], 1) @ Hm.T
    p1 = ph[:, :2] / ph[:, 2:]
    ok = (p1 > 4).all(1) & (p1 < S - 4).all(1)
    labels = np.concatenate([p0, p1], 1)[None].astype(np.float32)
    lv = ok[None]

    def to_chw(im):
        return np.transpose(im, (2, 0, 1))[None].astype(np.float32) / 255.0

    batch = {
        "color0": jnp.asarray(to_chw(img0)),
        "color1": jnp.asarray(to_chw(img1)),
        "labels": jnp.asarray(labels),
        "label_valid": jnp.asarray(lv),
    }

    cfg = GimConfig(
        superpoint=SuperPointConfig(max_num_keypoints=K,
                                    detection_threshold=0.0),
        lightglue=LightGlueConfig(n_layers=2))
    # short-run LR override (the canonical schedule warms up over
    # thousands of steps): constant effective 1e-3, like the learned
    # loop's --lr override path
    t = replace(TrainerConfig(), canonical_bs=1, canonical_lr=1e-3,
                warmup_steps=0)
    cfg = replace(cfg, trainer=t)

    prng = jax.random.PRNGKey(0)
    variables = {
        "superpoint": spm.init_params(prng, cfg.superpoint),
        "lightglue": lgm.init_params(prng, cfg.lightglue, k=K),
    }
    tx = make_optimizer(cfg.trainer, 1, 1, steps_per_epoch=1)
    opt_state = tx.init(variables)

    history = []
    for step in range(50):
        variables, opt_state, logs = lightglue_train_step(
            cfg, tx, variables, opt_state, batch)
        vals = {k: float(v) for k, v in logs.items()}
        assert all(np.isfinite(v) for v in vals.values()), (step, vals)
        history.append(vals)

    # detector CE must actually move (it NaN'd before moving in round 4)
    assert history[-1]["det"] < history[0]["det"]
    # and the GT assignment must be non-empty by the end
    assert history[-1]["gt_matches"] > 0


def test_lr_schedule_reference_rules():
    from gim_tpu.config import TrainerConfig
    from gim_tpu.train.loop import make_schedule

    t = TrainerConfig()
    # linear scaling (ref test.py:158-165)
    assert abs(t.true_lr(8, 1) - 1e-3 * 8 / 64) < 1e-12
    assert t.true_warmup(8, 1) == int(4800 / (8 / 64))
    # realistic epoch size: milestones (in epochs) land after warmup
    sched = make_schedule(t, 64, 1, steps_per_epoch=10000)
    lr0 = float(sched(0))
    lr_end_warmup = float(sched(t.true_warmup(64, 1)))
    assert lr0 < lr_end_warmup
    # decay at the first milestone (3 epochs)
    assert float(sched(3 * 10000 + 1)) < lr_end_warmup


def test_superpoint_detection_loss_targets_label_cells():
    from gim_tpu.train.lightglue_loop import superpoint_detection_loss

    hc = wc = 4
    # one labeled point at pixel (x=10, y=19) -> cell (row 2, col 1),
    # class (19%8)*8 + (10%8) = 3*8+2 = 26
    pts = jnp.array([[[10.0, 19.0]]])
    pv = jnp.ones((1, 1), bool)
    good = jnp.full((1, hc, wc, 65), 0.0).at[..., 64].set(8.0)
    good = good.at[0, 2, 1, 64].set(0.0).at[0, 2, 1, 26].set(8.0)
    bad = jnp.full((1, hc, wc, 65), 0.0).at[..., 64].set(8.0)  # all dustbin
    lg_ = float(superpoint_detection_loss(good, pts, pv))
    lb = float(superpoint_detection_loss(bad, pts, pv))
    assert lg_ < lb
    assert lg_ < 0.05
    # invalid point: everything-dustbin becomes optimal
    l_inv = float(superpoint_detection_loss(bad, pts, jnp.zeros((1, 1), bool)))
    assert l_inv < 0.05


def test_superpoint_descriptor_loss_separates_matches():
    from gim_tpu.train.lightglue_loop import superpoint_descriptor_loss

    rng = np.random.default_rng(0)
    D, Hc, Wc = 16, 8, 8
    base = rng.normal(size=(1, Hc, Wc, D)).astype(np.float32)
    base /= np.linalg.norm(base, axis=-1, keepdims=True)
    # identical maps + identical endpoints -> positives are perfect matches
    labels = np.zeros((1, 6, 4), np.float32)
    xy = np.array([[12, 12], [44, 12], [12, 44], [44, 44], [28, 28], [52, 52]],
                  np.float32)
    labels[0, :, :2] = xy
    labels[0, :, 2:] = xy
    lv = np.ones((1, 6), bool)
    l_good = float(superpoint_descriptor_loss(
        jnp.asarray(base), jnp.asarray(base), jnp.asarray(labels),
        jnp.asarray(lv), n_max=6))
    shuf = base[:, ::-1, ::-1]  # desc1 no longer corresponds
    l_bad = float(superpoint_descriptor_loss(
        jnp.asarray(base), jnp.asarray(shuf), jnp.asarray(labels),
        jnp.asarray(lv), n_max=6))
    assert l_good < l_bad


def test_lightglue_nll_balances_positive_and_dustbin_rows():
    """With 1 matched + 99 unmatched rows, the positive's term must carry
    50% of the loss (glue-factory NLLLoss balance), not 1%."""
    L = S = 100
    la = jnp.full((1, L + 1, S + 1), jnp.log(1.0 / (S + 1)))
    gt = jnp.full((1, L), -1, jnp.int32).at[0, 0].set(0)
    v = jnp.ones((1, L), bool)
    l_uniform = float(L_mod.lightglue_nll_loss(la, gt, v, v))
    # perfect dustbin rows, but the positive row still uniform: loss must
    # stay ~0.5 * -log(1/(S+1)) — the positive half un-drowned
    good_dust = jnp.full((1, L + 1, S + 1), -20.0).at[:, :, S].set(-1e-3)
    l_dust = float(L_mod.lightglue_nll_loss(good_dust, gt, v, v))
    assert abs(l_dust - 0.5 * (1e-3 + 20.0)) < 0.2
    assert l_uniform > 0
