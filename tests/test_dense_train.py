"""DKM / RoMa training: loss decreases on tiny configs with synthetic
pseudo-labels (the WALK supervision contract — VERDICT round-1 item 6)."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from gim_tpu.config import GimConfig, replace
from gim_tpu.train import dense_losses as D
from gim_tpu.train.loop import make_optimizer


def _batch(rng, B=1, H=64, W=64, N=64):
    color0 = jax.random.uniform(rng, (B, 3, H, W))
    color1 = jnp.roll(color0, 8, axis=-1)
    xs = jax.random.uniform(rng, (B, N, 2)) * (W - 10)
    labels = jnp.concatenate([xs, xs + jnp.array([8.0, 0.0])], axis=-1)
    return {"color0": color0, "color1": color1, "labels": labels,
            "label_valid": jnp.ones((B, N), bool)}


def test_scatter_sparse_warp():
    labels = jnp.array([[[8.0, 8.0, 24.0, 8.0]]])        # one label
    gt_flow, gt_mask = D.scatter_sparse_warp(
        labels, jnp.ones((1, 1), bool), (64, 64), 8, 8)
    assert bool(gt_mask[0, 1, 1])
    assert gt_mask.sum() == 1
    np.testing.assert_allclose(
        np.asarray(gt_flow[0, 1, 1]),
        [2 * 24.5 / 64 - 1, 2 * 8.5 / 64 - 1], atol=1e-6)


@pytest.mark.slow
def test_dkm_train_step_decreases_loss():
    cfg = GimConfig()
    cfg = replace(cfg, dkm=replace(cfg.dkm, h_resized=32, w_resized=32,
                                   upsample_preds=False))
    from gim_tpu.models.dkm import init_params

    rng = jax.random.PRNGKey(0)
    variables = init_params(rng, cfg.dkm, input_hw=(32, 32))
    batch = _batch(jax.random.PRNGKey(1), H=64, W=64)
    tx = make_optimizer(cfg.trainer, 1, 1, 100)
    opt_state = tx.init(variables["params"])

    losses = []
    v = variables
    for i in range(3):
        v, opt_state, logs = D.dkm_train_step(cfg, tx, v, opt_state, batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses


@pytest.mark.slow
def test_roma_train_step_decreases_loss():
    cfg = GimConfig()
    # decoder_dim must equal the token dim (512 gp + 512 proj);
    # dino_depth 2 keeps the compile tractable (full ViT-L init compiles
    # are hour-class on this host's remote compile relay)
    cfg = replace(cfg, roma=replace(cfg.roma, coarse_res=56,
                                    upsample_res=(112, 112),
                                    num_decoder_blocks=1, dino_depth=2,
                                    upsample_preds=False))
    from gim_tpu.models.roma import init_params

    rng = jax.random.PRNGKey(0)
    variables = init_params(rng, cfg.roma)
    batch = _batch(jax.random.PRNGKey(1), H=56, W=56)
    tx = make_optimizer(cfg.trainer, 1, 1, 100)
    opt_state = tx.init(variables["params"])

    losses = []
    v = variables
    for i in range(3):
        v, opt_state, logs = D.roma_train_step(cfg, tx, v, opt_state, batch)
        losses.append(float(logs["loss"]))
    assert np.isfinite(losses).all(), losses
    assert losses[-1] < losses[0], losses
