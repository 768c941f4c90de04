"""gim_loftr parity and sanity tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from gim_tpu.config import LoFTRConfig
from gim_tpu.models.loftr.backbone import ResNetFPN
from gim_tpu.models.loftr.transformer import sine_pos_encoding
from gim_tpu.models.loftr import model as loftr_model
from gim_tpu.weights import port
from tests.torch_ref import TorchLoFTRBackbone

HIGH = jax.default_matmul_precision("highest")


def test_backbone_parity_with_ported_weights():
    torch.manual_seed(0)
    tnet = TorchLoFTRBackbone().eval()
    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}
    # randomize BN stats so parity actually exercises them
    for k in sd:
        if "running_var" in k:
            sd[k] = np.abs(np.random.default_rng(0).standard_normal(
                sd[k].shape).astype(np.float32)) + 0.5
        if "running_mean" in k:
            sd[k] = 0.1 * np.random.default_rng(1).standard_normal(
                sd[k].shape).astype(np.float32)
    tsd = {k[len("backbone."):]: torch.from_numpy(v) for k, v in sd.items()}
    tnet.load_state_dict(tsd)

    m = port.Mapper(sd)
    port._port_resnet50_trunk(m, "backbone.encode", "encode")
    for name in ("layer3_outconv", "layer2_outconv", "layer1_outconv"):
        m.conv(f"backbone.{name}", name, bias=False)
    for lo in ("layer2_outconv2", "layer1_outconv2"):
        m.conv(f"backbone.{lo}.0", f"{lo}_0", bias=False)
        m.batchnorm(f"backbone.{lo}.1", f"{lo}_bn")
        m.conv(f"backbone.{lo}.3", f"{lo}_1", bias=False)
    variables = {"params": m.tree, "batch_stats": m.stats}

    rng = np.random.default_rng(2)
    x = rng.random((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        t_c, t_f = tnet(torch.from_numpy(x))
    with HIGH:
        net = ResNetFPN()
        j_c, j_f = net.apply(variables, jnp.transpose(jnp.asarray(x),
                                                      (0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(jnp.transpose(j_c, (0, 3, 1, 2))),
                               t_c.numpy(), atol=2e-3)
    np.testing.assert_allclose(np.asarray(jnp.transpose(j_f, (0, 3, 1, 2))),
                               t_f.numpy(), atol=2e-3)


def test_sine_pos_encoding_matches_reference_formula():
    import math
    d_model, h, w = 16, 5, 7
    pe = sine_pos_encoding(d_model, h, w, temp_bug_fix=False)
    assert pe.shape == (h * w, d_model)
    # reproduce reference math directly (position_encoding.py:22-34)
    y = np.cumsum(np.ones((h, w)), 0)
    x = np.cumsum(np.ones((h, w)), 1)
    div = np.exp(np.arange(0, d_model // 2, 2) * ((-math.log(1e4) / d_model) // 2))
    ref = np.zeros((d_model, h, w))
    ref[0::4] = np.sin(x[None] * div[:, None, None])
    ref[1::4] = np.cos(x[None] * div[:, None, None])
    ref[2::4] = np.sin(y[None] * div[:, None, None])
    ref[3::4] = np.cos(y[None] * div[:, None, None])
    np.testing.assert_allclose(pe, ref.reshape(d_model, -1).T, atol=1e-6)


@pytest.mark.compileheavy  # >100s cold on the 1-core host (r5 durations run)
def test_loftr_forward_shapes_and_self_match():
    """The full matcher on an identical image pair should produce mostly
    diagonal (i == j) matches at high confidence."""
    cfg = LoFTRConfig(max_matches=64)
    rng = jax.random.PRNGKey(0)
    img = jax.random.uniform(rng, (1, 3, 64, 64))
    variables = loftr_model.init_params(rng, cfg, input_hw=(64, 64))
    with HIGH:
        out = loftr_model.LoFTRMatcher(cfg).apply(variables, img, img)
    assert out["mkpts0_f"].shape == (1, 64, 2)
    assert out["mconf"].shape == (1, 64)
    v = np.asarray(out["valid"][0])
    if v.any():
        ii = np.asarray(out["i_ids"][0])[v]
        jj = np.asarray(out["j_ids"][0])[v]
        assert (ii == jj).mean() > 0.9
        # fine refinement of identical pairs should barely move points
        d = np.abs(np.asarray(out["mkpts1_f"][0])[v]
                   - np.asarray(out["mkpts0_f"][0])[v])
        assert d.max() < 2.0


def test_loftr_weight_port_roundtrip_structure():
    """Ported random reference-layout ckpt must exactly fill the flax tree."""
    torch.manual_seed(3)
    tnet = TorchLoFTRBackbone()
    sd = {f"backbone.{k}": v.detach().numpy()
          for k, v in tnet.state_dict().items()}

    # synthesize transformer + fine_preprocess weights in ckpt layout
    def lin(rng, i, o, prefix, bias=True):
        sd[f"{prefix}.weight"] = rng.standard_normal((o, i)).astype(np.float32)
        if bias:
            sd[f"{prefix}.bias"] = rng.standard_normal(o).astype(np.float32)

    rng = np.random.default_rng(4)
    for prefix, d, pairs in (("loftr_coarse", 256, 4), ("loftr_fine", 128, 1)):
        for li in range(2 * pairs):
            p = f"{prefix}.layers.{li}"
            for name in ("q_proj", "k_proj", "v_proj", "merge"):
                lin(rng, d, d, f"{p}.{name}", bias=False)
            lin(rng, 2 * d, 2 * d, f"{p}.mlp.0", bias=False)
            lin(rng, 2 * d, d, f"{p}.mlp.2", bias=False)
            for nrm in ("norm1", "norm2"):
                dd = d
                sd[f"{p}.{nrm}.weight"] = np.ones(dd, np.float32)
                sd[f"{p}.{nrm}.bias"] = np.zeros(dd, np.float32)
    lin(rng, 256, 128, "fine_preprocess.down_proj")
    lin(rng, 256, 128, "fine_preprocess.merge_feat")

    variables = port.port_loftr(sd)
    # the fixture carries fine_preprocess keys (the original LoFTR
    # outdoor_ds layout); the GIM default is concat=False (ref
    # networks/loftr/config.py:14), so init the concat variant to match
    cfg = LoFTRConfig(max_matches=32, fine_concat_coarse_feat=True)
    init = loftr_model.init_params(jax.random.PRNGKey(0), cfg, (32, 32))

    # structural identity with the initialized tree
    flat_port = jax.tree_util.tree_map(np.shape, variables)
    flat_init = jax.tree_util.tree_map(np.shape, init)
    assert jax.tree_util.tree_structure(flat_port) == \
        jax.tree_util.tree_structure(flat_init)
    assert flat_port == flat_init


def test_loftr_fused_matching_matches_dense():
    """fused_matching=True (Pallas kernel, interpret mode on CPU) must give
    the same matches as the dense path."""
    import dataclasses

    cfg_dense = LoFTRConfig(max_matches=32)
    cfg_fused = dataclasses.replace(cfg_dense, fused_matching=True)
    rng = jax.random.PRNGKey(0)
    img0 = jax.random.uniform(rng, (1, 3, 64, 64))
    img1 = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    variables = loftr_model.init_params(rng, cfg_dense, input_hw=(64, 64))
    with HIGH:
        out_d = loftr_model.LoFTRMatcher(cfg_dense).apply(
            variables, img0, img1)
        out_f = loftr_model.LoFTRMatcher(cfg_fused).apply(
            variables, img0, img1)
    vd = np.asarray(out_d["valid"][0])
    vf = np.asarray(out_f["valid"][0])
    pairs_d = {(int(i), int(j)) for i, j, v in
               zip(np.asarray(out_d["i_ids"][0]),
                   np.asarray(out_d["j_ids"][0]), vd) if v}
    pairs_f = {(int(i), int(j)) for i, j, v in
               zip(np.asarray(out_f["i_ids"][0]),
                   np.asarray(out_f["j_ids"][0]), vf) if v}
    assert pairs_d == pairs_f
    np.testing.assert_allclose(np.asarray(out_f["mconf"][0])[vf].sum(),
                               np.asarray(out_d["mconf"][0])[vd].sum(),
                               rtol=1e-4)


def test_upsample2x_align_corners_both_paths_match_torch():
    """FPN 2x upsample: the gather (default) and matmul implementations
    must both reproduce torch F.interpolate(align_corners=True) exactly
    (they are the same 2-tap blend; see backbone._upsample2x_align_corners
    — the gather path avoids ~55 GFLOP/pair of interpolation matmuls)."""
    import os

    import torch
    import torch.nn.functional as F

    from gim_tpu.models.loftr import backbone as BB

    x = np.random.default_rng(0).random((2, 13, 9, 5)).astype(np.float32)
    t = torch.from_numpy(x.transpose(0, 3, 1, 2).copy())
    ref = F.interpolate(t, scale_factor=2.0, mode="bilinear",
                        align_corners=True).numpy().transpose(0, 2, 3, 1)
    old = os.environ.get("GIM_TPU_GATHER_UPSAMPLE")
    old_v2 = os.environ.get("GIM_TPU_UPSAMPLE_V2")
    try:
        for flag in ("0", "1"):
            os.environ["GIM_TPU_GATHER_UPSAMPLE"] = flag
            out = np.asarray(BB._upsample2x_align_corners(jnp.asarray(x)))
            np.testing.assert_allclose(out, ref, atol=1e-6), flag
        # flat-matmul variant (GIM_TPU_UPSAMPLE_V2): same operators as
        # flag=0, phrased as 2D matmuls on a flattened minor dim
        os.environ["GIM_TPU_GATHER_UPSAMPLE"] = "0"
        os.environ["GIM_TPU_UPSAMPLE_V2"] = "1"
        out = np.asarray(BB._upsample2x_align_corners(jnp.asarray(x)))
        np.testing.assert_allclose(out, ref, atol=1e-6)
    finally:
        for k, v in (("GIM_TPU_GATHER_UPSAMPLE", old),
                     ("GIM_TPU_UPSAMPLE_V2", old_v2)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
