"""Tiny-config forward tests for gim_roma and the segmentation model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gim_tpu.config import RoMaConfig


def test_cls_to_flow_refine_peak():
    from gim_tpu.models.roma.model import cls_to_flow_refine

    B, H, W, res = 1, 3, 4, 8
    C = res * res
    logits = np.full((B, H, W, C), -5.0, np.float32)
    # peak at anchor (row 2, col 5) => normalized coords of that anchor
    anchor = 2 * res + 5
    logits[..., anchor] = 8.0
    flow = np.asarray(cls_to_flow_refine(jnp.asarray(logits)))
    lin = np.linspace(-1 + 1 / res, 1 - 1 / res, res)
    np.testing.assert_allclose(flow[..., 0], lin[5], atol=0.02)
    np.testing.assert_allclose(flow[..., 1], lin[2], atol=0.02)


def test_dinov2_tiny_forward():
    from gim_tpu.models.dinov2 import DinoViT

    model = DinoViT(embed_dim=64, depth=2, num_heads=4, patch_size=14,
                    pretrain_img_size=28)
    x = jnp.zeros((1, 3, 56, 42))
    vs = jax.jit(model.init)(jax.random.PRNGKey(0), x)
    out = model.apply(vs, x)
    assert out.shape == (1, (56 // 14) * (42 // 14), 64)
    assert np.isfinite(np.asarray(out)).all()


def test_dinov2_bf16_matches_f32():
    """dtype="bfloat16" (the eval perf config) must agree with the f32
    graph to bf16 matmul tolerance: params stay f32, LayerNorms compute
    f32, only the Dense/Conv matmuls run reduced-precision."""
    from gim_tpu.models.dinov2 import DinoViT

    kw = dict(embed_dim=64, depth=2, num_heads=4, patch_size=14,
              pretrain_img_size=28)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 3, 56, 42))
    f32 = DinoViT(**kw)
    vs = jax.jit(f32.init)(jax.random.PRNGKey(0), x)
    out32 = np.asarray(f32.apply(vs, x))
    out16 = np.asarray(DinoViT(dtype="bfloat16", **kw).apply(vs, x))
    assert out16.dtype == np.float32  # final norm computes/returns f32
    scale = np.abs(out32).max()
    assert np.abs(out16 - out32).max() < 0.05 * scale


@pytest.mark.compileheavy  # >100s cold on the 1-core host (r5 durations run)
def test_roma_tiny_forward():
    from gim_tpu.models.roma import model as R

    cfg = RoMaConfig(coarse_res=56, upsample_res=(112, 112),
                     cls_to_coord_res=8, decoder_dim=1024,
                     num_decoder_blocks=1, num_samples=32)
    rng = jax.random.PRNGKey(0)
    variables = R.init_params(rng, cfg)
    img = jax.random.uniform(rng, (1, 3, 56, 56))
    warp, cert = R.RoMaMatcher(cfg).apply(variables, img, img)
    assert warp.shape == (1, 112, 224, 4)
    assert cert.shape == (1, 112, 224)
    assert np.isfinite(np.asarray(warp)).all()


def test_semseg_tiny_forward():
    from gim_tpu.models.semseg import SegmentationModel, init_params

    rng = jax.random.PRNGKey(0)
    vs = init_params(rng, (48, 48))
    x = jnp.zeros((1, 3, 48, 48))
    out = SegmentationModel().apply(vs, x)
    assert out.shape == (1, 48, 48, 150)


def test_make_segmenter_interface():
    from gim_tpu.models.semseg import init_params, make_segmenter

    rng = jax.random.PRNGKey(0)
    vs = init_params(rng, (48, 48))
    seg = make_segmenter(vs, img_size=48)
    rgb = np.random.default_rng(0).integers(0, 255, (60, 80, 3), np.uint8)
    mask = seg(rgb)
    assert mask.shape == (60, 80) and mask.dtype == bool
