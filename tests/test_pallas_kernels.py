"""Pallas kernel parity vs dense jnp reference (interpret mode on CPU)."""

import jax
import pytest
import jax.numpy as jnp
import numpy as np

from gim_tpu.ops.matching import dual_softmax
from gim_tpu.ops.pallas_kernels.dsmax import dual_softmax_mutual


def _dense_reference(f0, f1, T, mask0=None, mask1=None):
    sim = jnp.einsum("lc,sc->ls", f0, f1)[None]
    m0 = mask0[None] if mask0 is not None else None
    m1 = mask1[None] if mask1 is not None else None
    conf = dual_softmax(sim, T, m0, m1)[0]
    jbest = jnp.argmax(conf, axis=1)
    vbest = jnp.max(conf, axis=1)
    ibest = jnp.argmax(conf, axis=0)
    mutual = jnp.take(ibest, jbest) == jnp.arange(f0.shape[0])
    return jbest, vbest, mutual


def test_dsmax_kernel_matches_dense():
    rng = np.random.default_rng(0)
    L, S, C = 70, 90, 32
    f0 = jnp.asarray(rng.standard_normal((L, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
    with jax.default_matmul_precision("highest"):
        jb, vb, mu = dual_softmax_mutual(f0, f1, 0.1, block=128)
        jb_r, vb_r, mu_r = _dense_reference(f0, f1, 0.1)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(vb_r),
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(jb), np.asarray(jb_r))
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu_r))


def test_dsmax_kernel_masked():
    rng = np.random.default_rng(1)
    L, S, C = 40, 50, 16
    f0 = jnp.asarray(rng.standard_normal((L, C)).astype(np.float32))
    f1 = jnp.asarray(rng.standard_normal((S, C)).astype(np.float32))
    m0 = jnp.asarray(rng.random(L) > 0.25)
    m1 = jnp.asarray(rng.random(S) > 0.25)
    with jax.default_matmul_precision("highest"):
        jb, vb, mu = dual_softmax_mutual(f0, f1, 0.1, m0, m1, block=128)
        jb_r, vb_r, mu_r = _dense_reference(f0, f1, 0.1, m0, m1)
    keep = np.asarray(m0)
    np.testing.assert_allclose(np.asarray(vb)[keep], np.asarray(vb_r)[keep],
                               rtol=1e-4, atol=1e-7)
    np.testing.assert_array_equal(np.asarray(jb)[keep],
                                  np.asarray(jb_r)[keep])
    # invalid rows must be non-mutual with zero confidence
    assert not np.asarray(mu)[~keep].any()
    assert (np.asarray(vb)[~keep] == 0).all()


# ---------------------------------------------------------------------------
# fused ConvRefiner block (refiner.py)
# ---------------------------------------------------------------------------

def _flax_block_reference(x_nhwc, params, eps=1e-5):
    """The exact op sequence of ConvRefiner.block (dw conv SAME + BN
    running stats + relu + 1x1), NHWC lax ops."""
    kd = params["conv1"]["kernel"]                   # (K, K, 1, C)
    C = kd.shape[-1]
    y = jax.lax.conv_general_dilated(
        x_nhwc, kd, (1, 1), "SAME", feature_group_count=C,
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    y = y + params["conv1"]["bias"]
    s = params["bn"]["scale"] / np.sqrt(params["bn_stats"]["var"] + eps)
    y = (y - params["bn_stats"]["mean"]) * s + params["bn"]["bias"]
    y = jnp.maximum(y, 0.0)
    y = jnp.einsum("bhwc,cd->bhwd", y, params["conv2"]["kernel"][0, 0])
    return y + params["conv2"]["bias"]


def _rand_block_params(rng, C, C_out, K=5):
    return {
        "conv1": {"kernel": jnp.asarray(
            rng.standard_normal((K, K, 1, C)).astype(np.float32)) * 0.2,
            "bias": jnp.asarray(rng.standard_normal(C).astype(np.float32))
            * 0.1},
        "bn": {"scale": jnp.asarray(
            1.0 + 0.1 * rng.standard_normal(C).astype(np.float32)),
            "bias": jnp.asarray(
                0.1 * rng.standard_normal(C).astype(np.float32))},
        "bn_stats": {"mean": jnp.asarray(
            0.1 * rng.standard_normal(C).astype(np.float32)),
            "var": jnp.asarray(
                (1.0 + 0.2 * rng.random(C)).astype(np.float32))},
        "conv2": {"kernel": jnp.asarray(
            rng.standard_normal((1, 1, C, C_out)).astype(np.float32)) * 0.2,
            "bias": jnp.asarray(
                0.1 * rng.standard_normal(C_out).astype(np.float32))},
    }


@pytest.mark.parametrize("shape,C_out,bh", [
    ((2, 24, 37, 256), 24, 16),      # scale-1-like: narrow C, odd H
    ((1, 40, 16, 128), 56, 8),       # C_out != C_in, H == block
    ((1, 8, 5, 384), 8, 16),         # H smaller than block
    ((1, 16, 12, 200), 16, 16),      # W not a 128-multiple (Wc > W slack)
    ((1, 8, 24, 1344), 8, 12),       # RoMa-like W; block_h not 8-aligned
])
def test_fused_refiner_block_matches_flax(shape, C_out, bh):
    from gim_tpu.ops.pallas_kernels.refiner import (fold_block_params,
                                                    fused_dw_block)

    rng = np.random.default_rng(3)
    B, C, H, W = shape
    x = jnp.asarray(rng.standard_normal((B, C, H, W)).astype(np.float32))
    params = _rand_block_params(rng, C, C_out)
    want = _flax_block_reference(jnp.transpose(x, (0, 2, 3, 1)), params)
    wdw, bdw, w1, b1 = fold_block_params(
        params["conv1"], params["bn"], params["bn_stats"], params["conv2"])
    got = fused_dw_block(x, wdw, bdw, w1, b1, block_h=bh)
    np.testing.assert_allclose(
        np.asarray(jnp.transpose(got, (0, 2, 3, 1))), np.asarray(want),
        rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("shape,bq,bk", [
    ((2, 3, 80, 16), 32, 32),     # N not a block multiple (pad + mask)
    ((1, 2, 64, 32), 64, 32),     # bq != bk
    ((1, 1, 128, 64), 64, 64),    # ViT head dim
])
def test_flash_sdpa_matches_dense(shape, bq, bk):
    """flash.py online-softmax attention == ops.attention.sdpa (the jnp
    ground truth for the DINOv2 ViT path, ref dino.py:303-318)."""
    from gim_tpu.ops.attention import sdpa
    from gim_tpu.ops.pallas_kernels.flash import flash_sdpa

    rng = np.random.default_rng(11)
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32))
               for _ in range(3))
    want = sdpa(q, k, v)
    got = flash_sdpa(q, k, v, block_q=bq, block_k=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_flash_sdpa_bf16_padded():
    from gim_tpu.ops.attention import sdpa
    from gim_tpu.ops.pallas_kernels.flash import flash_sdpa

    rng = np.random.default_rng(12)
    shape = (1, 4, 70, 16)       # 70 -> padded to 128 with masked keys
    q, k, v = (jnp.asarray(rng.standard_normal(shape).astype(np.float32),
                           dtype=jnp.bfloat16) for _ in range(3))
    want = sdpa(q.astype(jnp.float32), k.astype(jnp.float32),
                v.astype(jnp.float32))
    got = flash_sdpa(q, k, v, block_q=64, block_k=64)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, dtype=np.float32),
                               np.asarray(want), rtol=0.05, atol=0.02)
