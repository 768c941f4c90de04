"""gim_dkm block and pipeline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from gim_tpu.config import DKMConfig
from gim_tpu.models.dkm import blocks as B
from gim_tpu.models.dkm import model as M

HIGH = jax.default_matmul_precision("highest")


def _torch_local_correlation(feature0, feature1, local_radius, flow=None):
    # reference math (networks/dkm/utils/local_correlation.py:5-41)
    b, c, h, w = feature0.size()
    if flow is None:
        coords = torch.meshgrid(
            (torch.linspace(-1 + 1 / h, 1 - 1 / h, h),
             torch.linspace(-1 + 1 / w, 1 - 1 / w, w)), indexing="ij")
        coords = torch.stack((coords[1], coords[0]), dim=-1)[None].expand(
            b, h, w, 2)
    else:
        coords = flow.permute(0, 2, 3, 1)
    r = local_radius
    win = torch.meshgrid(
        (torch.linspace(-2 * r / h, 2 * r / h, 2 * r + 1),
         torch.linspace(-2 * r / w, 2 * r / w, 2 * r + 1)), indexing="ij")
    win = torch.stack((win[1], win[0]), dim=-1)[None].expand(
        b, 2 * r + 1, 2 * r + 1, 2).reshape(b, (2 * r + 1) ** 2, 2)
    coords = (coords[:, :, :, None] + win[:, None, None]).reshape(
        b, h, w * (2 * r + 1) ** 2, 2)
    wf = F.grid_sample(feature1, coords, padding_mode="zeros",
                       align_corners=False)[..., None].reshape(
        b, c, h, w, (2 * r + 1) ** 2)
    return torch.einsum("bchw, bchwk -> bkhw", feature0, wf) / (c ** 0.5)


def test_local_correlation_matches_reference():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 8, 6, 7)).astype(np.float32)  # NCHW
    y = rng.standard_normal((2, 8, 6, 7)).astype(np.float32)
    flow = (rng.random((2, 2, 6, 7)).astype(np.float32) * 1.6 - 0.8)
    ref = _torch_local_correlation(torch.from_numpy(x), torch.from_numpy(y),
                                   2, torch.from_numpy(flow)).numpy()
    with HIGH:
        ours = B.local_correlation(
            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
            jnp.transpose(jnp.asarray(y), (0, 2, 3, 1)), 2,
            flow=jnp.transpose(jnp.asarray(flow), (0, 2, 3, 1)), chunk=7)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


@pytest.mark.parametrize("chunk", [None, 13, 5])
def test_local_correlation_packed_rows_matches_reference(chunk, monkeypatch):
    """GIM_TPU_PACKED_CORR_ROWS=1 (one gather row per (pixel, dy) via the
    shift-packed channel layout) must match the torch reference exactly,
    including windows clipped at every border and fully out-of-bounds flow.
    chunk values force cdy in {Kp, 2, 1} to cover the lax.map padding."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 9, 7, 8)).astype(np.float32)   # NCHW
    y = rng.standard_normal((2, 9, 7, 8)).astype(np.float32)
    flow = (rng.random((2, 2, 7, 8)).astype(np.float32) * 2.4 - 1.2)
    flow[0, :, 0, 0] = -3.0                                    # far OOB
    flow[1, :, -1, -1] = 3.0
    ref = _torch_local_correlation(torch.from_numpy(x), torch.from_numpy(y),
                                   2, torch.from_numpy(flow)).numpy()
    monkeypatch.setenv("GIM_TPU_PACKED_CORR_ROWS", "1")
    kw = {} if chunk is None else {"chunk": chunk * 6}
    with HIGH:
        ours = B.local_correlation(
            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
            jnp.transpose(jnp.asarray(y), (0, 2, 3, 1)), 2,
            flow=jnp.transpose(jnp.asarray(flow), (0, 2, 3, 1)), **kw)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_local_correlation_identity_flow_matches_reference():
    """flow=None (identity grid, the corr_in_other=False path): samples land
    on exact integer pixels (frac 0); windows clip at every border."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 8, 5, 6)).astype(np.float32)  # NCHW
    y = rng.standard_normal((1, 8, 5, 6)).astype(np.float32)
    ref = _torch_local_correlation(torch.from_numpy(x), torch.from_numpy(y),
                                   2, None).numpy()
    with HIGH:
        ours = B.local_correlation(
            jnp.transpose(jnp.asarray(x), (0, 2, 3, 1)),
            jnp.transpose(jnp.asarray(y), (0, 2, 3, 1)), 2)
    ours = np.transpose(np.asarray(ours), (0, 3, 1, 2))
    np.testing.assert_allclose(ours, ref, atol=2e-5)


def test_coords_grid_matches_torch_convention():
    g = np.asarray(B.coords_grid(1, 4, 6))[0]   # (h, w, 2) xy
    ys = np.linspace(-1 + 1 / 4, 1 - 1 / 4, 4)
    xs = np.linspace(-1 + 1 / 6, 1 - 1 / 6, 6)
    np.testing.assert_allclose(g[:, 0, 1], ys, atol=1e-6)
    np.testing.assert_allclose(g[0, :, 0], xs, atol=1e-6)


def test_gp_regression_recovers_position_code():
    """With x == y, GP posterior mean must approximately reproduce the
    position embedding f (K_xy K_yy^-1 f ~ f for sigma -> 0)."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (1, 5, 6, 16))
    gp = B.GP(gp_dim=8, sigma_noise=1e-4)
    with HIGH:
        variables = gp.init(rng, x, x)
        mu = gp.apply(variables, x, x)
        # recompute the basis f directly
        import math
        pos = B.coords_grid(1, 5, 6)
        kernel = variables["params"]["pos_conv"]["kernel"]
        bias = variables["params"]["pos_conv"]["bias"]
        f = jnp.cos(8 * math.pi * (pos @ kernel[0, 0] + bias))
    np.testing.assert_allclose(np.asarray(mu), np.asarray(f), atol=1e-2)


def test_gp_bug_compat_broadcasts_row0_inverse():
    """Reference n>2000 GP bug parity (ref dkm.py:355-359): the empty
    sigma_noise slice makes torch.cat return ONLY batch row 0's K_yy^-1,
    which then broadcasts to every row. bug_compat=True must reproduce
    torch's buggy loop EXACTLY (verified here against the torch snippet at
    a small n via bug_compat_min_n); bug_compat=False is the correct
    batched solve and must differ for row 1."""
    rng = jax.random.PRNGKey(3)
    x = jax.random.normal(rng, (2, 4, 5, 16))
    y = jax.random.normal(jax.random.PRNGKey(4), (2, 4, 5, 16))
    gp_bug = B.GP(gp_dim=8, bug_compat=True, bug_compat_min_n=4)
    gp_ok = B.GP(gp_dim=8, bug_compat=False)
    with HIGH:
        variables = gp_bug.init(rng, x, y)
        mu_bug = gp_bug.apply(variables, x, y)
        mu_ok = gp_ok.apply(variables, x, y)
    # row 0 identical either way; row 1 must differ under the bug
    np.testing.assert_allclose(np.asarray(mu_bug[0]), np.asarray(mu_ok[0]),
                               atol=1e-6)
    assert np.abs(np.asarray(mu_bug[1]) - np.asarray(mu_ok[1])).max() > 1e-4

    # exact torch-loop oracle: K from the same kernel/features
    import math
    xf = np.asarray(x.reshape(2, -1, 16), dtype=np.float64)
    yf = np.asarray(y.reshape(2, -1, 16), dtype=np.float64)

    def cos_k(a, b):
        na = np.sqrt((a ** 2).sum(-1) + 1e-24)
        nb = np.sqrt((b ** 2).sum(-1) + 1e-24)
        c = np.einsum("bnd,bmd->bnm", a, b) / (
            na[..., None] * nb[:, None] + 1e-6)
        return np.exp((c - 1.0) / 0.2)

    kernel = np.asarray(variables["params"]["pos_conv"]["kernel"])[0, 0]
    bias = np.asarray(variables["params"]["pos_conv"]["bias"])
    pos = np.asarray(B.coords_grid(2, 4, 5))
    f = np.cos(8 * math.pi * (pos @ kernel + bias)).reshape(2, -1, 8)
    K_xy = cos_k(xf, yf)
    K_yy = cos_k(yf, yf)
    n = K_yy.shape[-1]
    sigma = 0.1 * np.eye(n)[None]
    # torch's loop: sigma[k:k+1] empty for k=1 -> only row 0 survives cat
    inv0 = np.linalg.inv(K_yy[0] + sigma[0])
    mu_oracle = K_xy @ (inv0 @ f)          # row-0 inverse broadcast
    np.testing.assert_allclose(np.asarray(mu_bug).reshape(2, -1, 8),
                               mu_oracle, rtol=1e-3, atol=1e-3)


def test_gp_cholesky_solve_matches_lu(monkeypatch):
    """GIM_TPU_GP_CHOLESKY=1 (SPD cholesky + triangular solves) must agree
    with the default LU `jnp.linalg.solve` path to f32 solver tolerance;
    A = exp-cos kernel + 0.1*I is SPD by construction (blocks._sym_solve)."""
    rng = jax.random.PRNGKey(7)
    x = jax.random.normal(rng, (2, 6, 7, 16))
    y = jax.random.normal(jax.random.PRNGKey(8), (2, 6, 7, 16))
    gp = B.GP(gp_dim=8)
    with HIGH:
        variables = gp.init(rng, x, y)
        monkeypatch.delenv("GIM_TPU_GP_CHOLESKY", raising=False)
        mu_lu = gp.apply(variables, x, y)
        monkeypatch.setenv("GIM_TPU_GP_CHOLESKY", "1")
        mu_cho = gp.apply(variables, x, y)
    np.testing.assert_allclose(np.asarray(mu_cho), np.asarray(mu_lu),
                               rtol=1e-4, atol=1e-5)


def test_gp_cg_solve_matches_lu(monkeypatch):
    """GIM_TPU_GP_CG=<iters> (batched conjugate gradients, pure-MXU
    matvecs) must agree with the LU path; 64 iterations reach the f32
    floor at the GP's realistic conditioning (smooth features, cond ~77
    measured in the session-4 convergence study)."""
    rng = jax.random.PRNGKey(9)
    x = jax.random.normal(rng, (2, 6, 7, 16))
    y = jax.random.normal(jax.random.PRNGKey(10), (2, 6, 7, 16))
    gp = B.GP(gp_dim=8)
    with HIGH:
        variables = gp.init(rng, x, y)
        monkeypatch.delenv("GIM_TPU_GP_CG", raising=False)
        mu_lu = gp.apply(variables, x, y)
        monkeypatch.setenv("GIM_TPU_GP_CG", "64")
        mu_cg = gp.apply(variables, x, y)
    np.testing.assert_allclose(np.asarray(mu_cg), np.asarray(mu_lu),
                               rtol=1e-4, atol=1e-4)


def test_kde_density_matches_torch_cdist():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((50, 4)).astype(np.float32)
    with HIGH:
        ours = np.asarray(B.kde_density(jnp.asarray(x), std=0.1, chunk=16))
    xt = torch.from_numpy(x)
    ref = (-torch.cdist(xt, xt) ** 2 / (2 * 0.1 ** 2)).exp().sum(-1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


@pytest.mark.compileheavy  # >100s cold on the 1-core host (r5 durations run)
def test_dkm_forward_shapes_tiny():
    cfg = DKMConfig(h_resized=48, w_resized=64, upsample_res=(96, 128),
                    num_samples=64)
    rng = jax.random.PRNGKey(0)
    variables = M.init_params(rng, cfg, input_hw=(48, 64))
    img = jax.random.uniform(rng, (1, 3, 48, 64))
    with HIGH:
        warp, cert = M.DKMMatcher(cfg).apply(variables, img, img)
    assert warp.shape == (1, 96, 256, 4)
    assert cert.shape == (1, 96, 256)
    assert np.isfinite(np.asarray(warp)).all()
    assert np.isfinite(np.asarray(cert)).all()
    m, conf, valid = M.sample_matches(jax.random.PRNGKey(1), warp[0], cert[0],
                                      num=64)
    assert m.shape == (64, 4) and conf.shape == (64,)


def test_resize_region_matches_torch_crop_interpolate():
    """resize_region_nhwc(extent) == F.interpolate of the cropped valid
    rectangle (the reference eval's aspect-distorting resize,
    ref networks/dkm/models/dkm.py:668-671)."""
    rng = np.random.default_rng(3)
    H, W, h, w = 40, 48, 24, 32
    hv, wv = 30, 36                       # valid region
    img = np.zeros((1, H, W, 3), np.float32)
    img[:, :hv, :wv] = rng.standard_normal((1, hv, wv, 3)).astype(np.float32)
    extent = jnp.array([[wv / W, hv / H]], jnp.float32)
    with HIGH:
        ours = np.asarray(B.resize_region_nhwc(jnp.asarray(img), h, w, extent))
    t = torch.from_numpy(img[:, :hv, :wv].transpose(0, 3, 1, 2))
    ref = torch.nn.functional.interpolate(
        t, size=(h, w), mode="bilinear", align_corners=False)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_resize_region_full_extent_equals_resize():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((2, 20, 24, 3)).astype(np.float32)
    extent = jnp.ones((2, 2), jnp.float32)
    with HIGH:
        a = np.asarray(B.resize_region_nhwc(jnp.asarray(img), 10, 12, extent))
        b = np.asarray(B.resize_nhwc(jnp.asarray(img), 10, 12))
    np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-4)


@pytest.mark.compileheavy  # >100s cold on the 1-core host (r5 durations run)
def test_dkm_distort_aspect_end_to_end():
    """match_fn with masks routes through the distort-aspect protocol and
    returns keypoints inside the original (unresized) image bounds."""
    from gim_tpu import api
    from gim_tpu.config import GimConfig, replace

    cfg = GimConfig()
    cfg = replace(cfg, dkm=replace(
        cfg.dkm, h_resized=48, w_resized=64, upsample_res=(96, 128),
        num_samples=64))
    rng = jax.random.PRNGKey(0)
    variables = M.init_params(rng, cfg.dkm, input_hw=(48, 64))
    S = 64
    img = jax.random.uniform(rng, (1, 3, S, S))
    mask = np.zeros((1, S, S), bool)
    mask[:, :48, :64] = True              # valid 48x64 rect
    mask1 = np.zeros((1, S, S), bool)
    mask1[:, :32, :64] = True
    scale0 = jnp.array([[2.0, 2.0]])      # original was 128x96
    scale1 = jnp.array([[2.0, 2.0]])
    with HIGH:
        res = api.match_fn("gim_dkm", cfg, variables, img, img,
                           scale0, scale1, jnp.asarray(mask),
                           jnp.asarray(mask1))
    k0 = np.asarray(res.kpts0)[np.asarray(res.valid)]
    k1 = np.asarray(res.kpts1)[np.asarray(res.valid)]
    assert (k0[:, 0] <= 64 * 2 + 1e-3).all() and (k0[:, 1] <= 48 * 2 + 1e-3).all()
    assert (k1[:, 0] <= 64 * 2 + 1e-3).all() and (k1[:, 1] <= 32 * 2 + 1e-3).all()
    assert (k0 >= -1e-3).all() and (k1 >= -1e-3).all()


def test_sample_nhwc_packed_matches_grid_sample():
    """Packed single-gather warp == 4-gather sample_nhwc == torch
    grid_sample(zeros, align_corners=False), including out-of-range and
    exactly-on-border coords."""
    rng = np.random.default_rng(0)
    img = rng.standard_normal((2, 7, 9, 5)).astype(np.float32)
    pts = rng.uniform(-1.4, 1.4, (2, 6, 11, 2)).astype(np.float32)
    # exercise the exact border cases the clip-and-mask must get right
    pts[0, 0, 0] = [-1.0, -1.0]
    pts[0, 0, 1] = [1.0, 1.0]
    pts[0, 0, 2] = [-1.0 - 2 / 9, 0.0]          # x lands exactly at -1 px
    pts[0, 0, 3] = [0.0, 1.0 + 2 / 7]           # y lands exactly at H px

    got = np.asarray(B.sample_nhwc_packed(jnp.asarray(img),
                                          jnp.asarray(pts)))
    ref4 = np.asarray(B.sample_nhwc(jnp.asarray(img), jnp.asarray(pts)))
    np.testing.assert_allclose(got, ref4, atol=1e-6)

    t = F.grid_sample(torch.from_numpy(img).permute(0, 3, 1, 2),
                      torch.from_numpy(pts), mode="bilinear",
                      padding_mode="zeros", align_corners=False)
    np.testing.assert_allclose(got, t.permute(0, 2, 3, 1).numpy(),
                               atol=1e-5)


def test_conv_refiner_fused_hidden_blocks_match_xla(monkeypatch):
    """ConvRefiner with GIM_TPU_FUSED_REFINER=force must reproduce the
    XLA path bit-for-bit-ish on the same param tree (the fused kernel
    reads the identical flax params via the dummy-call materialization)."""
    import jax

    from gim_tpu.models.dkm.blocks import ConvRefiner

    rng = np.random.default_rng(11)
    B, H, W, C = 1, 19, 33, 8
    x = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((B, H, W, C)).astype(np.float32))
    flow = jnp.asarray(
        (rng.random((B, H, W, 2)) * 1.6 - 0.8).astype(np.float32))
    m = ConvRefiner(in_dim=2 * C + 4, hidden_dim=2 * C + 4,
                    hidden_blocks=3, displacement_emb_dim=4, train=False)
    variables = m.init(jax.random.PRNGKey(0), x, y, flow)

    monkeypatch.setenv("GIM_TPU_FUSED_REFINER", "0")
    cert0, disp0 = m.apply(variables, x, y, flow)
    monkeypatch.setenv("GIM_TPU_FUSED_REFINER", "force")
    cert1, disp1 = m.apply(variables, x, y, flow)
    np.testing.assert_allclose(np.asarray(cert1), np.asarray(cert0),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(disp1), np.asarray(disp0),
                               rtol=1e-4, atol=1e-4)
