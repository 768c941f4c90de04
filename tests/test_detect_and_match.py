"""Tests for NMS / keypoint extraction / matching ops vs reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from gim_tpu.ops import attention as A
from gim_tpu.ops import detect as D
from gim_tpu.ops import matching as M
from gim_tpu.ops import sampling as S
from gim_tpu.ops import windows as W


def _torch_simple_nms(scores, radius):
    # reference algorithm (superpoint.py:61-81), re-expressed for testing
    def max_pool(x):
        return torch.nn.functional.max_pool2d(
            x, kernel_size=radius * 2 + 1, stride=1, padding=radius)

    zeros = torch.zeros_like(scores)
    max_mask = scores == max_pool(scores)
    for _ in range(2):
        supp_mask = max_pool(max_mask.float()) > 0
        supp_scores = torch.where(supp_mask, zeros, scores)
        new_max_mask = supp_scores == max_pool(supp_scores)
        max_mask = max_mask | (new_max_mask & (~supp_mask))
    return torch.where(max_mask, scores, zeros)


def test_simple_nms_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.random((2, 40, 56)).astype(np.float32)
    ours = np.asarray(D.simple_nms(jnp.asarray(x), 3))
    ref = _torch_simple_nms(torch.from_numpy(x)[:, None], 3)[:, 0].numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_topk_keypoints_static():
    x = np.zeros((1, 16, 16), np.float32)
    x[0, 4, 5] = 0.9
    x[0, 10, 2] = 0.5
    kpts, scores, valid = D.topk_keypoints(jnp.asarray(x), k=4, threshold=0.0)
    assert kpts.shape == (1, 4, 2)
    assert int(valid.sum()) == 2
    np.testing.assert_allclose(np.asarray(kpts)[0, 0], [5.0, 4.0])
    np.testing.assert_allclose(np.asarray(scores)[0, :2], [0.9, 0.5])


def test_grid_sample_matches_torch():
    rng = np.random.default_rng(1)
    img = rng.random((2, 3, 9, 11)).astype(np.float32)
    grid = (rng.random((2, 4, 6, 2)).astype(np.float32) * 2.4 - 1.2)
    for ac in (True, False):
        ours = np.asarray(S.grid_sample_nchw(
            jnp.asarray(img), jnp.asarray(grid), align_corners=ac))
        ref = torch.nn.functional.grid_sample(
            torch.from_numpy(img), torch.from_numpy(grid),
            mode="bilinear", align_corners=ac).numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_sample_descriptors_matches_reference_formulas():
    rng = np.random.default_rng(2)
    desc = rng.random((1, 16, 6, 8)).astype(np.float32)
    kpts = (rng.random((1, 5, 2)) * np.array([8 * 8, 6 * 8]) * 0.9).astype(np.float32)

    for legacy in (True, False):
        ours = np.asarray(S.sample_descriptors(
            jnp.asarray(kpts), jnp.asarray(desc), 8, legacy=legacy))[0]
        k = torch.from_numpy(kpts.copy())
        d = torch.from_numpy(desc)
        s = 8
        b, c, h, w = d.shape
        if legacy:
            k = k - s / 2 + 0.5
            k = k / torch.tensor([(w * s - s / 2 - 0.5), (h * s - s / 2 - 0.5)])[None]
            k = k * 2 - 1
            ref = torch.nn.functional.grid_sample(
                d, k.view(b, 1, -1, 2), mode="bilinear", align_corners=True)
        else:
            k = k / (torch.tensor([w, h], dtype=k.dtype) * s)
            k = k * 2 - 1
            ref = torch.nn.functional.grid_sample(
                d, k.view(b, 1, -1, 2), mode="bilinear", align_corners=False)
        ref = torch.nn.functional.normalize(ref.reshape(b, c, -1), p=2, dim=1)
        ref = ref[0].T.numpy()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_linear_attention_chan_matches_head_split():
    """Block-diag channel-layout form == head-split form (the coarse
    transformer's layout-free path)."""
    rng = np.random.default_rng(5)
    N, L, S, Hh, D = 2, 70, 68, 4, 8
    C = Hh * D
    q = rng.standard_normal((N, L, C)).astype(np.float32)
    k = rng.standard_normal((N, S, C)).astype(np.float32)
    v = rng.standard_normal((N, S, C)).astype(np.float32)
    qm = (rng.random((N, L)) > 0.2)
    km = (rng.random((N, S)) > 0.2)
    with jax.default_matmul_precision("highest"):
        chan = np.asarray(A.linear_attention_chan(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), Hh,
            jnp.asarray(qm), jnp.asarray(km)))
        split = np.asarray(A.linear_attention(
            jnp.asarray(q).reshape(N, L, Hh, D),
            jnp.asarray(k).reshape(N, S, Hh, D),
            jnp.asarray(v).reshape(N, S, Hh, D),
            jnp.asarray(qm), jnp.asarray(km))).reshape(N, L, C)
    np.testing.assert_allclose(chan, split, atol=1e-5)


def test_linear_attention_matches_reference_math():
    rng = np.random.default_rng(3)
    q = rng.standard_normal((2, 7, 4, 8)).astype(np.float32)
    k = rng.standard_normal((2, 9, 4, 8)).astype(np.float32)
    v = rng.standard_normal((2, 9, 4, 8)).astype(np.float32)
    qm = (rng.random((2, 7)) > 0.2)
    km = (rng.random((2, 9)) > 0.2)

    with jax.default_matmul_precision("highest"):
        ours = np.asarray(A.linear_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(qm), jnp.asarray(km)))

    tq, tk, tv = map(torch.from_numpy, (q, k, v))
    tqm = torch.from_numpy(qm)
    tkm = torch.from_numpy(km)
    Q = torch.nn.functional.elu(tq) + 1
    K = torch.nn.functional.elu(tk) + 1
    Q = Q * tqm[:, :, None, None]
    K = K * tkm[:, :, None, None]
    V = tv * tkm[:, :, None, None]
    v_len = V.size(1)
    V = V / v_len
    KV = torch.einsum("nshd,nshv->nhdv", K, V)
    Z = 1 / (torch.einsum("nlhd,nhd->nlh", Q, K.sum(dim=1)) + 1e-6)
    ref = (torch.einsum("nlhd,nhdv,nlh->nlhv", Q, KV, Z) * v_len).numpy()
    # masked q rows are garbage in both impls (0 * 1/eps amplification);
    # compare valid rows only
    np.testing.assert_allclose(ours[qm], ref[qm], atol=1e-4)


def test_full_attention_matches_torch_sdpa():
    rng = np.random.default_rng(4)
    q = rng.standard_normal((2, 7, 4, 8)).astype(np.float32)
    k = rng.standard_normal((2, 9, 4, 8)).astype(np.float32)
    v = rng.standard_normal((2, 9, 4, 8)).astype(np.float32)
    with jax.default_matmul_precision("highest"):
        ours = np.asarray(A.full_attention(*(jnp.asarray(x) for x in (q, k, v))))
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q).permute(0, 2, 1, 3),
        torch.from_numpy(k).permute(0, 2, 1, 3),
        torch.from_numpy(v).permute(0, 2, 1, 3)).permute(0, 2, 1, 3).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_dual_softmax_and_mutual_topk():
    # build a conf matrix with two clear mutual matches away from borders
    hw = (6, 8)
    L = S_ = hw[0] * hw[1]
    rng = np.random.default_rng(5)
    feat0 = rng.standard_normal((1, L, 16)).astype(np.float32)
    feat1 = rng.standard_normal((1, S_, 16)).astype(np.float32)
    # make cell (3*8+4)=28 in both images identical => strong match
    feat1[0, 28] = feat0[0, 28]
    feat1[0, 20] = feat0[0, 20] = feat0[0, 28] * -1.3

    f0 = jnp.asarray(feat0) / 16 ** 0.5
    f1 = jnp.asarray(feat1) / 16 ** 0.5
    sim = jnp.einsum("nlc,nsc->nls", f0, f1)
    conf = M.dual_softmax(sim, 0.1)
    out = M.mutual_topk_matches(conf, hw0_c=hw, hw1_c=hw, threshold=0.2,
                                border=2, max_matches=8)
    got = set()
    for i in range(8):
        if bool(out["valid"][0, i]):
            got.add((int(out["i_ids"][0, i]), int(out["j_ids"][0, i])))
    assert (28, 28) in got
    assert (20, 20) in got
    # all matched cells respect the border
    for i, j in got:
        yi, xi = divmod(i, hw[1])
        assert 2 <= yi < hw[0] - 2 and 2 <= xi < hw[1] - 2


def test_fine_expectation_peak():
    # peaked similarity at center-right cell should give positive x offset
    Mn, WW, C = 3, 25, 8
    rng = np.random.default_rng(6)
    f0 = rng.standard_normal((Mn, WW, C)).astype(np.float32)
    f1 = np.zeros_like(f0)
    f1[:, 13] = f0[:, 12] * 10  # strong response one cell right of center
    coords, std = M.fine_expectation(jnp.asarray(f0), jnp.asarray(f1))
    assert coords.shape == (Mn, 2)
    assert np.all(np.asarray(coords)[:, 0] > 0.2)


def test_unfold_matches_torch():
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 10, 12)).astype(np.float32)
    ours, (ho, wo) = W.unfold_nchw(jnp.asarray(x), kernel=5, stride=4, padding=2)
    ref = torch.nn.functional.unfold(
        torch.from_numpy(x), kernel_size=5, stride=4, padding=2).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, atol=1e-6)


def test_extract_windows_batch_matches_unfold():
    """extract_windows_batch at coarse cells == F.unfold(k=W, stride=2,
    pad=W//2) columns at those cells (ref fine_preprocess.py:40-48)."""
    rng = np.random.default_rng(11)
    B, C, H, Wd = 2, 4, 12, 16
    win, stride = 5, 2
    x = rng.standard_normal((B, C, H, Wd)).astype(np.float32)
    n_cells = (H // stride) * (Wd // stride)
    ids = np.stack([rng.permutation(n_cells)[:7] for _ in range(B)])
    ours = W.extract_windows_batch(
        jnp.asarray(np.transpose(x, (0, 2, 3, 1))), jnp.asarray(ids),
        window=win, stride=stride)
    ref = torch.nn.functional.unfold(
        torch.from_numpy(x), kernel_size=win, stride=stride,
        padding=win // 2).numpy()                  # (B, C*win*win, n_cells)
    ref = ref.reshape(B, C, win * win, n_cells)
    for b in range(B):
        refb = ref[b][:, :, ids[b]]                # (C, win*win, 7)
        np.testing.assert_allclose(
            np.asarray(ours)[b], np.transpose(refb, (2, 1, 0)), atol=1e-6)


def test_filter_matches_mutual():
    # scores favor identity assignment
    L = 5
    sim = np.full((1, L, L), -5.0, np.float32)
    np.fill_diagonal(sim[0], 5.0)
    z = np.full((1, L), 5.0, np.float32)
    scores = M.sigmoid_log_double_softmax(jnp.asarray(sim), jnp.asarray(z),
                                          jnp.asarray(z))
    m0, m1, s0, s1 = M.filter_matches(scores, 0.1)
    np.testing.assert_array_equal(np.asarray(m0)[0], np.arange(L))
    np.testing.assert_array_equal(np.asarray(m1)[0], np.arange(L))
    assert np.all(np.asarray(s0)[0] > 0.1)
