"""Match-assignment ops: dual-softmax coarse matching, fine sub-pixel
expectation, LightGlue double-softmax assignment + mutual filtering.

Reference semantics:
- CoarseMatching dual-softmax + mutual-NN + border removal:
  ref networks/loftr/utils/coarse_matching.py:60-195.
- FineMatching spatial expectation + std: ref utils/fine_matching.py:9-74.
- LightGlue sigmoid-log-double-softmax assignment and filter_matches:
  ref networks/lightglue/models/matchers/lightglue.py:250-304.

All outputs are static-shape: dynamic `torch.where` selections become
capped top-k plus validity masks.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

INF = 1e9


def dual_softmax(sim: jax.Array, temperature: float,
                 mask0: jax.Array | None = None,
                 mask1: jax.Array | None = None) -> jax.Array:
    """conf = softmax(sim/T, rows) * softmax(sim/T, cols), padded cells -INF
    (coarse_matching.py:114-118). sim: [N, L, S]."""
    sim = sim / temperature
    if mask0 is not None:
        valid = mask0[..., None] & mask1[:, None]
        sim = jnp.where(valid, sim, -INF)
    return jax.nn.softmax(sim, axis=1) * jax.nn.softmax(sim, axis=2)


def _border_mask(hc: int, wc: int, border: int,
                 true_hw: jax.Array | None = None) -> jax.Array:
    """(N?, hc*wc) bool: True for cells at least `border` cells from edges.
    true_hw: (N, 2) actual content extent in cells when padded
    (mask_border_with_padding, coarse_matching.py:29-44)."""
    ys = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 0)
    xs = jax.lax.broadcasted_iota(jnp.int32, (hc, wc), 1)
    if true_hw is None:
        ok = ((ys >= border) & (ys < hc - border)
              & (xs >= border) & (xs < wc - border))
        return ok.reshape(hc * wc)
    h = true_hw[:, 0, None, None]
    w = true_hw[:, 1, None, None]
    ok = ((ys[None] >= border) & (ys[None] < h - border)
          & (xs[None] >= border) & (xs[None] < w - border))
    return ok.reshape(-1, hc * wc)


@partial(jax.jit, static_argnames=("hw0_c", "hw1_c", "border", "max_matches",
                                   "threshold"))
def mutual_topk_matches(conf: jax.Array, *, hw0_c: tuple[int, int],
                        hw1_c: tuple[int, int], threshold: float,
                        border: int, max_matches: int,
                        true_hw0: jax.Array | None = None,
                        true_hw1: jax.Array | None = None):
    """Static-shape port of CoarseMatching.get_coarse_match (:150-195).

    conf: [N, L, S]. Returns dict of i_ids/j_ids (N, M) int32, mconf (N, M),
    valid (N, M) bool, where M = max_matches; matches are the mutually-
    nearest cells above threshold outside the border, ranked by confidence.
    """
    N, L, S = conf.shape
    mask = conf > threshold
    b0 = _border_mask(*hw0_c, border, true_hw0)
    b1 = _border_mask(*hw1_c, border, true_hw1)
    b0 = b0 if b0.ndim == 2 else b0[None]
    b1 = b1 if b1.ndim == 2 else b1[None]
    mask = mask & b0[:, :, None] & b1[:, None, :]

    mask = (mask
            & (conf == conf.max(axis=2, keepdims=True))
            & (conf == conf.max(axis=1, keepdims=True)))

    # at most one True per row -> row-max gives the j for each i
    row_valid = mask.any(axis=2)
    j_ids = jnp.argmax(mask, axis=2)
    mconf = jnp.take_along_axis(conf, j_ids[..., None], axis=2)[..., 0]
    mconf = jnp.where(row_valid, mconf, 0.0)

    # rank rows by confidence, keep top max_matches (padded if L < cap)
    k = min(max_matches, L)
    top_conf, i_ids = jax.lax.top_k(mconf, k)
    if k < max_matches:
        pad = max_matches - k
        top_conf = jnp.pad(top_conf, ((0, 0), (0, pad)))
        i_ids = jnp.pad(i_ids, ((0, 0), (0, pad)))
    j_sel = jnp.take_along_axis(j_ids, i_ids, axis=1)
    valid = top_conf > 0.0
    return {"i_ids": i_ids.astype(jnp.int32),
            "j_ids": j_sel.astype(jnp.int32),
            "mconf": top_conf, "valid": valid}


def fused_mutual_topk(n0: jax.Array, n1: jax.Array, temperature: float,
                      mask0, mask1, *, hw0_c, hw1_c, threshold, border,
                      max_matches, true_hw0=None, true_hw1=None):
    """mutual_topk_matches built on the fused Pallas dual-softmax kernel —
    no (L, S) confidence matrix is materialized. Same outputs/semantics as
    `mutual_topk_matches`."""
    from gim_tpu.ops.pallas_kernels.dsmax import dual_softmax_mutual

    N, L, C = n0.shape

    def one(f0, f1, m0, m1):
        # 1024-wide blocks: grid-step overhead dominates small tiles once
        # the call is vmapped over the batch (each step is ~us-scale)
        return dual_softmax_mutual(f0, f1, temperature, m0, m1, block=1024)

    if mask0 is None:
        jbest, conf, mutual = jax.vmap(lambda a, b: one(a, b, None, None))(
            n0, n1)
    else:
        jbest, conf, mutual = jax.vmap(one)(n0, n1, mask0, mask1)

    b0 = _border_mask(*hw0_c, border, true_hw0)
    b1 = _border_mask(*hw1_c, border, true_hw1)
    b0 = b0 if b0.ndim == 2 else jnp.broadcast_to(b0[None], (N,) + b0.shape)
    b1 = b1 if b1.ndim == 2 else jnp.broadcast_to(b1[None], (N,) + b1.shape)
    ok = (mutual & (conf > threshold) & b0
          & jnp.take_along_axis(b1, jbest, axis=1))
    mconf = jnp.where(ok, conf, 0.0)

    k = min(max_matches, L)
    top_conf, i_ids = jax.lax.top_k(mconf, k)
    if k < max_matches:
        pad = max_matches - k
        top_conf = jnp.pad(top_conf, ((0, 0), (0, pad)))
        i_ids = jnp.pad(i_ids, ((0, 0), (0, pad)))
    j_sel = jnp.take_along_axis(jbest, i_ids, axis=1)
    valid = top_conf > 0.0
    return {"i_ids": i_ids.astype(jnp.int32),
            "j_ids": j_sel.astype(jnp.int32),
            "mconf": top_conf, "valid": valid}


def cells_to_kpts(ids: jax.Array, wc: int, scale) -> jax.Array:
    """Flattened coarse cell ids -> xy pixel coords at original resolution
    (coarse_matching.py:240-248). scale broadcasts (scalar or (N,1,2))."""
    x = (ids % wc).astype(jnp.float32)
    y = (ids // wc).astype(jnp.float32)
    return jnp.stack([x, y], axis=-1) * scale


def fine_expectation(feat_f0: jax.Array, feat_f1: jax.Array):
    """Fine sub-pixel refinement (fine_matching.py:15-60).

    feat_f0/feat_f1: [M, WW, C] window features. Returns
    (coords_normalized [M, 2] in [-1, 1] of the W x W window, std [M]).
    """
    M, WW, C = feat_f0.shape
    W = int(WW ** 0.5)
    picked = feat_f0[:, WW // 2, :]
    # broadcast-multiply-reduce, not einsum: "mc,mrc->mr" is M tiny
    # (1,C)@(C,WW) matmuls that serialize on the MXU; the fused VPU
    # reduction is ~an order of magnitude faster at M=16k (docs/PERF.md)
    sim = jnp.sum(picked[:, None, :] * feat_f1, axis=-1)
    heatmap = jax.nn.softmax(sim / (C ** 0.5), axis=1)

    # normalized grid in [-1, 1] (kornia create_meshgrid semantics)
    lin = jnp.linspace(-1.0, 1.0, W)
    gx, gy = jnp.meshgrid(lin, lin, indexing="xy")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (WW, 2)

    coords = heatmap @ grid                                       # (M, 2)
    var = (heatmap @ (grid ** 2)) - coords ** 2
    std = jnp.sum(jnp.sqrt(jnp.clip(var, 1e-10)), axis=-1)
    return coords, std


# ---------------------------------------------------------------------------
# LightGlue assignment
# ---------------------------------------------------------------------------

def sigmoid_log_double_softmax(sim: jax.Array, z0: jax.Array,
                               z1: jax.Array) -> jax.Array:
    """Scores (N, L+1, S+1) log-assignment with dustbins
    (lightglue.py:250-263). sim: (N, L, S); z0: (N, L); z1: (N, S)
    matchability logits."""
    N, L, S = sim.shape
    certainties = (jax.nn.log_sigmoid(z0)[..., None]
                   + jax.nn.log_sigmoid(z1)[:, None, :])
    scores0 = jax.nn.log_softmax(sim, axis=2)
    scores1 = jax.nn.log_softmax(sim, axis=1)
    scores = jnp.full((N, L + 1, S + 1), 0.0, dtype=sim.dtype)
    scores = scores.at[:, :L, :S].set(scores0 + scores1 + certainties)
    scores = scores.at[:, :-1, -1].set(jax.nn.log_sigmoid(-z0))
    scores = scores.at[:, -1, :-1].set(jax.nn.log_sigmoid(-z1))
    return scores


def filter_matches(scores: jax.Array, threshold: float):
    """Mutual-NN + threshold filtering on the (L+1, S+1) log-assignment
    (lightglue.py:287-304). Returns m0, m1 (argmax partner, -1 if none),
    mscores0, mscores1."""
    max0 = scores[:, :-1, :-1].max(axis=2)
    m0 = scores[:, :-1, :-1].argmax(axis=2)
    max1 = scores[:, :-1, :-1].max(axis=1)
    m1 = scores[:, :-1, :-1].argmax(axis=1)
    L = m0.shape[1]
    S = m1.shape[1]
    ind0 = jnp.arange(L)[None]
    ind1 = jnp.arange(S)[None]
    mutual0 = ind0 == jnp.take_along_axis(m1, m0, axis=1)
    mutual1 = ind1 == jnp.take_along_axis(m0, m1, axis=1)
    mscores0 = jnp.where(mutual0, jnp.exp(max0), 0.0)
    mscores1 = jnp.where(mutual1, jnp.take_along_axis(mscores0, m1, axis=1), 0.0)
    valid0 = mutual0 & (mscores0 > threshold)
    valid1 = mutual1 & jnp.take_along_axis(valid0, m1, axis=1)
    m0 = jnp.where(valid0, m0, -1)
    m1 = jnp.where(valid1, m1, -1)
    return m0, m1, mscores0, mscores1
