"""gim_loftr matcher: backbone -> coarse linear-attention transformer ->
dual-softmax mutual matching -> fine window refinement.

Parity target: /root/reference/networks/loftr/loftr.py:43-91 (forward),
utils/coarse_matching.py (dual-softmax + mutual NN), submodules/
fine_preprocess.py (W=5 window gather + coarse-context merge),
utils/fine_matching.py (softmax expectation refine).

TPU design: both images run through the backbone as one batch; the coarse
stage is O(N) linear attention (N = H*W/64 tokens, 11k at 840px); dynamic
match selection is replaced by a static `max_matches` cap with validity
masks (SURVEY §7 hard part (b)); fine windows are gathered only at selected
matches instead of unfolding the full fine map.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gim_tpu.config import LoFTRConfig
from gim_tpu.models.loftr.backbone import ResNetFPN
from gim_tpu.models.loftr.transformer import (LocalFeatureTransformer,
                                              sine_pos_encoding)
from gim_tpu.ops.matching import (cells_to_kpts, dual_softmax,
                                  fine_expectation, fused_mutual_topk,
                                  mutual_topk_matches)
from gim_tpu.ops.windows import extract_windows_batch


class FinePreprocess(nn.Module):
    """Window gather + optional coarse-context merge (ref fine_preprocess.py)."""

    cfg: LoFTRConfig

    @nn.compact
    def __call__(self, feat_f0, feat_f1, feat_c0, feat_c1, i_ids, j_ids,
                 stride: int):
        c = self.cfg
        W = c.fine_window_size

        def gather_windows(feat_f, ids):
            # feat_f: (B, Hf, Wf, Cf); ids: (B, M)
            return extract_windows_batch(feat_f, ids,
                                         window=W, stride=stride)

        f0 = gather_windows(feat_f0, i_ids)
        f1 = gather_windows(feat_f1, j_ids)

        if c.fine_concat_coarse_feat:
            down = nn.Dense(c.d_model_f, name="down_proj")
            merge = nn.Dense(c.d_model_f, name="merge_feat")
            c0 = down(jnp.take_along_axis(feat_c0, i_ids[..., None], axis=1))
            c1 = down(jnp.take_along_axis(feat_c1, j_ids[..., None], axis=1))
            WW = W * W
            f0 = merge(jnp.concatenate(
                [f0, jnp.repeat(c0[:, :, None, :], WW, axis=2)], -1))
            f1 = merge(jnp.concatenate(
                [f1, jnp.repeat(c1[:, :, None, :], WW, axis=2)], -1))
        return f0, f1


def _mix_gt_padding(m: dict, spv: dict, pad_min: int, rng) -> dict:
    """Static-shape port of the reference's train-time coarse sampling
    (ref coarse_matching.py:199-234): the fixed M fine-stage slots hold a
    random subset of predicted matches in the first M - pad_min slots
    (GT-backfilled where the prediction slot is invalid) and random GT
    pairs in the last pad_min slots; GT-padded slots carry mconf 0."""
    M = m["i_ids"].shape[-1]
    pad_min = min(pad_min, M // 2)
    n_keep = M - pad_min
    rng = jax.random.PRNGKey(0) if rng is None else rng
    r1, r2 = jax.random.split(rng)
    B = m["i_ids"].shape[0]

    # shuffle predictions, valid first
    score = m["valid"].astype(jnp.float32) * 2.0 \
        + jax.random.uniform(r1, (B, M))
    _, keep = jax.lax.top_k(score, M)
    i_p = jnp.take_along_axis(m["i_ids"], keep, 1)
    j_p = jnp.take_along_axis(m["j_ids"], keep, 1)
    c_p = jnp.take_along_axis(m["mconf"], keep, 1)
    v_p = jnp.take_along_axis(m["valid"], keep, 1)

    # GT candidates for every slot (uniform over valid GT, w/ replacement —
    # the reference's torch.randint)
    logits = jnp.where(spv["valid"], 0.0, -1e9)
    gidx = jax.random.categorical(r2, logits[:, None, :].repeat(M, 1))
    i_g = jnp.take_along_axis(spv["i_ids"], gidx, 1)
    j_g = jnp.take_along_axis(spv["j_ids"], gidx, 1)
    v_g = jnp.take_along_axis(spv["valid"], gidx, 1)

    slot = jnp.arange(M)[None, :]
    use_pred = (slot < n_keep) & v_p
    out = dict(m)
    out["i_ids"] = jnp.where(use_pred, i_p, i_g)
    out["j_ids"] = jnp.where(use_pred, j_p, j_g)
    out["mconf"] = jnp.where(use_pred, c_p, 0.0)
    out["valid"] = use_pred | v_g
    return out


class LoFTRMatcher(nn.Module):
    cfg: LoFTRConfig
    train_mode: bool = False
    axis_name: str | None = None

    @nn.compact
    def __call__(self, color0, color1, scale0=None, scale1=None,
                 mask0=None, mask1=None, spv=None, sample_rng=None):
        """color0/1: (B, 3, H, W) float [0,1]; scale0/1: (B, 2) [w/w', h/h'];
        mask0/1: (B, H, W) bool content masks for padded canvases.

        spv (train only): dict with i_ids/j_ids (B, G) ground-truth coarse
        cell pairs + valid (B, G) — enables the reference's train-time
        coarse sampling (random subset of predictions + >= pad_num_gt_min
        GT-padded slots with mconf 0 feeding the fine stage,
        ref networks/loftr/utils/coarse_matching.py:199-234). sample_rng:
        PRNGKey for that sampling.

        Returns dict: mkpts0_f/mkpts1_f (B, M, 2) in ORIGINAL image pixels,
        mconf (B, M), valid (B, M), plus coarse tensors for training.
        """
        c = self.cfg
        B, _, H, W = color0.shape
        hc, wc = H // c.resolution[0], W // c.resolution[0]
        hf, wf = H // c.resolution[1], W // c.resolution[1]
        stride = c.resolution[0] // c.resolution[1]

        x = jnp.concatenate([color0, color1], axis=0)
        x = jnp.transpose(x, (0, 2, 3, 1))                     # NHWC
        feat_c, feat_f = ResNetFPN(c.block_dims, self.train_mode,
                                   self.axis_name, c.dtype,
                                   name="backbone")(x)
        feat_c0, feat_c1 = feat_c[:B], feat_c[B:]
        feat_f0, feat_f1 = feat_f[:B], feat_f[B:]

        # positional encoding + flatten to sequences
        pe = jnp.asarray(sine_pos_encoding(c.d_model_c, hc, wc,
                                           c.temp_bug_fix), feat_c0.dtype)
        f0 = feat_c0.reshape(B, hc * wc, c.d_model_c) + pe[None]
        f1 = feat_c1.reshape(B, hc * wc, c.d_model_c) + pe[None]

        mask_c0 = mask_c1 = None
        true_hw0 = true_hw1 = None
        if mask0 is not None:
            mask_c0 = mask0[:, ::c.resolution[0], ::c.resolution[0]]
            mask_c1 = mask1[:, ::c.resolution[0], ::c.resolution[0]]
            true_hw0 = jnp.stack([mask_c0.sum(1).max(-1), mask_c0.sum(2).max(-1)],
                                 axis=-1).astype(jnp.int32)
            true_hw1 = jnp.stack([mask_c1.sum(1).max(-1), mask_c1.sum(2).max(-1)],
                                 axis=-1).astype(jnp.int32)
            mask_c0 = mask_c0.reshape(B, -1)
            mask_c1 = mask_c1.reshape(B, -1)

        f0, f1 = LocalFeatureTransformer(
            c.d_model_c, c.nhead_c, c.layer_names_c, c.attention_c, c.dtype,
            name="loftr_coarse")(f0, f1, mask_c0, mask_c1)

        # coarse matching: dual softmax + mutual NN + static top-k.
        # dense path runs f32; the fused kernel keeps the model dtype for
        # its MXU sweeps (f32 accumulation + f32 softmax stats inside)
        n0 = f0.astype(jnp.float32) / c.d_model_c ** 0.5
        n1 = f1.astype(jnp.float32) / c.d_model_c ** 0.5
        conf = None
        if c.fused_matching and not self.train_mode:
            nk0 = (f0 / c.d_model_c ** 0.5)
            nk1 = (f1 / c.d_model_c ** 0.5)
            m = fused_mutual_topk(nk0, nk1, c.dsmax_temperature,
                                  mask_c0, mask_c1, hw0_c=(hc, wc),
                                  hw1_c=(hc, wc),
                                  threshold=c.match_threshold,
                                  border=c.border_rm,
                                  max_matches=c.max_matches,
                                  true_hw0=true_hw0, true_hw1=true_hw1)
        else:
            sim = jnp.einsum("nlc,nsc->nls", n0, n1)
            conf = dual_softmax(sim, c.dsmax_temperature, mask_c0, mask_c1)
            m = mutual_topk_matches(conf, hw0_c=(hc, wc), hw1_c=(hc, wc),
                                    threshold=c.match_threshold,
                                    border=c.border_rm,
                                    max_matches=c.max_matches,
                                    true_hw0=true_hw0, true_hw1=true_hw1)

        if self.train_mode and spv is not None:
            m = _mix_gt_padding(m, spv, c.train_pad_num_gt_min, sample_rng)

        # fine refinement
        ff0, ff1 = FinePreprocess(c, name="fine_preprocess")(
            feat_f0, feat_f1, f0, f1, m["i_ids"], m["j_ids"], stride)
        M = c.max_matches
        WW = c.fine_window_size ** 2
        ff0 = ff0.reshape(B * M, WW, c.d_model_f)
        ff1 = ff1.reshape(B * M, WW, c.d_model_f)
        ff0, ff1 = LocalFeatureTransformer(
            c.d_model_f, c.nhead_f, c.layer_names_f, c.attention_f, c.dtype,
            name="loftr_fine")(ff0, ff1)
        coords_n, std = fine_expectation(ff0.astype(jnp.float32),
                                         ff1.astype(jnp.float32))
        coords_n = coords_n.reshape(B, M, 2)
        std = std.reshape(B, M)

        # assemble pixel coordinates at original resolution
        scale_c = float(c.resolution[0])
        scale_f = float(c.resolution[1])
        s0 = scale_c if scale0 is None else scale_c * scale0[:, None, :]
        s1 = scale_c if scale1 is None else scale_c * scale1[:, None, :]
        s1f = scale_f if scale1 is None else scale_f * scale1[:, None, :]
        mkpts0_c = cells_to_kpts(m["i_ids"], wc, s0)
        mkpts1_c = cells_to_kpts(m["j_ids"], wc, s1)
        # fine correction: +/- (W//2) fine cells (ref fine_matching.py:63-69)
        mkpts1_f = mkpts1_c + coords_n * (c.fine_window_size // 2) * s1f

        return {
            "mkpts0_f": mkpts0_c,
            "mkpts1_f": mkpts1_f,
            "mkpts0_c": mkpts0_c,
            "mkpts1_c": mkpts1_c,
            "mconf": m["mconf"],
            "valid": m["valid"],
            "i_ids": m["i_ids"],
            "j_ids": m["j_ids"],
            "conf_matrix": conf,
            "expec_f": jnp.concatenate([coords_n, std[..., None]], -1),
            "hw_c": (hc, wc),
        }


def init_params(rng: jax.Array, cfg: LoFTRConfig,
                input_hw=(64, 64)) -> Any:
    model = LoFTRMatcher(cfg)
    z = jnp.zeros((1, 3, *input_hw))
    # jit: eager init dispatches every op separately (minutes on a tunneled TPU)
    return jax.jit(model.init)(rng, z, z)
