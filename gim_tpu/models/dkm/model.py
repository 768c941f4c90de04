"""gim_dkm matcher: ResNet-50 pyramid -> GP regression (1/32, 1/16) ->
DFN embedding decoder -> per-scale ConvRefiners -> dense warp + certainty,
with the two-pass upsample refinement.

Parity target: ref networks/dkm/models/dkm.py Decoder (:403-534) and
RegressionMatcher (:537-753), wired per model_zoo/DKMv3.py:5-145
(gp_dim 256, dfn_dim 384, refiner radii 7/3/2, proj 1024->512 & 2048->512,
symmetric matching, two-pass upsample to (1152, 1536), certainty
attenuation :688-693, black-pixel masking :726-731).

Everything is one traced graph with static shapes; both passes and both
directions (symmetric) run batched through the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gim_tpu.config import DKMConfig
from gim_tpu.models.dkm.blocks import (GP, ConvRefiner, DFNScale,
                                       coords_grid, kde_density, resize_nhwc,
                                       resize_region_nhwc, sample_nhwc)
from gim_tpu.models.dkm.encoder import ResNet50Pyramid

REFINER_SPECS = {
    # scale: (in_dim, hidden_dim, disp_emb_dim, local_corr_radius)
    # ref DKMv3.py:52-111
    "16": (2 * 512 + 128 + 225, 2 * 512 + 128 + 225, 128, 7),
    "8": (2 * 512 + 64 + 49, 2 * 512 + 64 + 49, 64, 3),
    "4": (2 * 256 + 32 + 25, 2 * 256 + 32 + 25, 32, 2),
    "2": (2 * 64 + 16, 128 + 16, 16, None),
    "1": (2 * 3 + 6, 24, 6, None),
}


class DKMDecoder(nn.Module):
    cfg: DKMConfig
    train: bool = False

    @nn.compact
    def __call__(self, f1: dict, f2: dict, upsample: bool = False,
                 dense_flow=None, dense_certainty=None):
        c = self.cfg
        scales = ["8", "4", "2", "1"] if upsample else \
            ["32", "16", "8", "4", "2", "1"]
        sizes = {s: f1[s].shape[1:3] for s in f1}
        H, W = sizes[1]
        B = f1[1].shape[0]
        coarsest = int(scales[0])

        old_stuff = jnp.zeros((B, *sizes[coarsest], c.dfn_dim),
                              dtype=c.dtype)
        if not upsample:
            dense_flow = coords_grid(B, *sizes[coarsest])
            dense_certainty = jnp.zeros((B, *sizes[coarsest], 1))
        else:
            dense_flow = resize_nhwc(dense_flow, *sizes[coarsest])
            dense_certainty = resize_nhwc(dense_certainty, *sizes[coarsest])

        out = {}
        for s in scales:
            ins = int(s)
            f1_s, f2_s = f1[ins], f2[ins]
            if s in ("16", "32"):
                proj = nn.Conv(512, (1, 1), dtype=c.dtype, name=f"proj_{s}")
                f1_s, f2_s = proj(f1_s), proj(f2_s)
            if ins in (32, 16) and not upsample:
                old_stuff = resize_nhwc(old_stuff, *sizes[ins])
                # eval replicates the reference's n>2000 batched-inverse
                # bug (GP.bug_compat note); training keeps correct math
                new_stuff = GP(c.gp_dim,
                               bug_compat=(c.gp_inv_bug_compat
                                           and not self.train),
                               name=f"gp_{s}")(f1_s, f2_s)
                dense_flow, dense_certainty, old_stuff = DFNScale(
                    c.feat_dim, c.dfn_dim, self.train, c.dtype,
                    name=f"dfn_{s}")(new_stuff, f1_s, old_stuff)
            if s in REFINER_SPECS and (ins <= 16) and s in c.refiner_scales:
                in_dim, hid, emb, rad = REFINER_SPECS[s]
                # train: rematerialize the refiner in backward — its 8
                # hidden-block activations at scales 4/2/1 are the peak
                # HBM term (672px bs1 OOMs a 16G v5e without this;
                # jax.checkpoint trades ~1 extra forward for the win)
                Refiner = nn.remat(ConvRefiner) if self.train else ConvRefiner
                delta_cert, disp = Refiner(
                    in_dim, hid, displacement_emb_dim=emb,
                    local_corr_radius=rad, train=self.train, dtype=c.dtype,
                    name=f"refiner_{s}")(f1_s, f2_s, dense_flow)
                dense_flow = jnp.stack([
                    dense_flow[..., 0] + ins * disp[..., 0] / (4 * W),
                    dense_flow[..., 1] + ins * disp[..., 1] / (4 * H),
                ], axis=-1)
                dense_certainty = dense_certainty + delta_cert
            out[ins] = {"dense_flow": dense_flow,
                        "dense_certainty": dense_certainty}
            if s != "1":
                nxt = sizes[ins // 2]
                dense_flow = resize_nhwc(dense_flow, *nxt)
                dense_certainty = resize_nhwc(dense_certainty, *nxt)
                dense_flow = jax.lax.stop_gradient(dense_flow)
                dense_certainty = jax.lax.stop_gradient(dense_certainty)
        return out


class DKMMatcher(nn.Module):
    """Full symmetric two-pass dense matcher (ref dkm.py:655-753)."""

    cfg: DKMConfig
    train: bool = False

    def setup(self):
        self.encoder = ResNet50Pyramid(train=False, dtype=self.cfg.dtype,
                                       name="encoder")
        self.decoder = DKMDecoder(self.cfg, self.train, name="decoder")

    def pyramid(self, x):
        feats = self.encoder(x)
        return feats

    def _symmetric_pyramids(self, q, s):
        feats = self.pyramid(jnp.concatenate([q, s], axis=0))
        B = q.shape[0]
        f_q = {k: v for k, v in feats.items()}
        f_s = {k: jnp.concatenate([v[B:], v[:B]], axis=0)
               for k, v in feats.items()}
        return f_q, f_s

    def train_corresps(self, im0: jax.Array, im1: jax.Array) -> dict:
        """Single-pass per-scale outputs for training: symmetric forward at
        (h_resized, w_resized), no upsample refinement. Returns
        {scale: {dense_flow (2B, h_s, w_s, 2), dense_certainty (2B, ..., 1)}}
        — first B rows are query->support, last B the reverse (the
        reference trains the symmetric batch the same way,
        ref dkm.py:639-647)."""
        c = self.cfg
        q = jnp.transpose(im0, (0, 2, 3, 1))
        s = jnp.transpose(im1, (0, 2, 3, 1))
        q_r = resize_nhwc(q, c.h_resized, c.w_resized)
        s_r = resize_nhwc(s, c.h_resized, c.w_resized)
        f_q, f_s = self._symmetric_pyramids(q_r, s_r)
        return self.decoder(f_q, f_s)

    def __call__(self, im0: jax.Array, im1: jax.Array,
                 extent0: jax.Array | None = None,
                 extent1: jax.Array | None = None):
        """im0/im1: (B, 3, H, W) float [0,1] canvases. extent0/1: optional
        (B, 2) (w_frac, h_frac) valid-region fractions — when given, only
        that top-left region is resampled to the model resolution
        (the reference eval's aspect-distorting resize of the unpadded
        rectangle, ref dkm.py:668-671 + trainer/lightning.py:134-156).
        Returns (warp (B, hs, 2*ws, 4), certainty (B, hs, 2*ws)) in the
        symmetric layout of the reference (:734-742)."""
        c = self.cfg
        B = im0.shape[0]
        q = jnp.transpose(im0, (0, 2, 3, 1))
        s = jnp.transpose(im1, (0, 2, 3, 1))
        hs, ws = c.h_resized, c.w_resized

        def rsz(x, h, w, extent):
            if extent is None:
                return resize_nhwc(x, h, w)
            return resize_region_nhwc(x, h, w, extent)

        q_r = rsz(q, hs, ws, extent0)
        s_r = rsz(s, hs, ws, extent1)

        f_q, f_s = self._symmetric_pyramids(q_r, s_r)
        corresps = self.decoder(f_q, f_s)

        if c.upsample_preds:
            hs, ws = c.upsample_res
        low_res_certainty = resize_nhwc(corresps[16]["dense_certainty"],
                                        hs, ws)
        low_res_certainty = 0.5 * low_res_certainty * (low_res_certainty < 0)

        if c.upsample_preds:
            q_u = rsz(q, hs, ws, extent0)
            s_u = rsz(s, hs, ws, extent1)
            f_q, f_s = self._symmetric_pyramids(q_u, s_u)
            corresps = self.decoder(
                f_q, f_s, upsample=True,
                dense_flow=corresps[1]["dense_flow"],
                dense_certainty=corresps[1]["dense_certainty"])

        flow = corresps[1]["dense_flow"]                   # (2B, hs, ws, 2)
        certainty = corresps[1]["dense_certainty"] - low_res_certainty
        certainty = jax.nn.sigmoid(certainty)[..., 0]      # (2B, hs, ws)

        wrong = (jnp.abs(flow) > 1).any(axis=-1)
        certainty = jnp.where(wrong, 0.0, certainty)

        # black-pixel mask (ref :726-731). Computed on the same resampled
        # content the model saw so canvas padding is excluded in
        # distort-aspect mode (reference computes it on the unpadded
        # rectangle then nearest-resizes to (hs, ws)).
        def black(im, extent):
            if extent is None:
                m = (im < 0.03125).all(axis=-1)
                mr = jax.image.resize(m.astype(jnp.float32),
                                      (m.shape[0], hs, ws), "nearest")
                return mr > 0.5
            return (rsz(im, hs, ws, extent) < 0.03125).all(axis=-1)

        bm = jnp.concatenate([black(q, extent0), black(s, extent1)], axis=0)
        certainty = jnp.where(bm, 0.0, certainty)

        flow = jnp.clip(flow, -1, 1)
        grid = coords_grid(B, hs, ws)
        qts, stq = flow[:B], flow[B:]
        q_warp = jnp.concatenate([grid, qts], axis=-1)     # (B, hs, ws, 4)
        s_warp = jnp.concatenate([stq, grid], axis=-1)
        warp = jnp.concatenate([q_warp, s_warp], axis=2)   # (B, hs, 2ws, 4)
        cert = jnp.concatenate([certainty[:B], certainty[B:]], axis=2)
        return warp, cert


def sample_matches(key: jax.Array, warp: jax.Array, certainty: jax.Array,
                   num: int = 5000, sample_thresh: float = 0.05,
                   mode: str = "threshold_balanced"):
    """Certainty-weighted sampling with balanced KDE resampling
    (ref dkm.py:583-620). warp: (hs, ws2, 4); certainty: (hs, ws2).
    Returns (matches (num, 4) normalized, certainty (num,), valid (num,)).
    Without-replacement multinomials use the Gumbel-top-k trick."""
    matches = warp.reshape(-1, 4)
    cert_raw = certainty.reshape(-1)
    if "threshold" in mode:
        cert = jnp.where(cert_raw > sample_thresh, 1.0, cert_raw)
    else:
        cert = cert_raw
    expansion = 4 if "balanced" in mode else 1
    # at small eval resolutions the dense grid can hold fewer cells than
    # the requested sample budget — clamp (static shapes, so python min)
    n_grab = min(expansion * num, cert.shape[0])
    num = min(num, n_grab)

    k1, k2 = jax.random.split(key)
    logp = jnp.log(jnp.maximum(cert, 1e-12))
    g = logp + jax.random.gumbel(k1, logp.shape)
    _, idx = jax.lax.top_k(g, n_grab)

    def take1d(a, i):
        # flat 1-D fancy indexing scalarizes on TPU (22.8 s vs 2.5 ms for
        # a 40k gather, docs/PERF.md); take_along_axis lowers efficiently
        return jnp.take_along_axis(a[None], i[None], axis=1)[0]

    good_matches = jnp.take_along_axis(matches, idx[:, None], axis=0)
    good_cert = take1d(cert_raw, idx)
    good_w = take1d(cert, idx)

    if "balanced" not in mode:
        return good_matches[:num], good_cert[:num], good_w[:num] > 0

    density = kde_density(good_matches, std=0.1)
    p = 1.0 / (density + 1.0)
    p = jnp.where(density < 10, 1e-7, p)
    g2 = jnp.log(jnp.maximum(p, 1e-30)) + jax.random.gumbel(k2, p.shape)
    _, idx2 = jax.lax.top_k(g2, num)
    return (jnp.take_along_axis(good_matches, idx2[:, None], axis=0),
            take1d(good_cert, idx2), take1d(good_w, idx2) > 0)


def warp_to_pixels(matches: jax.Array, hs: int, ws: int):
    """Normalized warp rows -> pixel kpts in both padded canvases
    (ref demo.py:438-443). matches: (N, 4). Returns (kpts0, kpts1)."""
    k0 = jnp.stack([ws * (matches[:, 0] + 1) / 2,
                    hs * (matches[:, 1] + 1) / 2], axis=-1)
    k1 = jnp.stack([ws * (matches[:, 2] + 1) / 2,
                    hs * (matches[:, 3] + 1) / 2], axis=-1)
    return k0, k1


def init_params(rng: jax.Array, cfg: DKMConfig, input_hw=(64, 96)) -> Any:
    model = DKMMatcher(cfg)
    z = jnp.zeros((1, 3, *input_hw))
    return jax.jit(model.init)(rng, z, z)
