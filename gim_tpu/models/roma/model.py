"""gim_roma matcher.

Parity target: ref networks/roma/roma.py — VGG19-bn fine pyramid (:139-152),
frozen DINOv2 ViT-L/14 coarse features at 1/14 labeled scale "16"
(:583-633), GP(16) with 512-d fourier basis (:27-136, builder :1220-1228),
5-block transformer match decoder as a classifier over a 64x64+1 anchor
grid (:952-1015, builder :1129-1137), cls_to_flow_refine softmax-argmax
5-neighbour flow (:1091-1121), per-scale ConvRefiners with BN-momentum 0.01
and displacement-first outputs (:436-580, builder :1144-1213), per-scale
1x1+BN projections (:1230-1243), symmetric two-pass matching with
certainty attenuation (:815-917).
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from gim_tpu.config import RoMaConfig
from gim_tpu.models.dinov2 import Block, DinoViT
from gim_tpu.models.dkm.blocks import (GP, ConvRefiner, coords_grid,
                                       resize_nhwc, resize_region_nhwc)
from gim_tpu.models.dkm.model import sample_matches  # shared sampler

ROMA_REFINER_SPECS = {
    # scale: (in_dim, hidden_dim, disp_emb_dim, radius)  ref roma.py:1144-1213
    "16": (2 * 512 + 128 + 225, 2 * 512 + 128 + 225, 128, 7),
    "8": (2 * 512 + 64 + 49, 2 * 512 + 64 + 49, 64, 3),
    "4": (2 * 256 + 32 + 25, 2 * 256 + 32 + 25, 32, 2),
    "2": (2 * 64 + 16, 128 + 16, 16, None),
    "1": (2 * 9 + 6, 24, 6, None),
}

PROJ_SPECS = {"16": (1024, 512), "8": (512, 512), "4": (256, 256),
              "2": (128, 64), "1": (64, 9)}


class VGG19(nn.Module):
    """torchvision vgg19_bn features[:40] pyramid (ref roma.py:139-152).
    Returns features captured right BEFORE each maxpool: scales 1,2,4,8."""

    train: bool = False
    dtype: str = "float32"

    @nn.compact
    def __call__(self, x):
        x = x.astype(self.dtype)
        # vgg19_bn configuration up to index 39: 64x2 M 128x2 M 256x4 M 512x4
        cfg = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
               512, 512, 512, 512]
        feats = {}
        scale = 1
        i = 0
        for v in cfg:
            if v == "M":
                feats[scale] = x
                scale *= 2
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding="SAME", dtype=self.dtype,
                            name=f"conv_{i}")(x)
                x = nn.BatchNorm(use_running_average=not self.train,
                                 momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                                 name=f"bn_{i}")(x)
                x = nn.relu(x)
                i += 1
        feats[scale] = x  # scale 8 features (before the 4th maxpool)
        return feats


class TransformerDecoder(nn.Module):
    """5 ViT blocks over [gp_posterior; features] tokens -> 64^2+1 classifier
    (ref roma.py:952-1015)."""

    hidden_dim: int = 1024
    out_dim: int = 64 * 64 + 1
    num_blocks: int = 5
    dtype: str = "float32"

    @nn.compact
    def __call__(self, gp_posterior, features):
        x = jnp.concatenate([gp_posterior, features], axis=-1)  # NHWC
        B, H, W, C = x.shape
        tokens = x.reshape(B, H * W, C)
        for i in range(self.num_blocks):
            tokens = Block(self.hidden_dim, 8, layerscale=False,
                           qkv_bias=False, dtype=self.dtype,
                           name=f"block_{i}")(tokens)
        out = nn.Dense(self.out_dim, dtype=self.dtype, name="to_out")(tokens)
        # logits are geometry-bearing (argmax + neighbour softmax in
        # cls_to_flow_refine): return f32 regardless of compute dtype
        out = out.reshape(B, H, W, self.out_dim).astype(jnp.float32)
        return out[..., :-1], out[..., -1:]   # cls logits, certainty


def cls_to_flow_refine(cls_logits: jax.Array) -> jax.Array:
    """Anchor classifier -> flow via argmax + 4-neighbour refinement
    (ref roma.py:1091-1121). cls_logits: (B, H, W, C=res^2). Returns
    (B, H, W, 2) normalized flow."""
    B, H, W, C = cls_logits.shape
    res = round(math.sqrt(C))
    lin = jnp.linspace(-1 + 1 / res, 1 - 1 / res, res)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    G = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # (C, 2)

    probs = jax.nn.softmax(cls_logits, axis=-1)
    mode = jnp.argmax(probs, axis=-1)
    idx = jnp.stack([mode - 1, mode, mode + 1, mode - res, mode + res],
                    axis=-1)
    idx = jnp.clip(idx, 0, C - 1)
    neigh = jnp.take_along_axis(probs, idx.reshape(B, H, W, 5), axis=-1)
    # take_along_axis row gather (leading-dim fancy indexing with an N-D
    # index scalarizes on TPU, docs/PERF.md)
    anchors = jnp.take_along_axis(
        G, idx.reshape(-1)[:, None], axis=0).reshape(B, H, W, 5, 2)
    flow = jnp.sum(neigh[..., None] * anchors, axis=-2)
    return flow / jnp.sum(neigh, axis=-1, keepdims=True)


class RoMaDecoder(nn.Module):
    cfg: RoMaConfig
    train: bool = False

    @nn.compact
    def __call__(self, f1, f2, upsample=False, flow=None, certainty=None,
                 scale_factor: float = 1.0):
        c = self.cfg
        scales = ["8", "4", "2", "1"] if upsample else \
            ["16", "8", "4", "2", "1"]
        if upsample:
            # profiling-only knob (tools/profile/roma_stages.py): run just
            # the first N upsample scales to attribute the refiner cascade
            import os
            _pfx = os.environ.get("GIM_TPU_ROMA_UPS_PREFIX")
            if _pfx:
                scales = scales[:int(_pfx)]
        sizes = {s: f1[s].shape[1:3] for s in f1}
        H, W = sizes[1]
        B = f1[1].shape[0]
        coarsest = int(scales[0])

        if not upsample:
            flow = coords_grid(B, *sizes[coarsest])
            certainty = jnp.zeros((B, *sizes[coarsest], 1))
        else:
            flow = resize_nhwc(flow, *sizes[coarsest])
            certainty = resize_nhwc(certainty, *sizes[coarsest])

        out = {}
        refine_init = 4
        for s in scales:
            ins = int(s)
            f1_s, f2_s = f1[ins], f2[ins]
            cin, cout = PROJ_SPECS[s]
            proj_conv = nn.Conv(cout, (1, 1), dtype=c.dtype,
                                name=f"proj_{s}_conv")
            proj_bn = nn.BatchNorm(use_running_average=not self.train,
                                   momentum=0.9, epsilon=1e-5, dtype=c.dtype,
                                   name=f"proj_{s}_bn")
            f1_s = proj_bn(proj_conv(f1_s))
            f2_s = proj_bn(proj_conv(f2_s))

            if ins == 16 and not upsample:
                gp_post = GP(512, name="gp_16")(f1_s, f2_s)
                cls_logits, certainty = TransformerDecoder(
                    c.decoder_dim, c.cls_to_coord_res ** 2 + 1,
                    c.num_decoder_blocks, dtype=c.dtype,
                    name="coordinate_decoder")(gp_post, f1_s)
                flow = jax.lax.stop_gradient(cls_to_flow_refine(cls_logits))
                out[ins] = {"gm_cls": cls_logits, "gm_certainty": certainty}
            else:
                out[ins] = {}

            in_dim, hid, emb, rad = ROMA_REFINER_SPECS[s]
            # train-time remat: see dkm/model.py — refiner hiddens are the
            # peak-memory term at full train resolution
            Refiner = nn.remat(ConvRefiner) if self.train else ConvRefiner
            delta_cert, disp = Refiner(
                in_dim, hid, displacement_emb_dim=emb,
                local_corr_radius=rad, train=self.train, disp_first=True,
                dtype=c.dtype, name=f"refiner_{s}")(
                    f1_s, f2_s, flow,
                    emb_scale=40.0 / 32.0 * scale_factor)
            displacement = jnp.stack([
                ins * disp[..., 0] / (refine_init * W),
                ins * disp[..., 1] / (refine_init * H)], axis=-1)
            flow = flow + displacement
            certainty = certainty + delta_cert

            out[ins].update({"certainty": certainty, "flow": flow})
            if s != "1":
                nxt = sizes[ins // 2]
                flow = resize_nhwc(flow, *nxt)
                certainty = resize_nhwc(certainty, *nxt)
                flow = jax.lax.stop_gradient(flow)
                certainty = jax.lax.stop_gradient(certainty)
        return out


class RoMaMatcher(nn.Module):
    """Symmetric two-pass dense matcher (ref roma.py:815-917)."""

    cfg: RoMaConfig
    train: bool = False

    def setup(self):
        self.vgg = VGG19(train=False, dtype=self.cfg.dtype, name="vgg")
        # frozen encoder runs at the model compute dtype (bf16 at eval —
        # the reference also runs DINOv2 reduced-precision, roma dino fp16)
        self.dino = DinoViT(depth=self.cfg.dino_depth,
                            dtype=self.cfg.dtype, name="dino")
        self.decoder = RoMaDecoder(self.cfg, self.train, name="decoder")

    def pyramids(self, q, s, upsample: bool):
        x = jnp.concatenate([q, s], axis=0)
        feats = self.vgg(x)
        if not upsample:
            # frozen DINOv2 coarse features at the 1/14 grid, labeled 16
            nchw = jnp.transpose(x, (0, 3, 1, 2))
            tokens = jax.lax.stop_gradient(self.dino(nchw))
            B2, H, W, _ = x.shape
            hp, wp = H // 14, W // 14
            feats[16] = tokens.reshape(B2, hp, wp, 1024)
        B = q.shape[0]
        f_q = {k: v for k, v in feats.items()}
        f_s = {k: jnp.concatenate([v[B:], v[:B]], axis=0)
               for k, v in feats.items()}
        return f_q, f_s

    def train_corresps(self, im0, im1) -> dict:
        """Single-pass per-scale outputs for training at coarse_res:
        {scale: {flow (2B, h_s, w_s, 2), certainty, [gm_cls at 16]}} —
        symmetric batch like DKM (first B rows query->support)."""
        c = self.cfg
        q = jnp.transpose(im0, (0, 2, 3, 1))
        s = jnp.transpose(im1, (0, 2, 3, 1))
        hs = ws = c.coarse_res
        q_r = resize_nhwc(q, hs, ws)
        s_r = resize_nhwc(s, hs, ws)
        f_q, f_s = self.pyramids(q_r, s_r, upsample=False)
        return self.decoder(f_q, f_s)

    def __call__(self, im0, im1, extent0=None, extent1=None):
        """im0/im1: (B, 3, H, W) float [0,1] canvases. extent0/1: optional
        (B, 2) (w_frac, h_frac) valid-region fractions — reference eval
        resizes the unpadded rectangle straight to the square model
        resolution (aspect distortion, ref roma.py:826-830 via
        trainer/lightning.py:134-156). Returns
        (warp (B, hs, 2*ws, 4), certainty (B, hs, 2*ws))."""
        c = self.cfg
        B = im0.shape[0]
        q = jnp.transpose(im0, (0, 2, 3, 1))
        s = jnp.transpose(im1, (0, 2, 3, 1))
        hs = ws = c.coarse_res

        def rsz(x, h, w, extent):
            if extent is None:
                return resize_nhwc(x, h, w)
            return resize_region_nhwc(x, h, w, extent)

        q_r = rsz(q, hs, ws, extent0)
        s_r = rsz(s, hs, ws, extent1)

        f_q, f_s = self.pyramids(q_r, s_r, upsample=False)
        corresps = self.decoder(f_q, f_s)

        if c.upsample_preds:
            hs, ws = c.upsample_res
        low_res_certainty = 0.0
        if c.attenuate_cert:
            lrc = resize_nhwc(corresps[16]["certainty"], hs, ws)
            low_res_certainty = 0.5 * lrc * (lrc < 0)

        if c.upsample_preds:
            sf = math.sqrt(c.upsample_res[0] * c.upsample_res[1]
                           / (c.coarse_res * c.coarse_res))
            q_u = rsz(q, hs, ws, extent0)
            s_u = rsz(s, hs, ws, extent1)
            f_q, f_s = self.pyramids(q_u, s_u, upsample=True)
            corresps = self.decoder(f_q, f_s, upsample=True,
                                    flow=corresps[1]["flow"],
                                    certainty=corresps[1]["certainty"],
                                    scale_factor=sf)

        flow = corresps[1]["flow"]
        certainty = corresps[1]["certainty"] - low_res_certainty
        certainty = jax.nn.sigmoid(certainty)[..., 0]

        wrong = (jnp.abs(flow) > 1).any(axis=-1)
        certainty = jnp.where(wrong, 0.0, certainty)

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
        a2b, b2a = flow[:B], flow[B:]
        warp = jnp.concatenate([
            jnp.concatenate([grid, a2b], axis=-1),
            jnp.concatenate([b2a, grid], axis=-1)], axis=2)
        cert = jnp.concatenate([certainty[:B], certainty[B:]], axis=2)
        return warp, cert


def init_params(rng: jax.Array, cfg: RoMaConfig, input_hw=None) -> Any:
    model = RoMaMatcher(cfg)
    hw = input_hw or (cfg.coarse_res, cfg.coarse_res)
    z = jnp.zeros((1, 3, *hw))
    return jax.jit(model.init)(rng, z, z)


__all__ = ["RoMaMatcher", "init_params", "sample_matches",
           "cls_to_flow_refine"]
