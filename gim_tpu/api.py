"""High-level matcher API.

The single entry point a reference user needs: build a matcher by name
(`gim_lightglue`, `gim_loftr`, `gim_dkm`, `gim_roma`, `root_sift`), feed an
image pair, get `MatchResult` — the normalized output contract of the
reference's per-model inference adapters (ref trainer/lightning.py:124-241:
`{mkpts0_f, mkpts1_f, m_bids, mconf}`), as fixed-shape arrays with a
validity mask.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import flax.struct
import jax
import jax.numpy as jnp
import numpy as np

from gim_tpu import config as C
from gim_tpu.models import lightglue as lg
from gim_tpu.models import superpoint as sp
from gim_tpu.models.loftr import LoFTRMatcher, init_params as loftr_init


@flax.struct.dataclass
class MatchResult:
    """Fixed-shape match set for a batch of pairs."""

    kpts0: jax.Array   # (B, M, 2) pixels in image0 (resized frame)
    kpts1: jax.Array   # (B, M, 2)
    conf: jax.Array    # (B, M)
    valid: jax.Array   # (B, M) bool

    def numpy_pair(self, b: int = 0):
        v = np.asarray(self.valid[b])
        return (np.asarray(self.kpts0[b])[v], np.asarray(self.kpts1[b])[v],
                np.asarray(self.conf[b])[v])


MODEL_ZOO = ("gim_lightglue", "gim_loftr", "gim_dkm", "gim_roma", "root_sift")


class Matcher:
    """Stateful convenience wrapper holding params + jitted apply."""

    def __init__(self, name: str, cfg: C.GimConfig | None = None,
                 variables: Any = None, rng: jax.Array | None = None):
        if name not in MODEL_ZOO:
            raise ValueError(f"unknown model {name}; choose from {MODEL_ZOO}")
        self.name = name
        self.cfg = cfg or C.GimConfig()
        rng = jax.random.PRNGKey(0) if rng is None else rng
        self.variables = variables or self._init(rng)
        self._jitted: dict = {}

    # -- construction -------------------------------------------------------

    def _init(self, rng):
        if self.name == "gim_lightglue":
            r0, r1 = jax.random.split(rng)
            return {
                "superpoint": sp.init_params(r0, self.cfg.superpoint),
                "lightglue": lg.init_params(r1, self.cfg.lightglue),
            }
        if self.name == "gim_loftr":
            return loftr_init(rng, self.cfg.loftr)
        if self.name == "gim_dkm":
            from gim_tpu.models.dkm import init_params as dkm_init

            return dkm_init(rng, self.cfg.dkm)
        if self.name == "gim_roma":
            from gim_tpu.models.roma import init_params as roma_init

            return roma_init(rng, self.cfg.roma)
        if self.name == "root_sift":
            return {}
        raise NotImplementedError(f"{self.name} weights not wired yet")

    @classmethod
    def from_checkpoint(cls, name: str, ckpt_path: str,
                        cfg: C.GimConfig | None = None) -> "Matcher":
        """Build from a checkpoint file. Accepts both worlds a user has:
        a reference-layout torch .ckpt (key-remapped port,
        ref trainer/lightning.py:68-99) or an orbax checkpoint directory
        written by gim_tpu.cli.train (the framework's own training loop)."""
        import os

        from gim_tpu.weights import port

        if os.path.isdir(ckpt_path):
            return cls(name, cfg, variables=load_orbax_variables(ckpt_path))
        sd = port.load_torch_state_dict(ckpt_path)
        if name == "gim_lightglue":
            sp_sd, lg_sd = port.split_gim_lightglue(sd)
            variables = {"superpoint": port.port_superpoint(sp_sd),
                         "lightglue": port.port_lightglue(lg_sd)}
        elif name == "gim_loftr":
            variables = port.port_loftr(sd)
        elif name == "gim_dkm":
            variables = port.port_dkm(sd)
        elif name == "gim_roma":
            import os
            dino_sd = None
            for cand in (os.path.join(os.path.dirname(ckpt_path),
                                      "dinov2_vitl14_pretrain.pth"),):
                if os.path.exists(cand):
                    dino_sd = port.load_torch_state_dict(cand)
            variables = port.port_roma(sd, dino_sd)
        else:
            raise NotImplementedError(name)
        return cls(name, cfg, variables)

    # -- matching -----------------------------------------------------------

    def match(self, image0: jax.Array, image1: jax.Array,
              scale0: jax.Array | None = None,
              scale1: jax.Array | None = None,
              mask0: jax.Array | None = None,
              mask1: jax.Array | None = None) -> MatchResult:
        """image0/1: (B, 3, H, W) float [0,1] (resized/padded frame).
        scale: (B, 2) [w/w', h/h'] to map back to original pixels."""
        B = image0.shape[0]
        if scale0 is None:
            scale0 = jnp.ones((B, 2))
        if scale1 is None:
            scale1 = jnp.ones((B, 2))
        if self.name == "root_sift":
            # host cv2 SIFT detect + on-device RootSIFT matmul matching
            # (ref trainer/lightning.py:195-241) — not jittable end to end
            return _match_root_sift(image0, image1, scale0, scale1)
        fn = self._get_jitted(image0.shape, mask0 is not None)
        return fn(self.variables, image0, image1, scale0, scale1, mask0, mask1)

    def _get_jitted(self, shape, has_mask: bool) -> Callable:
        key = (shape, has_mask)
        if key not in self._jitted:
            self._jitted[key] = jax.jit(partial(match_fn, self.name, self.cfg))
        return self._jitted[key]


def _match_root_sift(image0, image1, scale0, scale1,
                     max_kpts: int = 6144) -> MatchResult:
    """Host+device RootSIFT baseline through the public MatchResult
    contract (ref trainer/lightning.py:195-241: cv2 SIFT detect on host,
    RootSIFT norm, mutual-NN + ratio 0.8 as a device matmul)."""
    from gim_tpu.models.root_sift import detect_rootsift, match_rootsift, \
        pad_to

    B = image0.shape[0]
    k0s, k1s, cs, vs = [], [], [], []
    img0 = np.asarray(image0)
    img1 = np.asarray(image1)
    sc0 = np.asarray(scale0)
    sc1 = np.asarray(scale1)
    for b in range(B):
        rgb0 = (np.transpose(img0[b], (1, 2, 0)) * 255).astype(np.uint8)
        rgb1 = (np.transpose(img1[b], (1, 2, 0)) * 255).astype(np.uint8)
        kp0, d0 = detect_rootsift(rgb0)
        kp1, d1 = detect_rootsift(rgb1)
        kp0p, v0 = pad_to(kp0, max_kpts)
        d0p, _ = pad_to(d0, max_kpts)
        kp1p, v1 = pad_to(kp1, max_kpts)
        d1p, _ = pad_to(d1, max_kpts)
        m, conf = match_rootsift(
            jnp.asarray(kp0p), jnp.asarray(d0p), jnp.asarray(v0),
            jnp.asarray(kp1p), jnp.asarray(d1p), jnp.asarray(v1))
        m = np.asarray(m)
        sel = m >= 0
        k0s.append(kp0p * sc0[b][None])
        k1s.append(kp1p[np.maximum(m, 0)] * sc1[b][None])
        cs.append(np.where(sel, np.asarray(conf), 0.0))
        vs.append(sel)
    return MatchResult(jnp.asarray(np.stack(k0s)), jnp.asarray(np.stack(k1s)),
                       jnp.asarray(np.stack(cs)), jnp.asarray(np.stack(vs)))


def load_orbax_variables(ckpt_dir: str):
    """Restore model variables from an orbax CheckpointManager directory
    (latest step). Training saves {"variables", "opt_state"}; inference
    needs variables only."""
    import os

    import orbax.checkpoint as ocp

    mgr = ocp.CheckpointManager(os.path.abspath(ckpt_dir))
    step = mgr.latest_step()
    if step is None:
        raise FileNotFoundError(f"no orbax checkpoints under {ckpt_dir}")
    restored = mgr.restore(step)
    if "variables" not in restored:
        raise KeyError(f"orbax checkpoint at {ckpt_dir} step {step} has no "
                       f"'variables' entry (keys: {list(restored)})")
    return jax.tree_util.tree_map(jnp.asarray, restored["variables"])


def match_fn(name: str, cfg: C.GimConfig, variables, image0, image1,
             scale0, scale1, mask0=None, mask1=None) -> MatchResult:
    """Pure jittable match function (used directly under pjit)."""
    if name == "gim_lightglue":
        return _match_lightglue(cfg, variables, image0, image1, scale0, scale1,
                                mask0, mask1)
    if name == "gim_loftr":
        out = LoFTRMatcher(cfg.loftr).apply(
            variables, image0, image1, scale0, scale1, mask0, mask1)
        return MatchResult(out["mkpts0_f"], out["mkpts1_f"], out["mconf"],
                           out["valid"])
    if name == "gim_dkm":
        return _match_dkm(cfg, variables, image0, image1, scale0, scale1,
                          mask0, mask1)
    if name == "gim_roma":
        return _match_roma(cfg, variables, image0, image1, scale0, scale1,
                           mask0, mask1)
    raise NotImplementedError(name)


def _mask_extent(mask, B, H, W):
    """(B, 2) (w_frac, h_frac) valid-content fraction of each canvas."""
    if mask is None:
        return None
    h = mask.sum(1).max(-1).astype(jnp.float32)
    w = mask.sum(2).max(-1).astype(jnp.float32)
    return jnp.stack([w / W, h / H], axis=-1)


def _match_roma(cfg: C.GimConfig, variables, image0, image1,
                scale0, scale1, mask0=None, mask1=None) -> MatchResult:
    """RoMa dense warp -> balanced sampling -> original-frame keypoints.

    With `distort_aspect` (the reference ZEB protocol,
    ref trainer/lightning.py:134-156) the valid canvas rectangle is
    resampled straight to RoMa's square model resolution and the normalized
    output coords map back to the rectangle; otherwise the full square
    canvas is used (demo-style)."""
    from gim_tpu.models.roma.model import RoMaMatcher
    from gim_tpu.models.dkm.model import sample_matches

    c = cfg.roma
    B, _, S, _ = image0.shape
    distort = c.distort_aspect and mask0 is not None
    e0 = _mask_extent(mask0, B, S, S) if distort else None
    e1 = _mask_extent(mask1, B, S, S) if distort else None
    warp, cert = RoMaMatcher(c).apply(variables, image0, image1, e0, e1)

    def per_pair(w_b, c_b, key):
        return sample_matches(key, w_b, c_b, c.num_samples, c.sample_thresh,
                              c.sample_mode)

    keys = jax.random.split(jax.random.PRNGKey(11), B)
    matches, conf, valid = jax.vmap(per_pair)(warp, cert, keys)

    if distort:
        wh0 = e0[:, None, :] * S        # (B, 1, 2) valid rect (w, h)
        wh1 = e1[:, None, :] * S
    else:
        wh0 = wh1 = jnp.full((B, 1, 2), float(S))
    k0 = wh0 * (matches[..., 0:2] + 1) / 2
    k1 = wh1 * (matches[..., 2:4] + 1) / 2
    k0 = k0 * scale0[:, None, :]
    k1 = k1 * scale1[:, None, :]
    valid = valid & (conf > 0)
    return MatchResult(k0, k1, jnp.where(valid, conf, 0.0), valid)


def _match_dkm(cfg: C.GimConfig, variables, image0, image1,
               scale0, scale1, mask0=None, mask1=None) -> MatchResult:
    """Dense warp -> balanced sampling -> original-frame keypoints.

    With `distort_aspect` (the reference ZEB protocol: feed the resized
    rectangle straight into match(), whose internal resize to
    (h_resized, w_resized) distorts the aspect ratio —
    ref trainer/lightning.py:134-156, dkm.py:668-671) the valid canvas
    region is resampled to the model resolution via per-image extents;
    otherwise we right-pad the square canvas to the model's w:h aspect
    (the demo's aspect-pad approach, ref demo.py:420-428)."""
    from gim_tpu.models.dkm.model import DKMMatcher, sample_matches

    c = cfg.dkm
    B, _, S, _ = image0.shape
    distort = c.distort_aspect and mask0 is not None
    if distort:
        e0 = _mask_extent(mask0, B, S, S)
        e1 = _mask_extent(mask1, B, S, S)
        im0, im1 = image0, image1
        pad_w = 0
    else:
        e0 = e1 = None
        # pad square canvas -> model aspect (w/h), content stays top-left
        target_w = int(round(S * c.w_resized / c.h_resized))
        pad_w = max(target_w - S, 0)
        im0 = jnp.pad(image0, ((0, 0), (0, 0), (0, 0), (0, pad_w)))
        im1 = jnp.pad(image1, ((0, 0), (0, 0), (0, 0), (0, pad_w)))

    warp, cert = DKMMatcher(c).apply(variables, im0, im1, e0, e1)

    def per_pair(w_b, c_b, key):
        return sample_matches(key, w_b, c_b, c.num_samples, c.sample_thresh,
                              c.sample_mode)

    keys = jax.random.split(jax.random.PRNGKey(7), B)
    matches, conf, valid = jax.vmap(per_pair)(warp, cert, keys)

    if distort:
        wh0 = e0[:, None, :] * S        # (B, 1, 2) valid rect (w, h)
        wh1 = e1[:, None, :] * S
    else:
        wh0 = wh1 = jnp.tile(
            jnp.array([[[float(S + pad_w), float(S)]]]), (B, 1, 1))
    k0 = wh0 * (matches[..., 0:2] + 1) / 2
    k1 = wh1 * (matches[..., 2:4] + 1) / 2
    k0 = k0 * scale0[:, None, :]
    k1 = k1 * scale1[:, None, :]
    valid = valid & (conf > 0)
    return MatchResult(k0, k1, jnp.where(valid, conf, 0.0), valid)


def _match_lightglue(cfg: C.GimConfig, variables, image0, image1,
                     scale0, scale1, mask0=None, mask1=None) -> MatchResult:
    """SuperPoint x2 + LightGlue + match gather (ref demo.py:472-511,
    trainer/lightning.py gim_lightglue adapter)."""
    B, _, H, W = image0.shape

    def true_wh(mask):
        if mask is None:
            return jnp.tile(jnp.array([[W, H]], jnp.float32), (B, 1))
        h = mask.sum(1).max(-1)
        w = mask.sum(2).max(-1)
        return jnp.stack([w, h], -1).astype(jnp.float32)

    wh0 = true_wh(mask0)
    wh1 = true_wh(mask1)
    hw0 = wh0[:, ::-1]
    hw1 = wh1[:, ::-1]

    p0 = sp.extract(variables["superpoint"], image0, cfg.superpoint,
                    image_hw=hw0, pad_rng=jax.random.PRNGKey(97))
    p1 = sp.extract(variables["superpoint"], image1, cfg.superpoint,
                    image_hw=hw1, pad_rng=jax.random.PRNGKey(131))

    out = lg.LightGlue(cfg.lightglue).apply(
        variables["lightglue"], p0["keypoints"], p1["keypoints"],
        p0["descriptors"], p1["descriptors"], wh0, wh1,
        p0["valid"], p1["valid"])

    m0 = out["matches0"]                          # (B, K) partner or -1
    valid = m0 >= 0
    idx = jnp.maximum(m0, 0)
    k0 = p0["keypoints"] * scale0[:, None, :]
    k1 = p1["keypoints"] * scale1[:, None, :]
    k1_m = jnp.take_along_axis(k1, idx[..., None], axis=1)
    conf = out["matching_scores0"]
    return MatchResult(k0, k1_m, jnp.where(valid, conf, 0.0), valid)
