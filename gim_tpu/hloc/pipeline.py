"""hloc pipeline stages: pairing, sparse extract/match, dense match+quantize.

Reference surface: hloc/pairs_from_exhaustive.py:12-63,
hloc/extract_features.py (conf gim_superpoint: 2048 kpts, resize 1920,
:29-40), hloc/match_features.py (conf gim_lightglue :24-34),
hloc/match_dense.py (conf gim_dkm :25-40, loop :204-258). Storage stays
h5 (host-side C library, same as reference) so downstream COLMAP tooling
and the reference's own scripts interoperate.
"""

from __future__ import annotations

import os
from pathlib import Path

import numpy as np


def names_to_pair(name0: str, name1: str, separator: str = "/") -> str:
    """ref hloc/utils/parsers.py:51."""
    return separator.join((name0.replace("/", "-"),
                           name1.replace("/", "-")))


def pairs_from_exhaustive(names: list[str]) -> list[tuple[str, str]]:
    """All i<j pairs (ref hloc/pairs_from_exhaustive.py:12-63)."""
    return [(names[i], names[j]) for i in range(len(names))
            for j in range(i + 1, len(names))]


def list_images(image_dir: str) -> list[str]:
    exts = {".jpg", ".jpeg", ".png", ".bmp"}
    return sorted(p for p in os.listdir(image_dir)
                  if Path(p).suffix.lower() in exts)


# ---------------------------------------------------------------------------
# Sparse: SuperPoint extract + LightGlue match
# ---------------------------------------------------------------------------

def extract_features(image_dir: str, names: list[str], feature_path: str,
                     matcher=None, max_kpts: int = 2048,
                     resize_max: int = 1920,
                     masks: dict | None = None):
    """SuperPoint features -> h5 (ref extract_features.py:176-313,
    gim conf :29-40: nms_radius 3, 2048 kpts, resize_max 1920)."""
    import cv2
    import h5py
    import jax
    import jax.numpy as jnp

    from gim_tpu.api import Matcher
    from gim_tpu.config import GimConfig
    from gim_tpu.models import superpoint as sp
    from gim_tpu.data.zeb import preprocess_host

    matcher = matcher or Matcher("gim_lightglue")
    cfg = matcher.cfg.superpoint

    with h5py.File(feature_path, "a") as fd:
        for name in names:
            if name in fd:
                continue
            img = cv2.cvtColor(cv2.imread(os.path.join(image_dir, name)),
                               cv2.COLOR_BGR2RGB)
            if masks and name in masks:
                img = img * masks[name][..., None].astype(img.dtype)
            color, gray, scale, _, (h_new, w_new) = preprocess_host(
                img, resize_max, df=8, padding=True)
            out = sp.extract(matcher.variables["superpoint"],
                             jnp.asarray(gray)[None], cfg,
                             image_hw=jnp.array([[h_new, w_new]]),
                             pad_rng=jax.random.PRNGKey(3))
            valid = np.asarray(out["valid"][0])
            grp = fd.create_group(name)
            grp.create_dataset(
                "keypoints",
                data=np.asarray(out["keypoints"][0])[valid] * scale[None])
            grp.create_dataset("descriptors",
                               data=np.asarray(out["descriptors"][0])[valid].T)
            grp.create_dataset("scores",
                               data=np.asarray(out["scores"][0])[valid])
            grp.create_dataset("image_size",
                               data=np.array(img.shape[:2][::-1]))
    return feature_path


def match_features(pairs: list[tuple[str, str]], feature_path: str,
                   match_path: str, matcher=None, max_kpts: int = 2048):
    """LightGlue over stored features -> h5 matches
    (ref match_features.py:163-257)."""
    import h5py
    import jax.numpy as jnp

    from gim_tpu.api import Matcher
    from gim_tpu.models import lightglue as lg
    from gim_tpu.ops.matching import filter_matches  # noqa: F401

    matcher = matcher or Matcher("gim_lightglue")

    def load(fd, name):
        k = fd[name]["keypoints"][...]
        d = fd[name]["descriptors"][...].T
        wh = fd[name]["image_size"][...]
        n = len(k)
        kp = np.zeros((max_kpts, 2), np.float32)
        ds = np.zeros((max_kpts, d.shape[1]), np.float32)
        kp[:n] = k[:max_kpts]
        ds[:n] = d[:max_kpts]
        v = np.zeros(max_kpts, bool)
        v[:min(n, max_kpts)] = True
        return kp, ds, v, wh.astype(np.float32)

    with h5py.File(feature_path, "r") as ffd, \
            h5py.File(match_path, "a") as mfd:
        for name0, name1 in pairs:
            key = names_to_pair(name0, name1)
            if key in mfd:
                continue
            k0, d0, v0, wh0 = load(ffd, name0)
            k1, d1, v1, wh1 = load(ffd, name1)
            out = lg.LightGlue(matcher.cfg.lightglue).apply(
                matcher.variables["lightglue"],
                jnp.asarray(k0)[None], jnp.asarray(k1)[None],
                jnp.asarray(d0)[None], jnp.asarray(d1)[None],
                jnp.asarray(wh0)[None], jnp.asarray(wh1)[None],
                jnp.asarray(v0)[None], jnp.asarray(v1)[None])
            m0 = np.asarray(out["matches0"][0])
            sc = np.asarray(out["matching_scores0"][0])
            grp = mfd.create_group(key)
            grp.create_dataset("matches0", data=m0)
            grp.create_dataset("matching_scores0", data=sc)
    return match_path


# ---------------------------------------------------------------------------
# Dense: DKM match -> quantized canonical keypoints
# ---------------------------------------------------------------------------

def match_dense(pairs: list[tuple[str, str]], image_dir: str,
                feature_path: str, match_path: str, matcher=None,
                img_size: int = 672, num_samples: int = 8192,
                cell_size: int = 8, max_error: float = 2.0,
                masks: dict | None = None, max_kps: int = 8192):
    """DKM per pair -> endpoint aggregation -> canonical kpts + matches
    (ref match_dense.py:204-486; sample 8192 per hloc/matchers/dkm.py:60-152)."""
    import cv2
    import h5py
    import jax.numpy as jnp

    from gim_tpu.api import Matcher
    from gim_tpu.config import GimConfig, replace
    from gim_tpu.data.zeb import preprocess_host
    from gim_tpu.hloc.quantize import (KeypointAggregator,
                                       assign_to_keypoints,
                                       matches_from_ids)

    if matcher is None:
        matcher = Matcher("gim_dkm")
    if matcher.name == "gim_dkm":
        matcher.cfg = replace(matcher.cfg,
                              dkm=replace(matcher.cfg.dkm,
                                          num_samples=num_samples))

    cache: dict[str, tuple] = {}

    def load(name):
        if name not in cache:
            img = cv2.cvtColor(cv2.imread(os.path.join(image_dir, name)),
                               cv2.COLOR_BGR2RGB)
            if masks and name in masks:
                img = img * masks[name][..., None].astype(img.dtype)
            cache[name] = preprocess_host(img, img_size, df=8, padding=True)
        return cache[name]

    agg = KeypointAggregator(cell_size, max_error)
    raw: dict[str, dict] = {}
    for name0, name1 in pairs:
        c0, _, s0, _, _ = load(name0)
        c1, _, s1, _, _ = load(name1)
        res = matcher.match(jnp.asarray(c0)[None], jnp.asarray(c1)[None],
                            jnp.asarray(s0)[None], jnp.asarray(s1)[None])
        k0, k1, conf = res.numpy_pair(0)
        agg.add(name0, k0, conf)
        agg.add(name1, k1, conf)
        raw[names_to_pair(name0, name1)] = {
            "k0": k0, "k1": k1, "scores": conf, "n0": name0, "n1": name1}

    canonical = {}
    with h5py.File(feature_path, "a") as fd:
        for name in set(sum(([a, b] for a, b in pairs), [])):
            kpts, score = agg.finalize(name, max_kps)
            canonical[name] = kpts
            if name in fd:
                del fd[name]
            grp = fd.create_group(name)
            grp.create_dataset("keypoints", data=kpts)
            grp.create_dataset("score", data=score)

    with h5py.File(match_path, "a") as fd:
        for key, r in raw.items():
            ids0 = assign_to_keypoints(r["k0"], canonical[r["n0"]], max_error)
            ids1 = assign_to_keypoints(r["k1"], canonical[r["n1"]], max_error)
            m, sc = matches_from_ids(ids0, ids1, r["scores"])
            if key in fd:
                del fd[key]
            grp = fd.create_group(key)
            grp.create_dataset("matches", data=m)
            grp.create_dataset("scores", data=sc)
    return feature_path, match_path
