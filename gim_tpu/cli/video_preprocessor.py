"""Video -> pseudo-label factory.

Reference surface: video_preprocessor.py (per (video, method, skip, resize)
task: stream gap-sampled frame pairs :103-105, semantic masking of
{person, sky, car} :34-44,312-316, matcher branch :350-511, static-match
watermark removal :514-520, MAGSAC fundamental filter thr 0.5 :569-583,
save (N,4).npy + rolling index :545-566, crash-resumable :221-251).

TPU-native deltas: the per-pair MAGSAC host bottleneck becomes the batched
on-chip fundamental RANSAC; matchers run through gim_tpu.api with static
shapes; segmentation masking is a pluggable `segment(rgb)->bool mask`
(gim_tpu.models.semseg).
"""

from __future__ import annotations

import argparse
import os
from os.path import join

import numpy as np


def remove_static_matches(k0: np.ndarray, k1: np.ndarray,
                          thr: float = 1.0) -> np.ndarray:
    """Watermark/logo suppression: drop matches whose endpoints coincide
    (ref video_preprocessor.py:514-520). Returns keep mask."""
    d = np.linalg.norm(k0 - k1, axis=1)
    return d > thr


def process_video(video_path: str, labels_root: str, method: str = "root_sift",
                  skip: int = 20, img_size: int = 840, ckpt: str | None = None,
                  segment=None, max_pairs: int | None = None,
                  min_matches: int = 64, pix_thr: float = 0.5):
    """One (video, method, skip) task. Writes LabelStore under
    `labels_root/<seq>/<method>_s<skip>_r<img_size>/`."""
    import jax.numpy as jnp

    from gim_tpu.api import Matcher, MatchResult
    from gim_tpu.data.video import VideoStreamer
    from gim_tpu.data.walk import LabelStore, onchip_fundamental_filter
    from gim_tpu.data.zeb import preprocess_host

    seq = os.path.splitext(os.path.basename(video_path))[0]
    store = LabelStore(join(labels_root, seq,
                            f"{method}_s{skip}_r{img_size}"))
    done = store.pairs()

    vs = VideoStreamer(video_path)
    idxs = vs.frame_indices(skip)
    pairs = list(zip(idxs[:-1], idxs[1:]))
    if max_pairs:
        pairs = pairs[:max_pairs]

    if method == "root_sift":
        from gim_tpu.models.root_sift import match_pair_rootsift

        def match(rgb0, rgb1, s0, s1):
            k0, k1, conf = match_pair_rootsift(rgb0, rgb1)
            return k0, k1, conf
    else:
        matcher = (Matcher.from_checkpoint(method, ckpt) if ckpt
                   else Matcher(method))

        def match(rgb0, rgb1, s0, s1):
            c0, _, sc0, _, _ = preprocess_host(rgb0, img_size, 8, True)
            c1, _, sc1, _, _ = preprocess_host(rgb1, img_size, 8, True)
            res = matcher.match(jnp.asarray(c0)[None], jnp.asarray(c1)[None],
                                jnp.asarray(sc0)[None], jnp.asarray(sc1)[None])
            return res.numpy_pair(0)

    n_done = 0
    for (i, j) in pairs:
        if (i, j) in done:
            continue
        rgb0 = vs.read(i)
        rgb1 = vs.read(j)
        if segment is not None:
            m0 = segment(rgb0)
            m1 = segment(rgb1)
            rgb0 = rgb0 * (~m0[..., None])
            rgb1 = rgb1 * (~m1[..., None])
        k0, k1, conf = match(rgb0, rgb1, None, None)
        if len(k0) < min_matches:
            store.save(i, j, np.zeros((0, 4), np.float32))
            continue
        keep = remove_static_matches(k0, k1)
        k0, k1 = k0[keep], k1[keep]
        if len(k0) >= 8:
            inl = onchip_fundamental_filter(k0, k1, pix_thr)
            k0, k1 = k0[inl], k1[inl]
        labels = np.concatenate([k0, k1], axis=1).astype(np.float32)
        if len(labels) < min_matches:
            labels = np.zeros((0, 4), np.float32)
        store.save(i, j, labels)
        n_done += 1
        if n_done % 20 == 0:
            store.flush_index()
            print(f"[video] {seq} {method} s{skip}: {n_done} pairs",
                  flush=True)
    store.flush_index()
    vs.close()
    print(f"[video] {seq} {method} s{skip}: done ({n_done} new pairs)")
    return store


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--video", required=True)
    p.add_argument("--labels_root", default="data/walk_labels")
    p.add_argument("--method", default="root_sift",
                   choices=["root_sift", "gim_lightglue", "gim_loftr",
                            "gim_dkm"])
    p.add_argument("--skip", type=int, default=20)
    p.add_argument("--img_size", type=int, default=840)
    p.add_argument("--ckpt", default=None)
    p.add_argument("--max_pairs", type=int, default=None)
    args = p.parse_args(argv)
    process_video(args.video, args.labels_root, args.method, args.skip,
                  args.img_size, args.ckpt, max_pairs=args.max_pairs)


if __name__ == "__main__":
    main()
