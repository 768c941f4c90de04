"""Video -> pseudo-label factory.

Reference surface: video_preprocessor.py (per (video, method, skip, resize)
task: stream gap-sampled frame pairs :103-105, semantic masking of
{person, sky, car} :34-44,312-316 (masked pixels zeroed before matching,
:420-421), zoom-in resize round cropping around the previous GIM_DKM
no-resize round's match bbox :285-330, matcher branch :350-511,
static-match watermark removal :514-520, MAGSAC fundamental filter thr 0.5
:569-583, labels scaled by vratio back to true video resolution
:110,545-553, save (N,4).npy + rolling index :545-566, crash-resumable
:221-251).

TPU-native deltas: the per-pair MAGSAC host bottleneck becomes the batched
on-chip fundamental RANSAC; matchers run through gim_tpu.api with static
shapes (the zoom-in crop is bound-resized like the reference then fed
through the standard square-canvas preprocessing); segmentation masking is
a pluggable `segment(rgb)->bool mask` (gim_tpu.models.semseg).
"""

from __future__ import annotations

import argparse
import math
import os
from os.path import join

import numpy as np

# zoom-in round resize bounds: SIFT/GLUE keep native size, dense matchers
# bound to 900x1600 (ref video_preprocessor.py:215-216)
RESIZE_BOUND_DENSE = (900, 1600)


def remove_static_matches(k0: np.ndarray, k1: np.ndarray,
                          thr: float = 1.0) -> np.ndarray:
    """Watermark/logo suppression: a match is static iff BOTH coordinate
    displacements are under 1px (ref video_preprocessor.py:514-517:
    moved = ~((kpts0 - kpts1).abs() < 1).min(dim=1)). Returns keep mask."""
    return np.abs(k0 - k1).max(axis=1) >= thr


def store_name(method: str, skip: int, resize: bool) -> str:
    """Label-store dir name, mirroring the reference's
    'WALK <METHOD> [R] <T|F> [S] <skip>' naming (ref :92-95)."""
    return f"{method}_s{skip}_r{'T' if resize else 'F'}"


def _bounded_resize(rgb: np.ndarray, bound_hw, df: int = 8):
    """get_resized_wh + get_divisible_wh + INTER_AREA resize
    (ref video_preprocessor.py:302-306,592-604). Returns (resized, (h, w),
    (h_new, w_new))."""
    import cv2

    h, w = rgb.shape[:2]
    nh, nw = bound_hw
    scale = min(nh / h, nw / w)
    w_new, h_new = int(round(w * scale)), int(round(h * scale))
    w_new = max(w_new // df, 1) * df
    h_new = max(h_new // df, 1) * df
    out = cv2.resize(rgb, (w_new, h_new), interpolation=cv2.INTER_AREA)
    return out, (h, w), (h_new, w_new)


def _crop_bbox(pts: np.ndarray, hw) -> tuple[int, int, int, int]:
    """floor/ceil bbox of previous-round matches, clipped to the frame
    (ref :294-300)."""
    x0 = max(int(math.floor(pts[:, 0].min())), 0)
    x1 = min(int(math.ceil(pts[:, 0].max())), hw[1])
    y0 = max(int(math.floor(pts[:, 1].min())), 0)
    y1 = min(int(math.ceil(pts[:, 1].max())), hw[0])
    return x0, x1, y0, y1


def process_video(video_path: str, labels_root: str, method: str = "root_sift",
                  skip: int = 20, img_size: int = 840, ckpt: str | None = None,
                  segment=None, max_pairs: int | None = None,
                  min_matches: int = 64, pix_thr: float = 0.5,
                  resize: bool = False):
    """One (video, method, skip, resize) task. Writes LabelStore under
    `labels_root/<seq>/<method>_s<skip>_r<T|F>/`. The resize=True round
    requires the gim_dkm resize=False round of the same skip (its matches
    define the zoom-in crops, ref :206-212,285-306)."""
    import cv2
    import jax.numpy as jnp

    from gim_tpu.api import Matcher, MatchResult
    from gim_tpu.data.video import VideoStreamer
    from gim_tpu.data.walk import LabelStore, onchip_fundamental_filter
    from gim_tpu.data.zeb import preprocess_host

    seq = os.path.splitext(os.path.basename(video_path))[0]
    store = LabelStore(join(labels_root, seq,
                            store_name(method, skip, resize)))
    done = store.pairs()

    cache = None
    if resize:
        cache = LabelStore(join(labels_root, seq,
                                store_name("gim_dkm", skip, False)))
        if not cache.pairs():
            raise SystemExit(
                f"resize round needs the gim_dkm no-resize round first "
                f"({cache.root})")

    vs = VideoStreamer(video_path)
    idxs = vs.frame_indices(skip)
    pairs = list(zip(idxs[:-1], idxs[1:]))
    if max_pairs:
        pairs = pairs[:max_pairs]

    # labels are stored at TRUE video resolution: vratio maps decoded-frame
    # pixels back to capture metadata size (ref :75-77,110)
    cap = cv2.VideoCapture(video_path)
    vwidth, vheight = cap.get(3), cap.get(4)
    cap.release()
    first = vs.read(idxs[0])
    vratio = np.array([[vwidth / first.shape[1],
                        vheight / first.shape[0]]], np.float32)

    if method == "root_sift":
        from gim_tpu.models.root_sift import match_pair_rootsift

        def match(rgb0, rgb1):
            k0, k1, conf = match_pair_rootsift(rgb0, rgb1)
            return k0, k1, conf
    else:
        matcher = (Matcher.from_checkpoint(method, ckpt) if ckpt
                   else Matcher(method))

        def match(rgb0, rgb1):
            c0, _, sc0, m0, _ = preprocess_host(rgb0, img_size, 8, True)
            c1, _, sc1, m1, _ = preprocess_host(rgb1, img_size, 8, True)
            res = matcher.match(jnp.asarray(c0)[None], jnp.asarray(c1)[None],
                                jnp.asarray(sc0)[None], jnp.asarray(sc1)[None],
                                jnp.asarray(m0)[None], jnp.asarray(m1)[None])
            return res.numpy_pair(0)

    bound = RESIZE_BOUND_DENSE if method in ("gim_dkm", "gim_loftr") \
        else None  # SIFT/GLUE zoom at native size (ref :215-216)

    n_done = 0
    for (i, j) in pairs:
        if (i, j) in done:
            continue
        rgb0 = vs.read(i)
        rgb1 = vs.read(j)

        crop0 = crop1 = None
        if resize:
            pts = cache.load(i, j)
            if pts is None or len(pts) == 0:
                continue
            pt0 = pts[:, :2] / vratio    # cache is at true resolution
            pt1 = pts[:, 2:] / vratio
            xA0, xA1, yA0, yA1 = _crop_bbox(pt0, rgb0.shape[:2])
            xB0, xB1, yB0, yB1 = _crop_bbox(pt1, rgb1.shape[:2])
            if xA1 - xA0 < 32 or yA1 - yA0 < 32 or \
               xB1 - xB0 < 32 or yB1 - yB0 < 32:
                continue
            rgb0 = rgb0[yA0:yA1, xA0:xA1]
            rgb1 = rgb1[yB0:yB1, xB0:xB1]
            b = bound or rgb0.shape[:2]
            rgb0, (hA, wA), (hA_new, wA_new) = _bounded_resize(rgb0, b)
            b = bound or rgb1.shape[:2]
            rgb1, (hB, wB), (hB_new, wB_new) = _bounded_resize(rgb1, b)
            crop0 = (np.array([[wA / wA_new, hA / hA_new]], np.float32),
                     np.array([[xA0, yA0]], np.float32))
            crop1 = (np.array([[wB / wB_new, hB / hB_new]], np.float32),
                     np.array([[xB0, yB0]], np.float32))

        if segment is not None:
            m0 = segment(rgb0)
            m1 = segment(rgb1)
            if (~m0).sum() == 0 or (~m1).sum() == 0:
                continue
            rgb0 = rgb0 * (~m0[..., None])
            rgb1 = rgb1 * (~m1[..., None])
        k0, k1, conf = match(rgb0, rgb1)
        if len(k0) < min_matches:
            store.save(i, j, np.zeros((0, 4), np.float32))
            continue
        keep = remove_static_matches(k0, k1)
        k0, k1 = k0[keep], k1[keep]
        if len(k0) >= 8:
            inl = onchip_fundamental_filter(k0, k1, pix_thr)
            k0, k1 = k0[inl], k1[inl]
        # map back to true video resolution (ref :545-553)
        if resize:
            k0 = (k0 * crop0[0] + crop0[1]) * vratio
            k1 = (k1 * crop1[0] + crop1[1]) * vratio
        else:
            k0 = k0 * vratio
            k1 = k1 * vratio
        labels = np.concatenate([k0, k1], axis=1).astype(np.float32)
        if len(labels) < min_matches:
            labels = np.zeros((0, 4), np.float32)
        store.save(i, j, labels)
        n_done += 1
        if n_done % 20 == 0:
            store.flush_index()
            print(f"[video] {seq} {method} s{skip} r{resize}: "
                  f"{n_done} pairs", flush=True)
    store.flush_index()
    vs.close()
    print(f"[video] {seq} {method} s{skip} r{resize}: done "
          f"({n_done} new pairs)")
    return store


def make_segmenter_from_ckpt(encoder_ckpt: str, decoder_ckpt: str):
    """ADE20K semseg masking hook: returns segment(rgb)->bool mask of the
    excluded {person, sky, car} classes (ref video_preprocessor.py:34-44)."""
    from gim_tpu.models.semseg import make_segmenter

    return make_segmenter(encoder_ckpt, decoder_ckpt)


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
    p.add_argument("--resize", action="store_true",
                   help="zoom-in round: crop around the gim_dkm no-resize "
                        "round's matches (ref :285-306)")
    p.add_argument("--segment_encoder", default=None,
                   help="ADE20K semseg encoder ckpt (enables masking)")
    p.add_argument("--segment_decoder", default=None)
    p.add_argument("--max_pairs", type=int, default=None)
    args = p.parse_args(argv)

    segment = None
    if args.segment_encoder and args.segment_decoder:
        segment = make_segmenter_from_ckpt(args.segment_encoder,
                                           args.segment_decoder)
    process_video(args.video, args.labels_root, args.method, args.skip,
                  args.img_size, args.ckpt, segment=segment,
                  max_pairs=args.max_pairs, resize=args.resize)


if __name__ == "__main__":
    main()
