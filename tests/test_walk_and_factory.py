"""Tests for the WALK pseudo-label factory: native link, propagation,
augmentation, video preprocessing mechanics."""

import numpy as np

from gim_tpu.data import walk as W
from gim_tpu.native import _link_numpy, link_fast


def _labels(rng, n, w=640, h=480):
    a = rng.uniform([0, 0], [w, h], (n, 2)).astype(np.float32)
    b = rng.uniform([0, 0], [w, h], (n, 2)).astype(np.float32)
    return np.concatenate([a, b], axis=1)


def test_native_link_matches_numpy():
    rng = np.random.default_rng(0)
    l0 = _labels(rng, 300)
    l1 = _labels(rng, 280)
    # force overlaps: chain l1's left to l0's middle for 120 rows
    l1[:120, :2] = l0[:120, 2:]
    ours = link_fast(l0, l1, 640)
    ref = _link_numpy(l0, l1, 640)
    # same chains irrespective of row order
    ours_set = {tuple(np.round(r, 3)) for r in ours}
    ref_set = {tuple(np.round(r, 3)) for r in ref}
    assert ours_set == ref_set
    assert len(ours) >= 120


def test_link_returns_none_below_threshold():
    rng = np.random.default_rng(1)
    l0 = _labels(rng, 50)
    l1 = _labels(rng, 50)
    l1[:5, :2] = l0[:5, 2:]
    assert W.link(l0, l1, 640, min_final_matches=64) is None
    out = W.link(l0, l1, 640, min_final_matches=4)
    assert out is not None and len(out) >= 5


def test_propagator_chains_across_skips(tmp_path):
    """Two 10-frame-skip sources chain into a 20-frame pair through the
    shared middle frame."""
    rng = np.random.default_rng(2)
    store = W.LabelStore(str(tmp_path / "m_s10_r840"))
    n = 200
    # frames 0 -> 10 -> 20: construct consistent chains
    k0 = rng.uniform([0, 0], [640, 480], (n, 2)).astype(np.float32)
    km = np.round(rng.uniform([0, 0], [640, 480], (n, 2))).astype(np.float32)
    k2 = rng.uniform([0, 0], [640, 480], (n, 2)).astype(np.float32)
    store.save(0, 10, np.concatenate([k0, km], 1))
    store.save(10, 20, np.concatenate([km, k2], 1))
    store.flush_index()

    prop = W.Propagator({10: [store]}, frame_width=640,
                        cfg=W.PropagationConfig(skips=(5, 10),
                                                min_final_matches=64,
                                                min_keep=32),
                        out_root=str(tmp_path / "prop"))
    labels, i0, i1 = prop.propagate(0, 20, (5, 10))
    assert labels is not None and (i0, i1) == (0, 20)
    assert len(labels) >= 64
    # chained endpoints must agree with the construction
    out_set = {tuple(np.round(r, 2)) for r in labels}
    gt_set = {tuple(np.round(np.concatenate([a, b]), 2))
              for a, b in zip(k0, k2)}
    assert len(out_set & gt_set) > 0.9 * n


def test_augmentations_shapes():
    from gim_tpu.data.augment import dark_aug, mobile_aug

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (64, 96, 3), np.uint8)
    d = dark_aug(img, rng)
    assert d.shape == img.shape and d.dtype == np.uint8
    assert d.mean() < img.mean()  # dark aug darkens
    m = mobile_aug(img, rng)
    assert m.shape == img.shape and m.dtype == np.uint8


def test_remove_static_matches():
    from gim_tpu.cli.video_preprocessor import remove_static_matches

    k0 = np.array([[10.0, 10.0], [50.0, 50.0]], np.float32)
    k1 = np.array([[10.2, 10.1], [80.0, 90.0]], np.float32)
    keep = remove_static_matches(k0, k1)
    assert not keep[0] and keep[1]


def _write_synth_video(path, n_frames=40, w=128, h=96):
    """Moving-texture mp4: per-frame horizontal shift of a fixed pattern."""
    import cv2

    rng = np.random.default_rng(5)
    base = cv2.GaussianBlur(
        rng.integers(0, 256, (h, w * 2, 3), np.uint8).astype(np.float32),
        (0, 0), 1.2).astype(np.uint8)
    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 30, (w, h))
    for i in range(n_frames):
        vw.write(base[:, i:i + w])
    vw.release()


def test_factory_resize_round(tmp_path):
    """Zoom-in resize round (ref video_preprocessor.py:285-330): the
    rT store's labels come from crops around the rF cache's match bboxes
    and map back to true video pixels."""
    from gim_tpu.cli.video_preprocessor import process_video, store_name
    from gim_tpu.data.walk import LabelStore
    from os.path import join
    import shutil

    video = join(str(tmp_path), "vid.mp4")
    _write_synth_video(video)
    root = join(str(tmp_path), "labels")

    s1 = process_video(video, root, "root_sift", skip=8, max_pairs=3,
                       min_matches=8)
    n_f = sum(1 for (i, j, n) in s1._index if n > 0)
    assert n_f >= 2, "no-resize round produced no labels"

    # the rT round keys its crops off the gim_dkm rF cache; reuse the
    # root_sift labels as that cache for the test
    seq = "vid"
    shutil.copytree(join(root, seq, store_name("root_sift", 8, False)),
                    join(root, seq, store_name("gim_dkm", 8, False)))

    s2 = process_video(video, root, "root_sift", skip=8, max_pairs=3,
                       min_matches=8, resize=True)
    labs = [s2.load(i, j) for (i, j, n) in s2._index if n > 0]
    assert labs, "resize round produced no labels"
    for lab in labs:
        # labels live in true-video pixel bounds
        assert (lab[:, 0] <= 128).all() and (lab[:, 1] <= 96).all()
        assert (lab >= 0).all()


def test_store_name_matches_reference_matrix():
    from gim_tpu.cli.video_preprocessor import store_name

    assert store_name("gim_dkm", 20, False) == "gim_dkm_s20_rF"
    assert store_name("gim_loftr", 40, True) == "gim_loftr_s40_rT"
