"""ZEB loader layout tests: fabricate all 12 on-disk dataset layouts and
assert the resolved image paths and dedup identifiers match the reference
loaders' contracts (ref datasets/{gl3d,gtasfm,multifov,iclnuim,scenenet,
eth3d,kitti,robotcar}/*.py:58-64,106-110 — filename join + optional
extension strip + pair_names format)."""

import os
from os.path import join

import numpy as np
import pytest

from gim_tpu.data import zeb as Z

K = " ".join(["600", "0", "320", "0", "600", "240", "0", "0", "1"])
T = " ".join(str(float(x)) for x in np.eye(4).reshape(-1))

# (benchmark key, raw name0 in pair txt, raw name1, expected image basename0,
#  expected identifier) — scene_id is 'sc' for all fixtures.
CASES = [
    ("GL3D", "12.jpg", "34.jpg", "sc_12.png", "sc#12#34"),
    ("BlendedMVS", "00000012.jpg", "00000034.jpg", "sc_00000012.png",
     "sc#00000012#00000034"),
    # GTASfM/MultiFoV/ICLNUIM/SceneNet pair names carry NO extension — the
    # round-1 unconditional rpartition('.') produced '' here (VERDICT item 3).
    ("GTASfM", "0012", "0034", "sc-0012.png", "sc#0012#0034"),
    ("MultiFoV", "img0012", "img0034", "sc-img0012.png",
     "sc#img/img0012.png#img/img0034.png"),
    ("ICLNUIM", "12", "34", "sc-12.png", "sc#12.jpg#34.jpg"),
    ("SceneNet", "12", "34", "sc-12.png", "sc#12.jpg#34.jpg"),
    ("ETH3DO", "DSC_0012.JPG", "DSC_0034.JPG", "sc-DSC_0012.png",
     "sc#DSC_0012.JPG#DSC_0034.JPG"),
    ("ETH3DI", "DSC_0012.JPG", "DSC_0034.JPG", "sc-DSC_0012.png",
     "sc#DSC_0012.JPG#DSC_0034.JPG"),
    ("KITTI", "000012.png", "000034.png", "sc-000012.png",
     "sc#000012.png#000034.png"),
    ("RobotcarNight", "141813250412", "141813250434",
     "sc_141813250412.png", "sc#141813250412#141813250434"),
    ("RobotcarSeason", "141813250412", "141813250434",
     "sc_141813250412.png", "sc#141813250412#141813250434"),
    ("RobotcarWeather", "141813250412", "141813250434",
     "sc_141813250412.png", "sc#141813250412#141813250434"),
]


def _write_layout(root, key, n0, n1, img0, img1):
    seq = join(root, "zeb", key.lower())
    os.makedirs(seq, exist_ok=True)
    with open(join(seq, "sc_0.txt"), "w") as f:
        f.write(f"{n0} {n1} 0.3 0.3 {K} {K} {T}\n")
    import cv2

    for name in (img0, img1):
        cv2.imwrite(join(seq, name), np.zeros((16, 16, 3), np.uint8))


@pytest.mark.parametrize("key,n0,n1,img0,ident",
                         CASES, ids=[c[0] for c in CASES])
def test_layout(tmp_path, key, n0, n1, img0, ident):
    spec = Z.BENCHMARKS[key]
    img1 = img0.replace("12", "34")
    _write_layout(str(tmp_path), key, n0, n1, img0, img1)
    pairs = Z.load_benchmark(str(tmp_path), key)
    assert len(pairs) == 1
    p = pairs[0]
    assert os.path.basename(p.img_path0) == img0
    assert os.path.basename(p.img_path1) == img1
    assert os.path.exists(p.img_path0), p.img_path0
    assert os.path.exists(p.img_path1), p.img_path1
    assert p.identifier == ident
    assert p.K0.shape == (3, 3) and p.T_0to1.shape == (4, 4)


def test_canonical_seq_dir_preferred(tmp_path):
    """With both `zeb/gl3d` and another dir present, only the canonical
    benchmark dir is read (ref datasets/data.py:173-175)."""
    _write_layout(str(tmp_path), "GL3D", "12.jpg", "34.jpg",
                  "sc_12.png", "sc_34.png")
    other = join(str(tmp_path), "zeb", "unrelated")
    os.makedirs(other)
    with open(join(other, "xx_0.txt"), "w") as f:
        f.write(f"99.jpg 98.jpg 0.3 0.3 {K} {K} {T}\n")
    pairs = Z.load_benchmark(str(tmp_path), "GL3D")
    assert len(pairs) == 1 and pairs[0].identifier == "sc#12#34"


def test_fallback_scans_all_dirs(tmp_path):
    """Ad-hoc roots (synthetic benchmark) without a canonical dir still
    load: every dir under zeb/ is scanned."""
    seq = join(str(tmp_path), "zeb", "synth0")
    os.makedirs(seq)
    with open(join(seq, "sc_0.txt"), "w") as f:
        f.write(f"12.jpg 34.jpg 0.3 0.3 {K} {K} {T}\n")
    pairs = Z.load_benchmark(str(tmp_path), "GL3D")
    assert len(pairs) == 1


def test_load_pair_images_roundtrip(tmp_path):
    _write_layout(str(tmp_path), "GTASfM", "0012", "0034",
                  "sc-0012.png", "sc-0034.png")
    pairs = Z.load_benchmark(str(tmp_path), "GTASfM")
    d = Z.load_pair_images(pairs[0], img_size=32, df=8, padding=True)
    assert d["color0"].shape == (3, 32, 32)
    assert d["mask0"].shape == (32, 32)
