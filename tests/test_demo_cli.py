"""End-to-end demo CLI test (ref demo.py:312-540): root_sift (weights-free
real signal) on a rendered synthetic pair must produce the match figure,
the homography warp figure, and the uncalibrated-rectification figure
(ref demo.py:218-225 stereoRectifyUncalibrated + :230-266 wrap_images)."""

import numpy as np


def test_demo_cli_writes_match_warp_and_rect_figures(tmp_path):
    import cv2

    from gim_tpu.cli import demo
    from gim_tpu.data.synthetic import make_pair

    rng = np.random.default_rng(11)
    img0, img1, K, T = make_pair(rng, H=240, W=320)
    p0, p1 = str(tmp_path / "x1.png"), str(tmp_path / "x2.png")
    cv2.imwrite(p0, img0[..., ::-1])
    cv2.imwrite(p1, img1[..., ::-1])

    demo.main(["--model", "root_sift", "--img0", p0, "--img1", p1,
               "--img_size", "256", "--out_dir", str(tmp_path)])

    assert (tmp_path / "x1_x2_root_sift_match.png").exists()
    assert (tmp_path / "x1_x2_root_sift_warp.png").exists()
    rect = tmp_path / "x1_x2_root_sift_rect.png"
    assert rect.exists()
    fig = cv2.imread(str(rect))
    assert fig is not None and fig.shape[1] > 320  # side-by-side canvas
