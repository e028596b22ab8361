"""Detector transform framework."""

import numpy as np

from neuralsim_tpu.detector.transforms import (
    brightness,
    compose,
    contrast,
    crop,
    hflip,
    random_crop,
    random_flip,
    resize,
    saturation,
    vflip,
)


def _img_with_box():
    img = np.zeros((40, 60, 3), np.float32)
    img[10:20, 30:50] = 1.0
    boxes = np.array([[30.0, 10.0, 50.0, 20.0]], np.float32)
    return img, boxes


def test_resize_scales_boxes():
    img, boxes = _img_with_box()
    out, b = resize(20, 30)(img, boxes)
    assert out.shape == (20, 30, 3)
    np.testing.assert_allclose(b[0], [15, 5, 25, 10])


def test_resize_preserves_content_location():
    img, boxes = _img_with_box()
    out, b = resize(80, 120)(img, boxes)
    x0, y0, x1, y1 = b[0].astype(int)
    inside = out[y0 + 2: y1 - 2, x0 + 2: x1 - 2]
    assert inside.mean() > 0.9


def test_hflip_boxes():
    img, boxes = _img_with_box()
    out, b = hflip()(img, boxes)
    np.testing.assert_allclose(b[0], [10, 10, 30, 20])
    # flipped content is where the flipped box says
    assert out[15, 15].sum() > 2.9
    # double flip is identity
    out2, b2 = hflip()(out, b)
    np.testing.assert_allclose(b2, boxes)
    np.testing.assert_allclose(out2, img)


def test_vflip_boxes():
    img, boxes = _img_with_box()
    out, b = vflip()(img, boxes)
    np.testing.assert_allclose(b[0], [30, 20, 50, 30])


def test_crop_clips_boxes():
    img, boxes = _img_with_box()
    out, b = crop(5, 25, 20, 20)(img, boxes)
    assert out.shape == (20, 20, 3)
    np.testing.assert_allclose(b[0], [5, 5, 20, 15])  # clipped at window


def test_color_ops_bounded():
    img, boxes = _img_with_box()
    for t in (brightness(1.5), contrast(0.5), saturation(2.0)):
        out, _ = t(img, boxes)
        assert out.min() >= 0 and out.max() <= 1.0


def test_compose_empty_is_identity():
    img, boxes = _img_with_box()
    out, b = compose([])(img, boxes)
    np.testing.assert_array_equal(out, img)
    np.testing.assert_array_equal(b, boxes)


def test_random_transforms_deterministic_with_seed():
    img, boxes = _img_with_box()
    t1 = compose([random_flip(0.5, np.random.RandomState(7)),
                  random_crop(0.8, np.random.RandomState(7))])
    t2 = compose([random_flip(0.5, np.random.RandomState(7)),
                  random_crop(0.8, np.random.RandomState(7))])
    o1, b1 = t1(img, boxes)
    o2, b2 = t2(img, boxes)
    np.testing.assert_array_equal(o1, o2)
    np.testing.assert_array_equal(b1, b2)
