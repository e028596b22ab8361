"""Native (C++) annotation kernels vs numpy fallback vs known answers."""

import numpy as np
import pytest

from neuralsim_tpu.native import (
    _connected_components_np,
    _load_lib,
    connected_components,
    rle_decode,
    rle_encode,
)


def _mask_with_two_blobs():
    m = np.zeros((20, 30), np.uint8)
    m[2:8, 3:10] = 1       # blob A: x3 y2 w7 h6 area42
    m[12:18, 20:28] = 1    # blob B: x20 y12 w8 h6 area48
    return m


def test_cpp_library_builds():
    assert _load_lib() is not None, "g++ build of libnsnative.so failed"


def test_connected_components_two_blobs():
    stats = connected_components(_mask_with_two_blobs())
    assert sorted(stats) == sorted([(3, 2, 7, 6, 42), (20, 12, 8, 6, 48)])


def test_connected_components_diagonal_is_8_connected():
    m = np.zeros((4, 4), np.uint8)
    m[0, 0] = m[1, 1] = m[2, 2] = 1
    stats = connected_components(m)
    assert len(stats) == 1
    assert stats[0] == (0, 0, 3, 3, 3)


def test_connected_components_u_shape_merge():
    # U shape forces label merging in the second pass
    m = np.zeros((5, 5), np.uint8)
    m[0:4, 0] = 1
    m[0:4, 4] = 1
    m[3, 0:5] = 1
    stats = connected_components(m)
    assert len(stats) == 1
    x, y, w, h, area = stats[0]
    assert (x, y, w, h) == (0, 0, 5, 4)
    assert area == int(m.sum())


def test_cpp_matches_numpy_fallback(rng):
    for _ in range(5):
        m = (rng.rand(37, 23) > 0.6).astype(np.uint8)
        assert sorted(connected_components(m)) == sorted(_connected_components_np(m))


def test_empty_mask():
    assert connected_components(np.zeros((8, 8), np.uint8)) == []


def test_rle_roundtrip(rng):
    m = (rng.rand(13, 17) > 0.5).astype(np.uint8)
    rle = rle_encode(m)
    assert rle["size"] == [13, 17]
    assert sum(rle["counts"]) == 13 * 17
    np.testing.assert_array_equal(rle_decode(rle), m)


def test_rle_starts_with_zero_run():
    m = np.ones((3, 3), np.uint8)
    rle = rle_encode(m)
    assert rle["counts"][0] == 0  # COCO convention: first run counts zeros


def test_auto_annotate_end_to_end():
    from neuralsim_tpu.detector.dataset import auto_annotate

    img = np.zeros((50, 60, 3), np.float32)
    img[10:30, 15:40] = 0.8           # bright object
    img[45:48, 2:5] = 0.02            # tiny dim blob (above 1/255)
    bbox = auto_annotate(img)
    assert bbox == (15, 10, 25, 20)   # largest component wins

    assert auto_annotate(np.zeros((10, 10, 3), np.float32)) is None
