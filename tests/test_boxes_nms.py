"""Box ops, anchor matching, NMS."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.ops.boxes import (
    decode_deltas,
    encode_deltas,
    match_anchors,
    pairwise_iou,
)
from neuralsim_tpu.ops.nms import batched_class_nms, nms


def test_pairwise_iou_known_values():
    a = jnp.array([[0.0, 0, 10, 10], [0, 0, 4, 4]])
    b = jnp.array([[5.0, 5, 15, 15], [0, 0, 10, 10]])
    iou = np.asarray(pairwise_iou(a, b))
    np.testing.assert_allclose(iou[0, 0], 25.0 / 175.0, rtol=1e-5)
    np.testing.assert_allclose(iou[0, 1], 1.0, rtol=1e-6)
    np.testing.assert_allclose(iou[1, 1], 16.0 / 100.0, rtol=1e-5)
    np.testing.assert_allclose(iou[1, 0], 0.0, atol=1e-7)


def test_encode_decode_roundtrip(rng):
    anchors = jnp.array(rng.uniform(0, 50, (20, 2)).astype(np.float32))
    anchors = jnp.concatenate([anchors, anchors + rng.uniform(5, 30, (20, 2)).astype(np.float32)], -1)
    boxes = anchors + jnp.array(rng.uniform(-3, 3, (20, 4)).astype(np.float32))
    deltas = encode_deltas(anchors, boxes)
    rec = decode_deltas(anchors, deltas)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(boxes), rtol=1e-4, atol=1e-3)


def test_decode_clamps_large_dwdh():
    anchors = jnp.array([[0.0, 0, 10, 10]])
    deltas = jnp.array([[0.0, 0.0, 50.0, 50.0]])  # would exp-overflow
    out = np.asarray(decode_deltas(anchors, deltas))
    assert np.isfinite(out).all()
    assert (out[0, 2] - out[0, 0]) <= 10 * 1000 / 16 + 1


def test_match_anchors_thresholds():
    anchors = jnp.array([
        [0.0, 0, 10, 10],     # IoU 1.0 with gt0 -> fg
        [0.0, 0, 22, 10],     # IoU ~0.45 -> ignore band
        [50.0, 50, 60, 60],   # IoU 0 -> bg
    ])
    gt = jnp.array([[0.0, 0, 10, 10]])
    valid = jnp.array([True])
    midx, labels = match_anchors(anchors, gt, valid)
    assert labels.tolist() == [1, -1, 0]
    assert int(midx[0]) == 0


def test_match_anchors_low_quality():
    # no anchor reaches fg threshold, but the best anchor per gt is forced fg
    anchors = jnp.array([[0.0, 0, 10, 10], [20.0, 20, 30, 30]])
    gt = jnp.array([[0.0, 0, 30, 30]])
    valid = jnp.array([True])
    iou = np.asarray(pairwise_iou(anchors, gt))
    assert iou.max() < 0.5
    _, labels = match_anchors(anchors, gt, valid)
    assert int(labels[int(np.argmax(iou[:, 0]))]) == 1


def test_match_anchors_no_gt():
    anchors = jnp.array([[0.0, 0, 10, 10]])
    gt = jnp.zeros((2, 4))
    valid = jnp.array([False, False])
    _, labels = match_anchors(anchors, gt, valid)
    assert labels.tolist() == [0]


def test_nms_suppresses_overlaps():
    boxes = jnp.array([
        [0.0, 0, 10, 10],
        [1.0, 1, 11, 11],    # overlaps box0 heavily
        [20.0, 20, 30, 30],
    ])
    scores = jnp.array([0.9, 0.8, 0.7])
    keep, valid = nms(boxes, scores, 0.5, max_out=3)
    kept = [int(k) for k, v in zip(keep, valid) if bool(v)]
    assert kept == [0, 2]


def test_nms_keeps_all_disjoint():
    boxes = jnp.array([[0.0, 0, 5, 5], [10.0, 10, 15, 15], [20.0, 0, 25, 5]])
    scores = jnp.array([0.5, 0.9, 0.7])
    keep, valid = nms(boxes, scores, 0.5, max_out=3)
    assert [int(k) for k in keep] == [1, 2, 0]
    assert all(bool(v) for v in valid)


def test_class_nms_no_cross_class_suppression():
    boxes = jnp.array([[0.0, 0, 10, 10], [0.0, 0, 10, 10]])
    scores = jnp.array([0.9, 0.8])
    labels = jnp.array([0, 1])
    keep, valid = batched_class_nms(boxes, scores, labels, 0.5, max_out=2)
    assert sum(bool(v) for v in valid) == 2  # same box, different class: both kept
