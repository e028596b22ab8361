"""COCO mAP evaluator sanity + known-value tests."""

import numpy as np

from neuralsim_tpu.detector.evaluator import coco_map


def _det(boxes, scores, labels):
    return {"boxes": np.array(boxes, np.float64).reshape(-1, 4),
            "scores": np.array(scores, np.float64).reshape(-1),
            "labels": np.array(labels, np.int64).reshape(-1)}


def _gt(boxes, labels):
    return {"boxes": np.array(boxes, np.float64).reshape(-1, 4),
            "labels": np.array(labels, np.int64).reshape(-1)}


def test_perfect_detections():
    gt = [_gt([[10, 10, 50, 50]], [0]), _gt([[5, 5, 25, 25]], [1])]
    det = [_det([[10, 10, 50, 50]], [0.9], [0]),
           _det([[5, 5, 25, 25]], [0.8], [1])]
    r = coco_map(det, gt)
    assert abs(r["AP"] - 100.0) < 1e-6
    assert abs(r["AP50"] - 100.0) < 1e-6
    assert abs(r["AP75"] - 100.0) < 1e-6


def test_no_detections():
    gt = [_gt([[10, 10, 50, 50]], [0])]
    det = [_det(np.zeros((0, 4)), [], [])]
    r = coco_map(det, gt)
    assert r["AP"] == 0.0


def test_localization_quality_splits_thresholds():
    # IoU with gt = 0.5 <= x < 0.75: counts at AP50 but not AP75
    gt = [_gt([[0, 0, 100, 100]], [0])]
    det = [_det([[0, 0, 100, 60]], [0.9], [0])]  # IoU = 0.6
    r = coco_map(det, gt)
    assert abs(r["AP50"] - 100.0) < 1e-6
    assert abs(r["AP75"]) < 1e-6
    # AP averages 10 thresholds; 0.6 passes 0.5 and 0.55 and 0.6
    assert 25.0 < r["AP"] < 35.0


def test_false_positive_lowers_precision():
    gt = [_gt([[0, 0, 10, 10]], [0])]
    det_clean = [_det([[0, 0, 10, 10]], [0.9], [0])]
    det_fp = [_det([[0, 0, 10, 10], [50, 50, 60, 60]], [0.9, 0.95], [0, 0])]
    r_clean = coco_map(det_clean, gt)
    r_fp = coco_map(det_fp, gt)
    assert r_fp["AP"] < r_clean["AP"]
    # higher-scored FP hurts: precision at the matched det is 1/2
    assert abs(r_fp["AP50"] - 50.0) < 1.0


def test_wrong_class_is_false_positive():
    gt = [_gt([[0, 0, 10, 10]], [0])]
    det = [_det([[0, 0, 10, 10]], [0.9], [1])]
    r = coco_map(det, gt)
    assert r["AP"] == 0.0


def test_duplicate_detection_counts_once():
    gt = [_gt([[0, 0, 10, 10]], [0])]
    det = [_det([[0, 0, 10, 10], [0, 0, 10, 10]], [0.9, 0.8], [0, 0])]
    r = coco_map(det, gt)
    # second identical det is a FP at every threshold; AP50 stays 100
    # (the matched det comes first in score order, recall saturates at it)
    assert abs(r["AP50"] - 100.0) < 1e-6


def test_multi_image_aggregation():
    gt = [_gt([[0, 0, 10, 10]], [0]), _gt([[0, 0, 10, 10]], [0])]
    det = [_det([[0, 0, 10, 10]], [0.9], [0]),
           _det(np.zeros((0, 4)), [], [])]  # miss in image 2
    r = coco_map(det, gt)
    assert abs(r["AP50"] - 50.0) < 1.5  # recall caps at 0.5
