"""Golden-value validation of the first-party COCO-protocol mAP evaluator.

pycocotools is absent from this environment (zero egress), so these golden
values are derived BY HAND from the COCOeval algorithm (pycocotools
cocoeval.py: greedy per-image score-ordered matching at IoU thresholds
linspace(.5,.95,10), global score sort across images, monotone precision
envelope, 101-point interpolation with searchsorted side='left') — each
fixture's derivation is written out in full so the constants are auditable.
The reference scores with exactly this protocol via COCOEvaluator
(neural_sim_main.py:847-853).

Round 3 completes the protocol: iscrowd ignore-matching with the
crowd-IoU denominator, area-range tiers (APs/APm/APl with gt- and
det-side ignore semantics), and the full detectron2 bbox key set —
each with hand-derived goldens below.
"""

import numpy as np
import pytest

from neuralsim_tpu.detector.evaluator import coco_map


def _det(boxes, scores, labels):
    return {"boxes": np.asarray(boxes, np.float64),
            "scores": np.asarray(scores, np.float64),
            "labels": np.asarray(labels, np.int64)}


def _gt(boxes, labels):
    return {"boxes": np.asarray(boxes, np.float64),
            "labels": np.asarray(labels, np.int64)}


def test_perfect_single_detection():
    """1 GT, 1 det with IoU=1.0: P=1 at R=1 for every IoU threshold.
    All 101 recall points read precision 1.0 -> AP = AP50 = AP75 = 100."""
    r = coco_map([_det([[10, 10, 30, 30]], [0.9], [0])],
                 [_gt([[10, 10, 30, 30]], [0])])
    assert r["AP"] == pytest.approx(100.0, abs=1e-6)
    assert r["AP50"] == pytest.approx(100.0, abs=1e-6)
    assert r["AP75"] == pytest.approx(100.0, abs=1e-6)


def test_iou_072_threshold_sweep():
    """det [0,0,9,8] inside gt [0,0,10,10]: inter=72, union=100, IoU=0.72
    exactly. linspace(.5,.95,10) thresholds: 0.72 matches at
    {0.50,0.55,0.60,0.65,0.70} = 5 of 10 (0.70 is 0.6999...96 in float64 —
    same value pycocotools compares against). Matched thresholds give AP=1,
    unmatched give AP=0 (the lone det is a FP, precision 0 everywhere):
    AP = 5/10*100 = 50, AP50 = 100, AP75 = 0."""
    r = coco_map([_det([[0, 0, 9, 8]], [0.8], [0])],
                 [_gt([[0, 0, 10, 10]], [0])])
    assert r["AP"] == pytest.approx(50.0, abs=1e-6)
    assert r["AP50"] == pytest.approx(100.0, abs=1e-6)
    assert r["AP75"] == pytest.approx(0.0, abs=1e-6)


def test_iou_075_exact_boundary():
    """det [0,2.5,10,10]: inter=75, union=100, IoU=0.75 — exactly equal to
    threshold index 5 (0.75 is exact in float64). COCO matches at
    IoU >= t: {0.50..0.75} = 6 of 10 -> AP=60, AP75=100."""
    r = coco_map([_det([[0, 2.5, 10, 10]], [0.8], [0])],
                 [_gt([[0, 0, 10, 10]], [0])])
    assert r["AP"] == pytest.approx(60.0, abs=1e-6)
    assert r["AP75"] == pytest.approx(100.0, abs=1e-6)


def test_false_positive_ranked_first():
    """2 images, 1 GT each. img1: exact TP at score 0.6; img2: IoU-0 FP at
    score 0.9. Global score order = [FP, TP]:
      tp = [0,1], fp = [1,1] -> recall = [0, 0.5], precision = [0, 0.5]
      envelope (right-to-left max) = [0.5, 0.5]
      searchsorted(recall, r, left): r in {0.00..0.50} (51 pts) -> 0.5;
      r in {0.51..1.00} (50 pts) -> index 2 = past end -> 0
      AP(any t) = 51*0.5/101 = 0.25247524752...
    AP = AP50 = AP75 = 2550/101 = 25.2475247524752..."""
    golden = 100.0 * (51 * 0.5) / 101
    r = coco_map(
        [_det([[0, 0, 10, 10]], [0.6], [0]),
         _det([[50, 50, 60, 60]], [0.9], [0])],
        [_gt([[0, 0, 10, 10]], [0]), _gt([[0, 0, 10, 10]], [0])],
    )
    assert r["AP"] == pytest.approx(golden, abs=1e-6)
    assert r["AP50"] == pytest.approx(golden, abs=1e-6)
    assert r["AP75"] == pytest.approx(golden, abs=1e-6)


def test_missed_gt_caps_recall():
    """1 image, 2 GT, 1 perfect det on one of them:
      tp=[1], recall=[0.5], precision=[1], envelope=[1]
      r in {0.00..0.50} -> 1.0 (51 pts); r > 0.5 -> 0
      AP(any t) = 51/101 -> 100*51/101 = 50.49504950495..."""
    golden = 100.0 * 51 / 101
    r = coco_map([_det([[0, 0, 10, 10]], [0.9], [0])],
                 [_gt([[0, 0, 10, 10], [20, 20, 30, 30]], [0, 0])])
    assert r["AP"] == pytest.approx(golden, abs=1e-6)


def test_class_averaging():
    """Two GT classes, detections only for class 0 (perfect): class 0 AP=100,
    class 1 AP=0 -> mean over classes-with-GT = 50."""
    r = coco_map(
        [_det([[0, 0, 10, 10]], [0.9], [0])],
        [_gt([[0, 0, 10, 10], [20, 20, 40, 40]], [0, 1])],
    )
    assert r["AP"] == pytest.approx(50.0, abs=1e-6)
    assert r["AP-per-class"]["0"] == pytest.approx(100.0, abs=1e-6)
    assert r["AP-per-class"]["1"] == pytest.approx(0.0, abs=1e-6)


def test_greedy_matching_prefers_highest_iou():
    """One det overlapping two GTs: COCO greedy matching assigns the det to
    the GT with the HIGHEST IoU (not the first). det [0,0,10,10]; gtA
    [0,0,10,10] (IoU 1.0), gtB [0,0,10,12] (IoU 10/12). The det must match
    gtA, leaving gtB unmatched -> identical to the missed-GT fixture:
    AP = 100*51/101."""
    golden = 100.0 * 51 / 101
    r = coco_map([_det([[0, 0, 10, 10]], [0.9], [0])],
                 [_gt([[0, 0, 10, 12], [0, 0, 10, 10]], [0, 0])])
    assert r["AP"] == pytest.approx(golden, abs=1e-6)


def test_second_det_cannot_steal_matched_gt():
    """Two dets on one GT: higher-scored det takes the GT; the second is a
    FP even though its IoU also clears the threshold.
      order: det1 (0.9, TP), det2 (0.8, FP)
      tp=[1,1], fp=[0,1] -> recall=[1,1], precision=[1, 0.5]
      envelope=[1, 0.5]; searchsorted(recall=[1,1], r, left) -> idx 0 for
      every r<=1 -> precision 1.0 at all 101 points -> AP = 100."""
    r = coco_map([_det([[0, 0, 10, 10], [0, 0, 10, 11]], [0.9, 0.8], [0, 0])],
                 [_gt([[0, 0, 10, 10]], [0])])
    assert r["AP"] == pytest.approx(100.0, abs=1e-6)


def test_area_tiers_partition_gts():
    """Two exact-match dets: gt1 area 400 (small: < 32^2), gt2 area 2500
    (medium: 32^2..96^2). In each tier the other gt is area-IGNORED, its
    matching det is ignore-matched (neither TP nor FP), and n_gt=1 ->
    perfect precision at full recall: APs = APm = AP = 100. No large gt
    exists -> APl is NaN (pycocotools yields -1*nan there; detectron2
    prints nan)."""
    r = coco_map(
        [_det([[0, 0, 20, 20]], [0.9], [0]),
         _det([[0, 0, 50, 50]], [0.8], [0])],
        [_gt([[0, 0, 20, 20]], [0]),
         _gt([[0, 0, 50, 50]], [0])],
    )
    assert r["AP"] == pytest.approx(100.0, abs=1e-6)
    assert r["APs"] == pytest.approx(100.0, abs=1e-6)
    assert r["APm"] == pytest.approx(100.0, abs=1e-6)
    assert np.isnan(r["APl"])


def test_unmatched_out_of_range_det_is_not_fp():
    """A det whose own area falls outside the range and matches nothing is
    IGNORED there, not an FP (pycocotools dtIg |= unmatched & out-of-range).
    Small tier: the stray 2500-px det (score .95, above the TP) would halve
    APs if counted as FP; correct handling keeps APs=100."""
    r = coco_map(
        [_det([[0, 0, 20, 20], [40, 40, 90, 90]], [0.9, 0.95], [0, 0])],
        [_gt([[0, 0, 20, 20]], [0])],
    )
    assert r["APs"] == pytest.approx(100.0, abs=1e-6)
    # in "all" the stray det IS an FP above the TP: precision at the TP's
    # rank is 1/2, envelope gives AP = 50
    assert r["AP"] == pytest.approx(50.0, abs=1e-6)


def test_iscrowd_ignore_and_crowd_iou():
    """Crowd gts are never counted (n_gt excludes them) and never penalize:
    a det INSIDE the crowd region (union-IoU only 0.64, crowd-IoU
    intersection/det_area = 1.0) ignore-matches the crowd at EVERY
    threshold, even > 0.65 — so the lower-scored true match keeps AP=100.
    Both without crowd-ignore (stray det = FP above the TP -> AP 50) and
    without the crowd-IoU denominator (FP at thresholds > 0.6 -> AP 40-ish)
    this assertion fails."""
    gt = {"boxes": np.asarray([[0, 0, 10, 10], [20, 0, 40, 20]], np.float64),
          "labels": np.asarray([0, 0], np.int64),
          "iscrowd": np.asarray([False, True])}
    r = coco_map(
        [_det([[0, 0, 10, 10], [22, 2, 38, 18]], [0.9, 0.95], [0, 0])],
        [gt],
    )
    assert r["AP"] == pytest.approx(100.0, abs=1e-6)


def test_explicit_gt_areas_override_box_area():
    """The optional per-gt 'areas' field (the COCO annotation area) drives
    the tier split: a 20x20 box declared area=2000 counts as MEDIUM."""
    gt = {"boxes": np.asarray([[0, 0, 20, 20]], np.float64),
          "labels": np.asarray([0], np.int64),
          "areas": np.asarray([2000.0])}
    r = coco_map([_det([[0, 0, 20, 20]], [0.9], [0])], [gt])
    assert r["APm"] == pytest.approx(100.0, abs=1e-6)
    assert np.isnan(r["APs"])


def test_result_keys_match_detectron2_bbox_dict():
    """save_result.txt parity (neural_sim_main.py:847-853 logs
    str(result['bbox'])): flattened key ORDER and names match detectron2's
    bbox dict — AP, AP50, AP75, APs, APm, APl, AP-{class name}."""
    from neuralsim_tpu.utils.logging import map_result_str

    r = coco_map([_det([[0, 0, 20, 20]], [0.9], [0])],
                 [_gt([[0, 0, 20, 20]], [0])],
                 class_names={0: "master_chef_can"})
    flat_keys = []
    for k, v in r.items():
        if isinstance(v, dict):
            flat_keys.extend(f"AP-{c}" for c in v)
        else:
            flat_keys.append(k)
    assert flat_keys == ["AP", "AP50", "AP75", "APs", "APm", "APl",
                         "AP-master_chef_can"]
    line = map_result_str(r)
    assert line.startswith("{'AP': ") and "'AP-master_chef_can':" in line
