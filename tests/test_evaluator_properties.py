"""Second oracle for the first-party COCO evaluator (VERDICT r3 #4).

The golden tests (test_evaluator_golden.py) pin hand-derived constants; a
single systematic misreading of the COCOeval protocol could shift every
logged mAP while still matching goldens derived under the same misreading.
This suite removes that single point of failure three ways:

  1. ``naive_cocoeval`` — an INDEPENDENT, deliberately-unvectorized
     transliteration of the pycocotools algorithm (cocoeval.py
     evaluateImg/accumulate, the protocol the reference invokes via
     ``neural_sim_main.py:847-853``): per-detection python loops, explicit
     greedy matching, per-threshold state. Structurally nothing like
     ``detector/evaluator.py`` (vectorized thresholds, global score sort),
     so a shared bug would have to be a shared misreading of the spec.
     Randomized scenarios (crowds, area tiers, multi-class, multi-image)
     must agree exactly.
  2. Protocol invariances that hold for ANY correct implementation:
     image permutation, global box translation, strictly-monotone score
     transforms; degenerate exactness (all-TP = 100, all-FP = 0,
     crowd-only = NaN).
  3. A differential harness against REAL pycocotools that activates
     automatically when the package is importable (zero-egress images
     lack it; CI machines with it get the cross-check for free).
"""

import numpy as np
import pytest

from neuralsim_tpu.detector.evaluator import (
    AREA_RANGES,
    IOU_THRESHOLDS,
    RECALL_POINTS,
    coco_map,
)


# --------------------------------------------------------------------- #
# independent oracle: direct per-detection transliteration of COCOeval
# --------------------------------------------------------------------- #

def _iou_single(d, g, crowd):
    ix0, iy0 = max(d[0], g[0]), max(d[1], g[1])
    ix1, iy1 = min(d[2], g[2]), min(d[3], g[3])
    iw, ih = max(0.0, ix1 - ix0), max(0.0, iy1 - iy0)
    inter = iw * ih
    ad = max(0.0, d[2] - d[0]) * max(0.0, d[3] - d[1])
    ag = max(0.0, g[2] - g[0]) * max(0.0, g[3] - g[1])
    denom = ad if crowd else (ad + ag - inter)
    return inter / denom if denom > 0 else 0.0


def naive_cocoeval(detections, ground_truth, max_dets=100):
    """ap[t, a, c] exactly per the pycocotools algorithm, python loops."""
    classes = sorted({int(l) for g in ground_truth
                      for l in np.atleast_1d(g["labels"])})
    n_t, n_a = len(IOU_THRESHOLDS), len(AREA_RANGES)
    ap = np.full((n_t, n_a, len(classes)), np.nan)

    for ci, cls in enumerate(classes):
        for ai, (_, lo, hi) in enumerate(AREA_RANGES):
            # per-image evaluateImg
            all_scores, all_tp, all_ig = [], [], []
            npig = 0
            for det, gt in zip(detections, ground_truth):
                dm = np.asarray(det["labels"]) == cls
                db = np.asarray(det["boxes"], float)[dm]
                ds = np.asarray(det["scores"], float)[dm]
                order = np.argsort(-ds, kind="mergesort")[:max_dets]
                db, ds = db[order], ds[order]

                gm = np.asarray(gt["labels"]) == cls
                gb = np.asarray(gt["boxes"], float)[gm]
                gcrowd = (np.asarray(gt["iscrowd"], bool)[gm]
                          if "iscrowd" in gt else np.zeros(len(gb), bool))
                gareas = (np.asarray(gt["areas"], float)[gm]
                          if "areas" in gt
                          else np.array([max(0.0, b[2] - b[0])
                                         * max(0.0, b[3] - b[1])
                                         for b in gb]))
                gig = gcrowd | (gareas < lo) | (gareas > hi)
                gorder = np.argsort(gig, kind="mergesort")  # ignored last
                gb, gcrowd, gig = gb[gorder], gcrowd[gorder], gig[gorder]

                n_d, n_g = len(db), len(gb)
                npig += int((~gig).sum())
                gtm = -np.ones((n_t, n_g), int)
                dtm = -np.ones((n_t, n_d), int)
                dtig = np.zeros((n_t, n_d), bool)
                for ti, thr0 in enumerate(IOU_THRESHOLDS):
                    for di in range(n_d):
                        iou = min(thr0, 1.0 - 1e-10)
                        m = -1
                        for gi in range(n_g):
                            # gt already matched (crowds can rematch)
                            if gtm[ti, gi] > -1 and not gcrowd[gi]:
                                continue
                            # best non-ignored match found and this gt is
                            # ignored: stop (list is ignore-last sorted)
                            if m > -1 and not gig[m] and gig[gi]:
                                break
                            v = _iou_single(db[di], gb[gi], gcrowd[gi])
                            if v < iou:
                                continue
                            iou = v
                            m = gi
                        if m == -1:
                            continue
                        dtig[ti, di] = gig[m]
                        dtm[ti, di] = m
                        gtm[ti, m] = di
                    for di in range(n_d):
                        a = (max(0.0, db[di][2] - db[di][0])
                             * max(0.0, db[di][3] - db[di][1]))
                        if dtm[ti, di] == -1 and (a < lo or a > hi):
                            dtig[ti, di] = True
                all_scores.append(ds)
                all_tp.append(dtm > -1)
                all_ig.append(dtig)

            if npig == 0:
                continue
            scores = np.concatenate(all_scores) if all_scores else np.zeros(0)
            if scores.size == 0:
                ap[:, ai, ci] = 0.0
                continue
            order = np.argsort(-scores, kind="mergesort")
            tp_m = np.concatenate(all_tp, axis=1)[:, order]
            ig_m = np.concatenate(all_ig, axis=1)[:, order]
            for ti in range(n_t):
                tps = tp_m[ti] & ~ig_m[ti]
                fps = ~tp_m[ti] & ~ig_m[ti]
                tp = np.cumsum(tps)
                fp = np.cumsum(fps)
                rc = tp / npig
                pr = tp / np.maximum(tp + fp, np.spacing(1))
                # envelope, exactly the cocoeval accumulate loop
                pr = pr.tolist()
                for i in range(len(pr) - 1, 0, -1):
                    if pr[i] > pr[i - 1]:
                        pr[i - 1] = pr[i]
                q = np.zeros(len(RECALL_POINTS))
                inds = np.searchsorted(rc, RECALL_POINTS, side="left")
                for ri, pi in enumerate(inds):
                    if pi < len(pr):
                        q[ri] = pr[pi]
                ap[ti, ai, ci] = q.mean()
    return ap


def _aggregate(ap):
    def mean(t):
        return float(np.nanmean(t)) * 100 if ~np.isnan(t).all() else float("nan")

    return {"AP": mean(ap[:, 0, :]), "AP50": mean(ap[0, 0, :]),
            "AP75": mean(ap[5, 0, :]), "APs": mean(ap[:, 1, :]),
            "APm": mean(ap[:, 2, :]), "APl": mean(ap[:, 3, :])}


# --------------------------------------------------------------------- #
# randomized scenarios
# --------------------------------------------------------------------- #

def _random_scenario(rng, n_img=6, n_cls=3, crowd_p=0.15):
    """Random multi-image/class/scale scenario spanning all area tiers."""
    dets, gts = [], []
    for _ in range(n_img):
        n_g = rng.randint(0, 5)
        sizes = rng.choice([8, 20, 60, 150], size=n_g)  # s/m/l areas
        xy = rng.uniform(0, 300, (n_g, 2))
        g_boxes = np.concatenate([xy, xy + sizes[:, None]], axis=1)
        g_labels = rng.randint(0, n_cls, n_g)
        g_crowd = rng.rand(n_g) < crowd_p
        gts.append({"boxes": g_boxes, "labels": g_labels,
                    "iscrowd": g_crowd})

        n_d = rng.randint(0, 8)
        d_boxes, d_labels = [], []
        for _ in range(n_d):
            if n_g and rng.rand() < 0.6:   # perturbed copy of a gt
                gi = rng.randint(n_g)
                jitter = rng.uniform(-6, 6, 4)
                d_boxes.append(g_boxes[gi] + jitter)
                d_labels.append(g_labels[gi] if rng.rand() < 0.8
                                else rng.randint(n_cls))
            else:                          # random spurious box
                p = rng.uniform(0, 300, 2)
                s = rng.choice([8, 25, 70, 160])
                d_boxes.append(np.concatenate([p, p + s]))
                d_labels.append(rng.randint(n_cls))
        d_boxes = (np.asarray(d_boxes, float).reshape(-1, 4)
                   if d_boxes else np.zeros((0, 4)))
        dets.append({"boxes": d_boxes,
                     "labels": np.asarray(d_labels, int),
                     "scores": rng.rand(n_d)})  # continuous -> no ties
    return dets, gts


def test_matches_independent_transliteration():
    """20 random scenarios: the vectorized evaluator equals the naive
    per-detection transliteration on every aggregate key."""
    rng = np.random.RandomState(0)
    for trial in range(20):
        dets, gts = _random_scenario(rng)
        if not any(len(g["labels"]) for g in gts):
            continue
        got = coco_map(dets, gts)
        want = _aggregate(naive_cocoeval(dets, gts))
        for k, v in want.items():
            if np.isnan(v):
                assert np.isnan(got[k]), (trial, k, got[k])
            else:
                np.testing.assert_allclose(got[k], v, atol=1e-9,
                                           err_msg=f"trial {trial} key {k}")


def test_image_permutation_invariance():
    rng = np.random.RandomState(1)
    dets, gts = _random_scenario(rng, n_img=8)
    base = coco_map(dets, gts)
    perm = rng.permutation(len(dets))
    shuf = coco_map([dets[i] for i in perm], [gts[i] for i in perm])
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl"):
        np.testing.assert_allclose(shuf[k], base[k], atol=1e-9, err_msg=k)


def test_translation_invariance():
    """Shifting every box by the same offset changes nothing (IoU and
    areas are translation-invariant)."""
    rng = np.random.RandomState(2)
    dets, gts = _random_scenario(rng)
    base = coco_map(dets, gts)

    def shift(items):
        return [{**it, "boxes": np.asarray(it["boxes"], float) + 37.5}
                for it in items]

    moved = coco_map(shift(dets), shift(gts))
    for k in ("AP", "AP50", "AP75", "APs", "APm", "APl"):
        v = base[k]
        if np.isnan(v):
            assert np.isnan(moved[k])
        else:
            np.testing.assert_allclose(moved[k], v, atol=1e-9, err_msg=k)


def test_score_monotone_invariance():
    """Any strictly increasing transform of the scores preserves ranking,
    hence every AP."""
    rng = np.random.RandomState(3)
    dets, gts = _random_scenario(rng)
    base = coco_map(dets, gts)
    warped = [{**d, "scores": np.tanh(np.asarray(d["scores"])) * 0.3 + 0.5}
              for d in dets]
    got = coco_map(warped, gts)
    for k in ("AP", "AP50", "AP75"):
        v = base[k]
        if np.isnan(v):
            assert np.isnan(got[k])
        else:
            np.testing.assert_allclose(got[k], v, atol=1e-9, err_msg=k)


def test_all_tp_is_perfect():
    rng = np.random.RandomState(4)
    gts, dets = [], []
    for _ in range(4):
        n = rng.randint(1, 4)
        xy = rng.uniform(0, 200, (n, 2))
        boxes = np.concatenate([xy, xy + rng.uniform(20, 120, (n, 1))], 1)
        labels = rng.randint(0, 2, n)
        gts.append({"boxes": boxes, "labels": labels})
        dets.append({"boxes": boxes.copy(), "labels": labels.copy(),
                     "scores": rng.rand(n)})
    r = coco_map(dets, gts)
    assert r["AP"] == pytest.approx(100.0)
    assert r["AP50"] == pytest.approx(100.0)
    assert r["AP75"] == pytest.approx(100.0)


def test_all_fp_is_zero():
    gts = [{"boxes": np.array([[0.0, 0.0, 50.0, 50.0]]),
            "labels": np.array([0])}]
    dets = [{"boxes": np.array([[200.0, 200.0, 260.0, 260.0]]),
             "labels": np.array([0]), "scores": np.array([0.9])}]
    r = coco_map(dets, gts)
    assert r["AP"] == pytest.approx(0.0)
    assert r["AP50"] == pytest.approx(0.0)


def test_crowd_only_class_is_nan():
    """A class whose every gt is iscrowd has no countable gt: pycocotools
    reports -1 (skipped); we surface NaN."""
    gts = [{"boxes": np.array([[0.0, 0.0, 60.0, 60.0]]),
            "labels": np.array([0]), "iscrowd": np.array([True])}]
    dets = [{"boxes": np.array([[1.0, 1.0, 59.0, 59.0]]),
             "labels": np.array([0]), "scores": np.array([0.8])}]
    r = coco_map(dets, gts)
    assert np.isnan(r["AP"])


def test_det_inside_crowd_not_penalized():
    """A det matched to a crowd region is ignored (neither TP nor FP):
    with one real gt hit plus one crowd-matched det, AP stays 100."""
    gts = [{"boxes": np.array([[0.0, 0.0, 40.0, 40.0],
                               [100.0, 100.0, 300.0, 300.0]]),
            "labels": np.array([0, 0]),
            "iscrowd": np.array([False, True])}]
    dets = [{"boxes": np.array([[0.0, 0.0, 40.0, 40.0],
                                [150.0, 150.0, 180.0, 180.0]]),
             "labels": np.array([0, 0]), "scores": np.array([0.9, 0.8])}]
    r = coco_map(dets, gts)
    assert r["AP"] == pytest.approx(100.0)


# --------------------------------------------------------------------- #
# real-pycocotools differential hook (auto-activates when importable)
# --------------------------------------------------------------------- #

def _to_coco_json(dets, gts):
    images, anns, results = [], [], []
    cats = sorted({int(l) for g in gts for l in np.atleast_1d(g["labels"])})
    aid = 1
    for i, (d, g) in enumerate(zip(dets, gts)):
        images.append({"id": i + 1, "width": 1000, "height": 1000})
        crowd = np.asarray(g.get("iscrowd",
                                 np.zeros(len(g["labels"]), bool)), bool)
        for b, l, c in zip(np.asarray(g["boxes"], float),
                           np.asarray(g["labels"], int), crowd):
            w, h = b[2] - b[0], b[3] - b[1]
            anns.append({"id": aid, "image_id": i + 1, "category_id": int(l),
                         "bbox": [b[0], b[1], w, h], "area": float(w * h),
                         "iscrowd": int(c)})
            aid += 1
        for b, l, s in zip(np.asarray(d["boxes"], float),
                           np.asarray(d["labels"], int),
                           np.asarray(d["scores"], float)):
            results.append({"image_id": i + 1, "category_id": int(l),
                            "bbox": [b[0], b[1], b[2] - b[0], b[3] - b[1]],
                            "score": float(s)})
    return ({"images": images, "annotations": anns,
             "categories": [{"id": c, "name": str(c)} for c in cats]},
            results)


def test_against_real_pycocotools():
    pycocotools = pytest.importorskip("pycocotools")  # noqa: F841
    import contextlib
    import io

    from pycocotools.coco import COCO
    from pycocotools.cocoeval import COCOeval

    rng = np.random.RandomState(7)
    for trial in range(5):
        dets, gts = _random_scenario(rng)
        if not any(len(d["scores"]) for d in dets):
            continue
        gt_json, res = _to_coco_json(dets, gts)
        with contextlib.redirect_stdout(io.StringIO()):
            coco = COCO()
            coco.dataset = gt_json
            coco.createIndex()
            coco_dt = coco.loadRes(res) if res else None
            ev = COCOeval(coco, coco_dt, "bbox")
            ev.evaluate()
            ev.accumulate()
            ev.summarize()
        got = coco_map(dets, gts)
        # stats: AP, AP50, AP75, APs, APm, APl (pycocotools scale 0..1,
        # -1 for absent)
        for k, idx in (("AP", 0), ("AP50", 1), ("AP75", 2), ("APs", 3),
                       ("APm", 4), ("APl", 5)):
            ref = ev.stats[idx]
            if ref == -1:
                assert np.isnan(got[k]), (trial, k)
            else:
                np.testing.assert_allclose(got[k], ref * 100, atol=1e-6,
                                           err_msg=f"trial {trial} {k}")
