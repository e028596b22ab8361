"""COCO-style mAP evaluation (bbox), first-party.

Replaces the reference's ``COCOEvaluator`` + pycocotools COCOeval
(``optimization/neural_sim_main.py:847-853``) with a numpy implementation of
the COCO protocol: greedy per-image matching at IoU thresholds
0.50:0.05:0.95, 101-point interpolated AP, maxDets=100, averaged over
classes with ground truth. Reports the detectron2 bbox keys
(AP, AP50, AP75) so save_result.txt entries are comparable.
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

IOU_THRESHOLDS = np.linspace(0.5, 0.95, 10)  # exact .5:.05:.95 (COCO protocol)
RECALL_POINTS = np.linspace(0.0, 1.0, 101)


def _iou_matrix(det: np.ndarray, gt: np.ndarray) -> np.ndarray:
    lt = np.maximum(det[:, None, :2], gt[None, :, :2])
    rb = np.minimum(det[:, None, 2:], gt[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    area_d = np.clip(det[:, 2] - det[:, 0], 0, None) * np.clip(det[:, 3] - det[:, 1], 0, None)
    area_g = np.clip(gt[:, 2] - gt[:, 0], 0, None) * np.clip(gt[:, 3] - gt[:, 1], 0, None)
    union = area_d[:, None] + area_g[None, :] - inter
    return np.where(union > 0, inter / np.maximum(union, 1e-12), 0.0)


def coco_map(detections: Sequence[Dict], ground_truth: Sequence[Dict],
             max_dets: int = 100) -> Dict[str, float]:
    """Compute bbox AP.

    Args:
      detections: per-image dicts {"boxes": [D,4] XYXY, "scores": [D],
        "labels": [D] int} (invalid rows removed by the caller).
      ground_truth: per-image dicts {"boxes": [G,4] XYXY, "labels": [G]}.

    Returns {"AP", "AP50", "AP75", "AP-per-class": {...}}.
    """
    assert len(detections) == len(ground_truth)
    classes = sorted(
        {int(l) for g in ground_truth for l in np.atleast_1d(g["labels"])}
    )

    ap_table = np.full((len(IOU_THRESHOLDS), len(classes)), np.nan)
    for ci, cls in enumerate(classes):
        # gather per-image class detections/gts
        scores_all, match_all = [], []
        n_gt = 0
        for det, gt in zip(detections, ground_truth):
            d_mask = np.asarray(det["labels"]) == cls
            d_boxes = np.asarray(det["boxes"], np.float64)[d_mask]
            d_scores = np.asarray(det["scores"], np.float64)[d_mask]
            order = np.argsort(-d_scores)[:max_dets]
            d_boxes, d_scores = d_boxes[order], d_scores[order]

            g_mask = np.asarray(gt["labels"]) == cls
            g_boxes = np.asarray(gt["boxes"], np.float64)[g_mask]
            n_gt += len(g_boxes)

            if len(d_boxes) == 0:
                continue
            if len(g_boxes) == 0:
                matched = np.zeros((len(IOU_THRESHOLDS), len(d_boxes)), bool)
            else:
                iou = _iou_matrix(d_boxes, g_boxes)
                matched = np.zeros((len(IOU_THRESHOLDS), len(d_boxes)), bool)
                for ti, thr in enumerate(IOU_THRESHOLDS):
                    taken = np.zeros(len(g_boxes), bool)
                    for di in range(len(d_boxes)):  # already score-sorted
                        cand = np.where(~taken & (iou[di] >= thr))[0]
                        if len(cand):
                            best = cand[np.argmax(iou[di, cand])]
                            taken[best] = True
                            matched[ti, di] = True
            scores_all.append(d_scores)
            match_all.append(matched)

        if n_gt == 0:
            continue
        if not scores_all:
            ap_table[:, ci] = 0.0
            continue

        scores_cat = np.concatenate(scores_all)
        match_cat = np.concatenate(match_all, axis=1)
        order = np.argsort(-scores_cat)
        match_cat = match_cat[:, order]

        for ti in range(len(IOU_THRESHOLDS)):
            tp = np.cumsum(match_cat[ti])
            fp = np.cumsum(~match_cat[ti])
            recall = tp / n_gt
            precision = tp / np.maximum(tp + fp, 1e-12)
            # monotone-decreasing precision envelope
            for i in range(len(precision) - 2, -1, -1):
                precision[i] = max(precision[i], precision[i + 1])
            idx = np.searchsorted(recall, RECALL_POINTS, side="left")
            p_at_r = np.where(idx < len(precision), precision[np.minimum(idx, len(precision) - 1)], 0.0)
            ap_table[ti, ci] = p_at_r.mean()

    valid = ~np.isnan(ap_table)
    result = {
        "AP": float(np.nanmean(ap_table)) * 100 if valid.any() else float("nan"),
        "AP50": float(np.nanmean(ap_table[0])) * 100 if valid[0].any() else float("nan"),
        "AP75": float(np.nanmean(ap_table[5])) * 100 if valid[5].any() else float("nan"),
        "AP-per-class": {
            str(cls): float(np.nanmean(ap_table[:, ci])) * 100
            for ci, cls in enumerate(classes)
            if not np.isnan(ap_table[:, ci]).all()
        },
    }
    return result


def detections_to_eval(det_batch, valid_only: bool = True) -> List[Dict]:
    """Convert a models.retinanet.Detections pytree to evaluator inputs."""
    out = []
    # one bundled device->host transfer (per-array np.asarray costs one
    # relay round trip each on remote-TPU transports)
    import jax

    boxes, scores, labels, valid = jax.device_get(
        (det_batch.boxes, det_batch.scores, det_batch.labels,
         det_batch.valid))
    boxes, scores, labels, valid = (np.asarray(boxes), np.asarray(scores),
                                    np.asarray(labels), np.asarray(valid))
    for i in range(boxes.shape[0]):
        m = valid[i] if valid_only else np.ones(boxes.shape[1], bool)
        out.append({"boxes": boxes[i][m], "scores": scores[i][m],
                    "labels": labels[i][m]})
    return out
