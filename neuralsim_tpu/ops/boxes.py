"""Box utilities: IoU, Faster-RCNN-style delta encode/decode, anchor matching.

These replace the detectron2 compiled box/matcher ops the reference leans on
(SURVEY.md §2.3; exercised via ``model(datas)`` calls in
``optimization/neural_sim_main.py:571, 887, 960, 1031``) with vectorized jnp
that jits into the detector's training/inference graphs. Boxes are XYXY
float32 throughout; conversions to the COCO XYWH convention happen only at
the dataset/eval boundary.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def box_area(boxes):
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0.0
    )


def pairwise_iou(boxes_a, boxes_b):
    """IoU matrix [A, B] for XYXY boxes [A,4] and [B,4]."""
    lt = jnp.maximum(boxes_a[:, None, :2], boxes_b[None, :, :2])
    rb = jnp.minimum(boxes_a[:, None, 2:], boxes_b[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(boxes_a)[:, None] + box_area(boxes_b)[None, :] - inter
    return jnp.where(union > 0, inter / jnp.maximum(union, 1e-10), 0.0)


def encode_deltas(anchors, boxes):
    """(dx, dy, dw, dh) regression targets of ``boxes`` w.r.t. ``anchors``
    (standard Faster-RCNN parameterization, weights (1,1,1,1))."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    bw = boxes[..., 2] - boxes[..., 0]
    bh = boxes[..., 3] - boxes[..., 1]
    bx = boxes[..., 0] + 0.5 * bw
    by = boxes[..., 1] + 0.5 * bh

    return jnp.stack(
        [
            (bx - ax) / jnp.maximum(aw, 1e-6),
            (by - ay) / jnp.maximum(ah, 1e-6),
            jnp.log(jnp.maximum(bw, 1e-6) / jnp.maximum(aw, 1e-6)),
            jnp.log(jnp.maximum(bh, 1e-6) / jnp.maximum(ah, 1e-6)),
        ],
        axis=-1,
    )


def decode_deltas(anchors, deltas, clip: float = 4.135166556742356):
    """Inverse of encode_deltas; dw/dh clamped at log(1000/16) like
    detectron2's Box2BoxTransform to avoid exp overflow."""
    aw = anchors[..., 2] - anchors[..., 0]
    ah = anchors[..., 3] - anchors[..., 1]
    ax = anchors[..., 0] + 0.5 * aw
    ay = anchors[..., 1] + 0.5 * ah

    dx, dy = deltas[..., 0], deltas[..., 1]
    dw = jnp.minimum(deltas[..., 2], clip)
    dh = jnp.minimum(deltas[..., 3], clip)

    cx = dx * aw + ax
    cy = dy * ah + ay
    w = jnp.exp(dw) * aw
    h = jnp.exp(dh) * ah
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def match_anchors(anchors, gt_boxes, gt_valid, fg_thresh: float = 0.5,
                  bg_thresh: float = 0.4):
    """RetinaNet anchor matching with low-quality matches.

    Args:
      anchors: [A, 4].
      gt_boxes: [G, 4] (padded).
      gt_valid: [G] bool mask of real boxes.

    Returns:
      matched_idx: [A] index into gt (argmax IoU).
      labels: [A] int32 — 1 fg, 0 bg, -1 ignore (between thresholds).
    """
    iou = pairwise_iou(anchors, gt_boxes)          # [A, G]
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    matched_idx = jnp.argmax(iou, axis=1)
    matched_iou = jnp.max(iou, axis=1)

    labels = jnp.where(
        matched_iou >= fg_thresh, 1,
        jnp.where(matched_iou < bg_thresh, 0, -1),
    )

    # low-quality matches: for each gt, its best anchor becomes fg even
    # below threshold (detectron2 Matcher allow_low_quality_matches)
    best_per_gt = jnp.max(iou, axis=0)             # [G]
    is_best = (iou == best_per_gt[None, :]) & gt_valid[None, :] & (iou > 0)
    force_fg = jnp.any(is_best, axis=1)
    labels = jnp.where(force_fg, 1, labels)
    matched_idx = jnp.where(
        force_fg, jnp.argmax(jnp.where(is_best, iou, -1.0), axis=1), matched_idx
    )

    # anchors matched to nothing real stay background
    labels = jnp.where(jnp.any(gt_valid), labels, jnp.zeros_like(labels))
    return matched_idx, labels
