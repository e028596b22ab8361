"""Fixed-shape non-maximum suppression for TPU.

Replaces detectron2's compiled C++/CUDA NMS (SURVEY.md §2.3) with a
jit-compilable iterative scheme: ``max_out`` rounds of pick-argmax /
suppress-overlaps over a score vector — static shapes, no host syncs,
vmappable over the batch. O(max_out * N) IoU work on the VPU, which at
N ~ a few thousand post-top-k candidates is negligible next to the backbone.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralsim_tpu.ops.boxes import pairwise_iou


def nms(boxes, scores, iou_threshold: float, max_out: int):
    """Greedy NMS.

    Args:
      boxes: [N, 4] XYXY.
      scores: [N] (suppressed/invalid entries should carry -inf or very low).
      max_out: number of picks (static).

    Returns:
      keep_idx: [max_out] indices into boxes (repeats possible for padding).
      keep_valid: [max_out] bool — False for padded tail picks.
    """
    n = boxes.shape[0]
    iou = pairwise_iou(boxes, boxes)  # [N, N]

    def body(carry, _):
        live_scores = carry
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        valid = best_score > -jnp.inf
        # suppress overlaps with the pick (including itself)
        suppress = iou[best] > iou_threshold
        suppress = suppress | (jnp.arange(n) == best)
        live_scores = jnp.where(
            valid & suppress, -jnp.inf, live_scores
        )
        return live_scores, (best, valid)

    init = jnp.where(jnp.isfinite(scores), scores, -jnp.inf)
    _, (keep_idx, keep_valid) = jax.lax.scan(body, init, None, length=max_out)
    return keep_idx, keep_valid


def batched_class_nms(boxes, scores, labels, iou_threshold: float, max_out: int):
    """Per-class NMS via the coordinate-offset trick (boxes of different
    classes never overlap), matching detectron2's batched_nms semantics."""
    offsets = labels.astype(boxes.dtype) * (
        jnp.max(boxes) - jnp.min(boxes) + 1.0
    )
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, iou_threshold, max_out)
