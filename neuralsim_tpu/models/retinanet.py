"""RetinaNet-R50-FPN (Flax): model, anchors, losses, fixed-shape inference.

The TPU-native equivalent of the reference's detectron2 RetinaNet
(``COCO-Detection/retinanet_R_50_FPN_3x`` with the overrides of
``optimization/neural_sim_main.py:594-622``: NUM_CLASSES=6, frozen backbone,
batch 8, 50 inner iters). Everything — anchor matching, focal/smooth-L1
losses, top-k + NMS inference — is static-shape jnp inside one jittable
program, so the inner fine-tune AND the influence-function second-order
passes (HVP, mixed partials) differentiate through it directly.

Head/anchor hyperparameters follow the retinanet paper / detectron2
defaults: anchor sizes 32..512 x {2^0, 2^{1/3}, 2^{2/3}}, ratios
{0.5, 1, 2}, focal alpha 0.25 gamma 2, smooth-L1 beta 0.1, IoU fg/bg
0.5/0.4, score 0.05, NMS 0.5, 100 detections.
"""

from __future__ import annotations

import math
from typing import List, NamedTuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.models.fpn import FPN
from neuralsim_tpu.models.resnet import ResNet50
from neuralsim_tpu.ops.boxes import decode_deltas, encode_deltas, match_anchors
from neuralsim_tpu.ops.nms import batched_class_nms

STRIDES = (8, 16, 32, 64, 128)
SIZES = (32, 64, 128, 256, 512)
SCALES = tuple(2.0 ** (i / 3.0) for i in range(3))
RATIOS = (0.5, 1.0, 2.0)
NUM_ANCHORS = len(SCALES) * len(RATIOS)  # 9


def generate_anchors(image_size: int) -> List[jnp.ndarray]:
    """Per-level anchor boxes [H*W*9, 4] (XYXY, image coords), centers at
    (i + 0.5) * stride."""
    levels = []
    for stride, size in zip(STRIDES, SIZES):
        # SAME-padded strided convs produce ceil(side/stride) cells — the
        # anchor grid must match the head's actual output (floor division
        # agreed only at power-of-two sizes; at 800^2 it undercounted
        # P6/P7: 12,6 vs the convs' 13,7)
        fs = -(-image_size // stride)
        base = []
        for scale in SCALES:
            area = (size * scale) ** 2
            for ratio in RATIOS:
                w = math.sqrt(area / ratio)
                h = w * ratio
                base.append([-w / 2, -h / 2, w / 2, h / 2])
        base = jnp.array(base)  # [9, 4]
        ctr = (jnp.arange(fs) + 0.5) * stride
        cx, cy = jnp.meshgrid(ctr, ctr, indexing="xy")
        shifts = jnp.stack([cx, cy, cx, cy], axis=-1).reshape(-1, 1, 4)
        levels.append((shifts + base[None, :, :]).reshape(-1, 4))
    return levels


class RetinaNetHead(nn.Module):
    num_classes: int
    num_convs: int = 4
    channels: int = 256
    prior_prob: float = 0.01
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, features: List[jnp.ndarray]):
        cls_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"cls_tower{i}")
            for i in range(self.num_convs)
        ]
        box_tower = [
            nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                    name=f"box_tower{i}")
            for i in range(self.num_convs)
        ]
        bias_init = nn.initializers.constant(
            -math.log((1.0 - self.prior_prob) / self.prior_prob)
        )
        cls_score = nn.Conv(
            NUM_ANCHORS * self.num_classes, (3, 3), padding=1,
            bias_init=bias_init, dtype=self.dtype, name="cls_score",
        )
        bbox_pred = nn.Conv(NUM_ANCHORS * 4, (3, 3), padding=1,
                            dtype=self.dtype, name="bbox_pred")

        logits, deltas = [], []
        for feat in features:  # shared weights across levels
            c = feat
            for conv in cls_tower:
                c = nn.relu(conv(c))
            b = feat
            for conv in box_tower:
                b = nn.relu(conv(b))
            n, h, w, _ = feat.shape
            logits.append(cls_score(c).reshape(n, h * w * NUM_ANCHORS, self.num_classes))
            deltas.append(bbox_pred(b).reshape(n, h * w * NUM_ANCHORS, 4))
        return jnp.concatenate(logits, axis=1), jnp.concatenate(deltas, axis=1)


class RetinaNet(nn.Module):
    num_classes: int = 6
    fpn_p6_source: str = "c5"   # "c5" = detectron2 layout, "p5" = torchvision
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images):
        """images: [N, H, W, 3] normalized. Returns (logits [N,A,C],
        deltas [N,A,4]) over all pyramid anchors.

        Backbone freezing (FREEZE_AT=6, reference neural_sim_main.py:617) is
        a PARAMETER-side concern handled by the trainer's param partition
        (detector.trainer.split_trainable) — NOT a stop_gradient on
        activations, because the hypergradient's d(loss)/d(image) must flow
        through the frozen backbone exactly as torch's requires_grad=False
        weights still propagate input gradients."""
        c3, c4, c5 = ResNet50(dtype=self.dtype, name="backbone")(images)
        feats = FPN(p6_source=self.fpn_p6_source, dtype=self.dtype,
                    name="fpn")(c3, c4, c5)
        return RetinaNetHead(self.num_classes, dtype=self.dtype, name="head")(feats)


# --------------------------------------------------------------------------- #
# Losses
# --------------------------------------------------------------------------- #


def sigmoid_focal_loss(logits, targets_onehot, alpha: float, gamma: float):
    """Per-element focal loss; sum over classes."""
    p = jax.nn.sigmoid(logits)
    ce = optax_sigmoid_ce(logits, targets_onehot)
    p_t = p * targets_onehot + (1 - p) * (1 - targets_onehot)
    alpha_t = alpha * targets_onehot + (1 - alpha) * (1 - targets_onehot)
    return jnp.sum(alpha_t * ((1 - p_t) ** gamma) * ce, axis=-1)


def optax_sigmoid_ce(logits, labels):
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def smooth_l1(x, beta: float):
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


class DetBatch(NamedTuple):
    """One detector batch: images + padded GT."""

    images: jnp.ndarray     # [N, H, W, 3]
    gt_boxes: jnp.ndarray   # [N, G, 4] XYXY (padded)
    gt_labels: jnp.ndarray  # [N, G] int32 0-based class ids
    gt_valid: jnp.ndarray   # [N, G] bool


def retinanet_loss(apply_fn, params, batch: DetBatch, anchors,
                   dc: DetectorConfig, image_weight=None):
    """Total loss (focal cls + smooth-L1 box), normalized by #fg anchors —
    the quantity the reference backprops in Trainer.run_step
    (``neural_sim_main.py:555-589``, sum of detectron2's loss dict).

    ``image_weight``: optional [N] per-image weights. Weight 0 removes an
    image from BOTH the loss sums and the #fg normalizer, so a zero-padded
    batch is loss-identical to a genuinely smaller batch (used to pad the
    val loader's tail batch instead of dropping it)."""
    logits, deltas = apply_fn(params, batch.images)  # [N,A,C],[N,A,4]

    def per_image(logit, delta, boxes, labels, valid):
        midx, mlabel = match_anchors(anchors, boxes, valid,
                                     dc.iou_fg_threshold, dc.iou_bg_threshold)
        fg = mlabel == 1
        not_ignore = mlabel != -1

        cls_target = jnp.where(fg, labels[midx], -1)
        onehot = jax.nn.one_hot(cls_target, dc.num_classes, dtype=logit.dtype)
        cls_loss = sigmoid_focal_loss(logit, onehot, dc.focal_alpha, dc.focal_gamma)
        cls_loss = jnp.sum(jnp.where(not_ignore, cls_loss, 0.0))

        target_deltas = encode_deltas(anchors, boxes[midx])
        box_loss = jnp.sum(smooth_l1(delta - target_deltas, dc.smooth_l1_beta), -1)
        box_loss = jnp.sum(jnp.where(fg, box_loss, 0.0))
        return cls_loss, box_loss, jnp.sum(fg.astype(jnp.float32))

    cls_l, box_l, n_fg = jax.vmap(per_image)(
        logits, deltas, batch.gt_boxes, batch.gt_labels, batch.gt_valid
    )
    if image_weight is not None:
        w = image_weight.astype(cls_l.dtype)
        cls_l, box_l, n_fg = cls_l * w, box_l * w, n_fg * w
    norm = jnp.maximum(jnp.sum(n_fg), 1.0)
    losses = {
        "loss_cls": jnp.sum(cls_l) / norm,
        "loss_box_reg": jnp.sum(box_l) / norm,
    }
    return losses["loss_cls"] + losses["loss_box_reg"], losses


# --------------------------------------------------------------------------- #
# Inference
# --------------------------------------------------------------------------- #


class Detections(NamedTuple):
    boxes: jnp.ndarray    # [N, D, 4]
    scores: jnp.ndarray   # [N, D]
    labels: jnp.ndarray   # [N, D]
    valid: jnp.ndarray    # [N, D] bool


def retinanet_inference(apply_fn, params, images, anchors_per_level,
                        dc: DetectorConfig) -> Detections:
    """Fixed-shape decode: per-level top-k -> concat -> class NMS -> top D."""
    logits, deltas = apply_fn(params, images)

    level_sizes = [a.shape[0] for a in anchors_per_level]
    anchors_cat = jnp.concatenate(anchors_per_level, axis=0)

    def per_image(logit, delta):
        scores_all = jax.nn.sigmoid(logit)  # [A, C]
        boxes_parts, scores_parts, labels_parts = [], [], []
        start = 0
        for a_lvl in level_sizes:
            sl = slice(start, start + a_lvl)
            start += a_lvl
            s = scores_all[sl].reshape(-1)  # [a*C]
            k = min(dc.topk_per_level, s.shape[0])
            top_s, top_i = jax.lax.top_k(s, k)
            anchor_i = top_i // dc.num_classes
            class_i = top_i % dc.num_classes
            b = decode_deltas(anchors_cat[sl][anchor_i], delta[sl][anchor_i])
            keep = top_s > dc.score_threshold
            scores_parts.append(jnp.where(keep, top_s, -jnp.inf))
            boxes_parts.append(b)
            labels_parts.append(class_i)
        boxes = jnp.concatenate(boxes_parts, 0)
        scores = jnp.concatenate(scores_parts, 0)
        labels = jnp.concatenate(labels_parts, 0)
        keep_idx, keep_valid = batched_class_nms(
            boxes, scores, labels, dc.nms_threshold, dc.max_detections
        )
        return Detections(
            boxes[keep_idx], jnp.where(keep_valid, scores[keep_idx], 0.0),
            labels[keep_idx], keep_valid & jnp.isfinite(scores[keep_idx]),
        )

    return jax.vmap(per_image)(logits, deltas)
