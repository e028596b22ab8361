"""Inner-loop detector fine-tuning.

Capability parity with the reference's ``Trainer(DefaultTrainer)`` +
``Detector.train`` (``optimization/neural_sim_main.py:531-589, 834-845``):
50 SGD-momentum steps at batch 8, LR 2.5e-4 with 10-iter linear warmup, no
decay, frozen backbone; warm-starting from the previous outer iteration's
weights is just "pass the same state in".

TPU-native structure: the whole 50-step loop is ONE ``lax.scan`` inside one
jitted program; batches are assembled on device from the renderer's output
(no PNG round trip) and can shard over the mesh's data axis.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.models.retinanet import (
    DetBatch,
    RetinaNet,
    generate_anchors,
    retinanet_loss,
)


class DetectorState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    step: jnp.ndarray


def make_detector_apply(dc: DetectorConfig):
    """Returns (module, apply_fn(params, images))."""
    model = RetinaNet(num_classes=dc.num_classes,
                      fpn_p6_source=dc.fpn_p6_source)
    return model, lambda params, images: model.apply({"params": params}, images)


def split_trainable(params: dict, dc: DetectorConfig):
    """Partition params into (trainable, frozen) — FREEZE_AT=6 freezes the
    whole ResNet, FPN+head stay trainable. The trainable subtree is exactly
    the parameter set the reference's optimizer param_groups hold, which is
    also the theta of every hypergradient quantity (v, Hv, mixed partials)."""
    if not dc.freeze_backbone:
        return dict(params), {}
    trainable = {k: v for k, v in params.items() if k != "backbone"}
    frozen = {"backbone": params["backbone"]}
    return trainable, frozen


def merge_params(trainable: dict, frozen: dict) -> dict:
    return {**trainable, **frozen}


def make_detector_optimizer(dc: DetectorConfig) -> optax.GradientTransformation:
    """SGD+momentum with linear warmup, constant after (the reference's
    solver: BASE_LR 2.5e-4, WARMUP_ITERS 10, STEPS=[] i.e. no decay)."""

    def schedule(step):
        warm = jnp.minimum(1.0, (step + 1) / jnp.maximum(dc.warmup_iters, 1))
        return dc.base_lr * warm

    return optax.chain(
        optax.add_decayed_weights(dc.weight_decay),
        optax.sgd(schedule, momentum=dc.momentum),
    )


def init_detector(key, dc: DetectorConfig) -> DetectorState:
    """Build the initial detector state. When ``dc.pretrain_weight`` is set
    (or ``dc.pretrain`` is true with a weight path), the backbone/FPN/head
    towers warm-start from the converted checkpoint — the reference's
    model-zoo / --pretrain_weight init (neural_sim_main.py:602-606). Tensors
    whose shapes don't match (the class-dependent cls_score when num_classes
    differs from the checkpoint's) keep their fresh initialization, matching
    detectron2's skip-incompatible-shapes checkpoint loading."""
    model, _ = make_detector_apply(dc)
    dummy = jnp.zeros((1, dc.image_size, dc.image_size, 3))
    params = dict(model.init(key, dummy)["params"])
    if dc.pretrain_weight:
        from neuralsim_tpu.models.convert_retinanet import (
            detect_p6_source,
            load_retinanet_checkpoint,
            merge_pretrained,
        )

        converted = load_retinanet_checkpoint(dc.pretrain_weight)
        ckpt_p6 = detect_p6_source(converted)
        if ckpt_p6 != dc.fpn_p6_source:
            raise ValueError(
                f"checkpoint {dc.pretrain_weight} has P6 source {ckpt_p6!r} "
                f"but DetectorConfig.fpn_p6_source={dc.fpn_p6_source!r}; set "
                "fpn_p6_source to match (torchvision exports need 'p5')"
            )
        params, skipped = merge_pretrained(params, converted)
        if skipped:
            import logging

            logging.getLogger(__name__).info(
                "pretrained init: %d tensors kept fresh (shape mismatch): %s",
                len(skipped), skipped,
            )
    elif dc.pretrain:
        raise ValueError(
            "detector.pretrain=True requires detector.pretrain_weight — the "
            "model-zoo URL path needs network access; pre-export the "
            "checkpoint to .npz and point pretrain_weight at it"
        )
    opt = make_detector_optimizer(dc)
    trainable, _ = split_trainable(params, dc)
    return DetectorState(params, opt.init(trainable), jnp.zeros((), jnp.int32))


def detector_loss_fn(params, batch: DetBatch, dc: DetectorConfig, anchors_cat):
    """Scalar total loss — THE loss the hypergradient engine differentiates
    (plug into neuralsim_tpu.hypergrad.influence)."""
    _, apply_fn = make_detector_apply(dc)
    total, _ = retinanet_loss(apply_fn, params, batch, anchors_cat, dc)
    return total


def train_step(state: DetectorState, batch: DetBatch, dc: DetectorConfig,
               anchors_cat):
    opt = make_detector_optimizer(dc)
    _, apply_fn = make_detector_apply(dc)
    trainable, frozen = split_trainable(state.params, dc)

    def loss_fn(tp):
        return retinanet_loss(
            apply_fn, merge_params(tp, frozen), batch, anchors_cat, dc
        )

    (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(trainable)
    updates, opt_state = opt.update(grads, state.opt_state, trainable)
    trainable = optax.apply_updates(trainable, updates)
    return DetectorState(merge_params(trainable, frozen), opt_state,
                         state.step + 1), {"loss": total, **losses}


def inner_train(state: DetectorState, batches, dc: DetectorConfig,
                anchors_cat=None, remat: bool = False):
    """Run the full inner fine-tune as one lax.scan.

    Args:
      batches: either a DetBatch whose leaves carry a leading [n_steps]
        axis (n_steps materialized batches — the mesh-sharded DP path), or
        an ``(dataset: DetBatch [N, ...], idx: [n_steps, batch]) `` pair —
        the memory-lean form: each scan step GATHERS its batch from the
        dataset instead of holding n_steps duplicated image copies in HBM
        (50x8 copies at 800^2 is ~3 GB; the gathered form is ~the dataset).
      remat: rematerialize each step in reverse mode — required when the
        whole trajectory is differentiated (hypergrad.unrolled): memory
        stays at one step's activations instead of n_steps'.

    Returns (final_state, per-step metrics dict).
    """
    if anchors_cat is None:
        anchors_cat = jnp.concatenate(generate_anchors(dc.image_size), axis=0)

    if isinstance(batches, DetBatch):
        def body(s, batch):
            return train_step(s, batch, dc, anchors_cat)

        xs = batches
    else:
        data, idx = batches

        def body(s, step_idx):
            batch = jax.tree_util.tree_map(
                lambda x: jnp.take(x, step_idx, axis=0), data)
            return train_step(s, batch, dc, anchors_cat)

        xs = idx

    if remat:
        body = jax.checkpoint(body)

    return jax.lax.scan(body, state, xs)


def auto_scale_config(dc: DetectorConfig, world_size: int) -> DetectorConfig:
    """Linear-scaling rule for data-parallel inner training: batch and LR
    scale with the number of chips, warmup shrinks to keep the same warmup
    epoch count — the capability of detectron2's auto_scale_workers
    (reference utils/defaults.py:572-641), applied to mesh data-parallelism
    instead of DDP workers."""
    if world_size <= 1:
        return dc
    return dataclasses.replace(
        dc,
        images_per_batch=dc.images_per_batch * world_size,
        base_lr=dc.base_lr * world_size,
        warmup_iters=max(1, dc.warmup_iters // world_size),
        max_iter=max(1, dc.max_iter // world_size),
    )


def cycle_indices(n: int, n_steps: int, batch_size: int, key) -> jnp.ndarray:
    """[n_steps, batch_size] dataset indices by shuffled cycling (the
    reference's infinite training loader semantics over a small synthetic
    set). This is THE batch schedule: cycle_batches materializes exactly
    these picks, and the unrolled hypergradient replays them by key."""
    total = n_steps * batch_size
    reps = -(-total // n)
    perm = jnp.concatenate(
        [jax.random.permutation(jax.random.fold_in(key, r), n)
         for r in range(reps)]
    )[:total]
    return perm.reshape(n_steps, batch_size)


def cycle_batches(images, gt_boxes, gt_labels, gt_valid, n_steps: int,
                  batch_size: int, key) -> DetBatch:
    """Materialized [n_steps, batch_size, ...] batches from cycle_indices —
    used where the stacked layout must be device_put with an explicit
    sharding (mesh DP inner training). The memory-lean path passes
    ``(DetBatch(dataset), cycle_indices(...))`` to inner_train instead."""
    idx = cycle_indices(images.shape[0], n_steps, batch_size, key).reshape(-1)
    pick = lambda x: x[idx].reshape((n_steps, batch_size) + x.shape[1:])
    return DetBatch(pick(images), pick(gt_boxes), pick(gt_labels), pick(gt_valid))
