"""Unrolled (exact) hypergradient through the inner training loop.

The reference approximates dL_val/dI with an influence function — one
stochastic (H + lambda I)v product and a mixed second derivative
(``neural_sim_main.py:912-1069``) — because unrolling 50 optimizer steps
under torch autograd is memory-infeasible there. Under JAX the inner
fine-tune is a pure ``lax.scan`` (detector/trainer.py:inner_train), so the
TRUE gradient of the validation loss through the entire training
trajectory is one ``jax.grad`` with per-step rematerialization: memory is
one training step's activations, compute is ~2x the forward train.

This is a capability the reference does not have; its influence path
remains the default (``BilevelConfig.hypergrad_mode="influence"``) and
this exact mode (``"unrolled"``) is both a production option and the
oracle that finite-difference tests validate end-to-end (the influence
approximation cannot be FD-tested: it is biased away from the true
gradient whenever the inner loop has not converged).

Gradients flow through image PIXEL VALUES only: the device auto-
annotation's boxes are integer index reductions (zero derivative), which
matches the reference's protocol of differentiating train-image pixels
while treating labels as data (``neural_sim_main.py:855-911``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.detector.dataset import build_detector_batches_device
from neuralsim_tpu.detector.trainer import (
    DetectorState,
    cycle_indices,
    inner_train,
    merge_params,
    split_trainable,
)
from neuralsim_tpu.models.retinanet import DetBatch, retinanet_loss


def val_loss_sum(det_apply, params, val_data, dc: DetectorConfig,
                 anchors_cat):
    """Sum of detector losses over the entire val set (the quantity whose
    parameter gradient the reference accumulates, :948-969)."""
    batch = DetBatch(val_data.images, val_data.gt_boxes, val_data.gt_labels,
                     val_data.gt_valid)
    total, _ = retinanet_loss(det_apply, params, batch, anchors_cat, dc)
    return total


def unrolled_grad_images(det_apply, det_state0: DetectorState, images,
                         labels, val_data, dc: DetectorConfig, anchors_cat,
                         batch_key, background_images=None,
                         background_labels=None):
    """d val_loss(inner_train(det_state0, batches(images))) / d images.

    Args:
      det_state0: detector state BEFORE the inner fine-tune (the unroll
        recomputes the training trajectory under the gradient).
      images: [N, H, W, 3] rendered images in [0, 1].
      batch_key: the SAME key the forward inner train used for
        cycle_batches, so the recomputed schedule is identical.
      background_images/labels: optional mixed-dataset backgrounds
        (the reference's create_dataset merges background classes,
        ``neural_sim_main.py:729-781``). They enter the recomputed
        schedule as CONSTANT dataset entries appended AFTER the renders
        (the driver's concatenation order), participate in every batch
        the schedule assigns them to, and receive zero image-cotangent
        (stop_gradient) — the returned gradient covers the renders only.
        With backgrounds, annotation is single-box (largest component),
        matching the host batch-build the mixed trajectory trained on.

    Returns [N, H, W, 3] — the true dL_val/dI the influence path
    approximates.
    """
    has_bg = background_images is not None
    bg_const = None
    if has_bg:
        bg_const = build_detector_batches_device(
            jax.lax.stop_gradient(jnp.asarray(background_images)),
            list(background_labels), dc, largest_only=True)

    def loss_of_images(imgs):
        inputs, gb, gl, gv = build_detector_batches_device(
            imgs, labels, dc, largest_only=has_bg)
        if has_bg:
            inputs, gb, gl, gv = (
                jnp.concatenate([a, b], axis=0)
                for a, b in zip((inputs, gb, gl, gv), bg_const))
        # gather-by-index batches: the backward accumulates per-step image
        # cotangents into the dataset by scatter-add instead of holding a
        # [n_steps x batch] stack of image cotangents (identical schedule —
        # cycle_indices IS cycle_batches' pick order for the same key)
        idx = cycle_indices(inputs.shape[0], dc.max_iter,
                            dc.images_per_batch, batch_key)
        final, _ = inner_train(det_state0,
                               (DetBatch(inputs, gb, gl, gv), idx),
                               dc, anchors_cat, remat=True)
        return val_loss_sum(det_apply, final.params, val_data, dc,
                            anchors_cat)

    return jax.grad(loss_of_images)(jnp.asarray(images))
