"""RetinaNet model: shapes, anchors, loss behavior, inference, inner train.

Uses a small image size (64) so CPU runs stay fast; the architecture is the
full R50-FPN P3-P7 stack.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.detector.trainer import (
    cycle_batches,
    init_detector,
    inner_train,
    make_detector_apply,
)
from neuralsim_tpu.models.retinanet import (
    NUM_ANCHORS,
    DetBatch,
    generate_anchors,
    retinanet_inference,
    retinanet_loss,
    sigmoid_focal_loss,
    smooth_l1,
)

DC = DetectorConfig(num_classes=3, image_size=64, max_iter=2,
                    images_per_batch=2, warmup_iters=1)


@pytest.fixture(scope="module")
def det():
    state = init_detector(jax.random.PRNGKey(0), DC)
    _, apply_fn = make_detector_apply(DC)
    return state, apply_fn


def test_anchor_counts():
    anchors = generate_anchors(DC.image_size)
    sizes = [a.shape[0] for a in anchors]
    # strides 8..128 on a 64px image -> 8,4,2,1,1 cells per side (min 1)
    assert sizes[0] == 8 * 8 * NUM_ANCHORS
    assert sizes[1] == 4 * 4 * NUM_ANCHORS
    for a in anchors:
        a = np.asarray(a)
        assert (a[:, 2] > a[:, 0]).all() and (a[:, 3] > a[:, 1]).all()


def test_forward_shapes(det):
    state, apply_fn = det
    imgs = jnp.zeros((2, 64, 64, 3))
    logits, deltas = apply_fn(state.params, imgs)
    total_anchors = sum(a.shape[0] for a in generate_anchors(64))
    assert logits.shape == (2, total_anchors, DC.num_classes)
    assert deltas.shape == (2, total_anchors, 4)


def test_anchor_grid_matches_head_at_non_pow2_size():
    """SAME-padded strided convs produce ceil(side/stride) cells; the
    anchor grid must agree at sizes where floor != ceil (the 800^2 sweep
    crashed on P6/P7 undercounting: 12,6 anchors vs the convs' 13,7)."""
    dc = DetectorConfig(num_classes=2, image_size=100, max_iter=1,
                        images_per_batch=1, warmup_iters=1)
    state = init_detector(jax.random.PRNGKey(0), dc)
    _, apply_fn = make_detector_apply(dc)
    logits, deltas = apply_fn(state.params, jnp.zeros((1, 100, 100, 3)))
    total_anchors = sum(a.shape[0] for a in generate_anchors(100))
    # 100px at strides 8..128 -> ceil sides 13,7,4,2,1
    assert total_anchors == (13 * 13 + 7 * 7 + 4 * 4 + 2 * 2 + 1) \
        * NUM_ANCHORS
    assert logits.shape == (1, total_anchors, dc.num_classes)
    assert deltas.shape == (1, total_anchors, 4)


def test_initial_cls_scores_near_prior(det):
    """Focal-loss bias init: initial foreground probability ~ 0.01."""
    state, apply_fn = det
    imgs = jnp.zeros((1, 64, 64, 3))
    logits, _ = apply_fn(state.params, imgs)
    p = np.asarray(jax.nn.sigmoid(logits))
    assert 0.001 < p.mean() < 0.05


def test_focal_loss_downweights_easy():
    logits = jnp.array([[5.0], [0.0]])   # confident-correct vs uncertain
    targets = jnp.array([[1.0], [1.0]])
    l = np.asarray(sigmoid_focal_loss(logits, targets, 0.25, 2.0))
    assert l[0] < l[1] * 1e-2


def test_smooth_l1_regimes():
    beta = 0.1
    small = float(smooth_l1(jnp.array(0.05), beta))
    np.testing.assert_allclose(small, 0.5 * 0.05**2 / beta, rtol=1e-6)
    big = float(smooth_l1(jnp.array(1.0), beta))
    np.testing.assert_allclose(big, 1.0 - 0.05, rtol=1e-6)


def _batch_with_object():
    imgs = jnp.zeros((2, 64, 64, 3)).at[:, 16:48, 16:48, :].set(1.0)
    gt_boxes = jnp.tile(jnp.array([[[16.0, 16, 48, 48]]]), (2, 1, 1))
    gt_labels = jnp.zeros((2, 1), jnp.int32)
    gt_valid = jnp.ones((2, 1), bool)
    return DetBatch(imgs, gt_boxes, gt_labels, gt_valid)


def test_loss_finite_and_grad_flows(det):
    state, apply_fn = det
    anchors_cat = jnp.concatenate(generate_anchors(64), 0)
    batch = _batch_with_object()
    total, losses = retinanet_loss(apply_fn, state.params, batch, anchors_cat, DC)
    assert np.isfinite(float(total))
    assert float(losses["loss_cls"]) > 0 and float(losses["loss_box_reg"]) >= 0

    grads = jax.grad(
        lambda p: retinanet_loss(apply_fn, p, batch, anchors_cat, DC)[0]
    )(state.params)
    head_grad = jax.tree_util.tree_leaves(grads["head"])
    assert any(float(jnp.abs(g).max()) > 0 for g in head_grad)

    # image gradients flow THROUGH the frozen backbone (hypergrad contract)
    img_grad = jax.grad(
        lambda im: retinanet_loss(
            apply_fn, state.params,
            DetBatch(im, batch.gt_boxes, batch.gt_labels, batch.gt_valid),
            anchors_cat, DC,
        )[0]
    )(batch.images)
    assert float(jnp.abs(img_grad).max()) > 0


def test_freeze_is_param_partition(det):
    """FREEZE_AT=6: backbone excluded from trainable params and untouched by
    a train step."""
    from neuralsim_tpu.detector.trainer import split_trainable, train_step

    state, _ = det
    trainable, frozen = split_trainable(state.params, DC)
    assert "backbone" in frozen and "backbone" not in trainable
    assert "head" in trainable and "fpn" in trainable

    anchors_cat = jnp.concatenate(generate_anchors(64), 0)
    new_state, _ = train_step(state, _batch_with_object(), DC, anchors_cat)
    before = jax.tree_util.tree_leaves(state.params["backbone"])
    after = jax.tree_util.tree_leaves(new_state.params["backbone"])
    assert all(np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(before, after))
    # head moved
    hb = jax.tree_util.tree_leaves(state.params["head"])
    ha = jax.tree_util.tree_leaves(new_state.params["head"])
    assert any(not np.array_equal(np.asarray(a), np.asarray(b))
               for a, b in zip(hb, ha))


def test_inner_train_reduces_loss(det):
    state, _ = det
    batch = _batch_with_object()
    dc = dataclasses.replace(DC, max_iter=6, base_lr=1e-3)
    batches = DetBatch(*[jnp.stack([x] * 6) for x in batch])
    new_state, metrics = inner_train(state, batches, dc)
    losses = np.asarray(metrics["loss"])
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]
    assert int(new_state.step) == 6


def test_inference_shapes_and_validity(det):
    state, apply_fn = det
    imgs = jnp.zeros((2, 64, 64, 3)).at[:, 10:50, 10:50, :].set(1.0)
    dets = retinanet_inference(
        apply_fn, state.params, imgs, generate_anchors(64), DC
    )
    assert dets.boxes.shape == (2, DC.max_detections, 4)
    assert dets.scores.shape == (2, DC.max_detections)
    assert np.isfinite(np.asarray(dets.boxes)).all()
    # untrained model at prior 0.01 < score_threshold 0.05: nothing valid
    assert not np.asarray(dets.valid).any() or np.asarray(dets.scores).max() <= 1.0


def test_cycle_batches_shapes():
    imgs = jnp.arange(5 * 4 * 4 * 3, dtype=jnp.float32).reshape(5, 4, 4, 3)
    boxes = jnp.zeros((5, 1, 4))
    labels = jnp.zeros((5, 1), jnp.int32)
    valid = jnp.ones((5, 1), bool)
    b = cycle_batches(imgs, boxes, labels, valid, n_steps=3, batch_size=2,
                      key=jax.random.PRNGKey(0))
    assert b.images.shape == (3, 2, 4, 4, 3)
    # every element comes from the source set
    assert set(np.asarray(b.images).reshape(-1).tolist()) <= set(
        np.asarray(imgs).reshape(-1).tolist()
    )


def test_auto_scale_config():
    from neuralsim_tpu.detector.trainer import auto_scale_config

    base = DetectorConfig(images_per_batch=8, base_lr=2.5e-4, max_iter=50,
                          warmup_iters=10)
    assert auto_scale_config(base, 1) is base
    scaled = auto_scale_config(base, 4)
    assert scaled.images_per_batch == 32
    assert abs(scaled.base_lr - 1e-3) < 1e-9
    assert scaled.warmup_iters == 2
    assert scaled.max_iter == 12


def test_inner_train_indexed_matches_stacked(det):
    """The memory-lean (dataset, cycle_indices) form of inner_train gathers
    each step's batch in-scan and must produce EXACTLY the stacked
    cycle_batches trajectory (same key -> same schedule)."""
    from neuralsim_tpu.detector.trainer import cycle_indices

    state, _ = det
    key = jax.random.PRNGKey(7)
    rng = np.random.RandomState(0)
    imgs = jnp.asarray(rng.rand(5, 64, 64, 3), jnp.float32)
    boxes = jnp.tile(jnp.asarray([[8.0, 8.0, 40.0, 40.0]]), (5, 1, 1))
    labels = jnp.zeros((5, 1), jnp.int32)
    valid = jnp.ones((5, 1), bool)
    dc = dataclasses.replace(DC, max_iter=4, images_per_batch=2)

    from neuralsim_tpu.detector.trainer import cycle_batches as cb

    stacked = cb(imgs, boxes, labels, valid, 4, 2, key)
    s_stacked, m_stacked = inner_train(state, stacked, dc)

    idx = cycle_indices(5, 4, 2, key)
    s_idx, m_idx = inner_train(
        state, (DetBatch(imgs, boxes, labels, valid), idx), dc)

    np.testing.assert_array_equal(np.asarray(m_stacked["loss"]),
                                  np.asarray(m_idx["loss"]))
    for a, b in zip(jax.tree_util.tree_leaves(s_stacked.params),
                    jax.tree_util.tree_leaves(s_idx.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
