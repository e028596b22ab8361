"""On-device connected components (ops.components) vs the host union-find
oracle, and the multi-box device annotation path (VERDICT r3 #5: the device
path must agree with host/reference CC semantics on multi-blob frames and
fill the max_boxes slots)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.detector.dataset import (
    auto_annotate,
    build_detector_batches,
    build_detector_batches_device,
)
from neuralsim_tpu.native import _connected_components_np
from neuralsim_tpu.ops.components import component_boxes, label_components


def _oracle_boxes(mask, k):
    stats = _connected_components_np(mask.astype(np.uint8))
    stats = sorted(stats, key=lambda s: -s[2] * s[3])[:k]
    return {(float(s[0]), float(s[1]),
             float(s[0] + s[2]), float(s[1] + s[3])) for s in stats}


def test_component_boxes_match_union_find_oracle(rng):
    """Random masks: the device boxes equal the host two-pass union-find's
    component boxes (same 8-connectivity, same box-area ranking)."""
    for trial in range(12):
        h, w = int(rng.randint(5, 28)), int(rng.randint(5, 28))
        mask = rng.rand(h, w) < rng.uniform(0.2, 0.7)
        boxes, valid = component_boxes(jnp.asarray(mask[None]), max_boxes=8)
        got = {tuple(map(float, b))
               for b, v in zip(np.asarray(boxes[0]), np.asarray(valid[0])) if v}
        assert got == _oracle_boxes(mask, 8), trial


def test_slot0_is_host_largest_component(rng):
    """Slot 0 must equal auto_annotate's largest-component box exactly —
    including when MORE components exist than slots (ranking is global,
    not first-K-found)."""
    mask = np.zeros((24, 24), bool)
    # five blobs; the largest-box one deliberately has the HIGHEST
    # first-pixel index so first-K-found extraction would miss it at K=2
    mask[1:3, 1:3] = True
    mask[1:3, 6:8] = True
    mask[6:8, 1:3] = True
    mask[6:8, 6:8] = True
    mask[15:23, 10:22] = True      # largest, last in row-major order
    boxes, valid = component_boxes(jnp.asarray(mask[None]), max_boxes=2)
    stats = _connected_components_np(mask.astype(np.uint8))
    s = max(stats, key=lambda st: st[2] * st[3])
    assert bool(valid[0, 0])
    assert tuple(map(float, np.asarray(boxes[0, 0]))) == (
        float(s[0]), float(s[1]), float(s[0] + s[2]), float(s[1] + s[3]))


def test_labels_8_connectivity():
    """Diagonal-touching pixels form ONE component (cv2 default)."""
    m = jnp.zeros((1, 5, 5), bool)
    m = m.at[0, 0, 0].set(True).at[0, 1, 1].set(True).at[0, 2, 2].set(True)
    lab = np.asarray(label_components(m))[0]
    fg = lab[lab < 25]
    assert (fg == fg[0]).all()
    boxes, valid = component_boxes(m, 4)
    assert int(np.asarray(valid[0]).sum()) == 1
    assert tuple(map(float, np.asarray(boxes[0, 0]))) == (0.0, 0.0, 3.0, 3.0)


def test_device_batches_multibox_matches_host_per_component():
    """Multi-blob frame: device slot 0 == host auto_annotate box; the other
    blob fills slot 1 (what the reference's single-box annotation drops,
    neural_sim_main.py:689-690)."""
    dc = DetectorConfig(num_classes=2, image_size=32, max_iter=2,
                        images_per_batch=2, warmup_iters=1)
    img = np.zeros((28, 28, 3), np.float32)
    img[4:12, 4:14] = 0.8         # blob A: 10x8 box
    img[18:24, 20:26] = 0.6       # blob B: 6x6 box
    imgs = np.stack([img, np.zeros_like(img)])

    inputs, boxes, labels, valid = build_detector_batches_device(
        imgs, [1, 1], dc)
    host = auto_annotate(img)
    x, y, w, h = host
    np.testing.assert_allclose(np.asarray(boxes[0, 0]),
                               [x, y, x + w, y + h])
    np.testing.assert_allclose(np.asarray(boxes[0, 1]), [20, 18, 26, 24])
    assert np.asarray(valid[0]).tolist() == [True, True, False, False]
    assert np.asarray(labels[0]).tolist()[:2] == [1, 1]
    # empty frame: nothing valid
    assert not np.asarray(valid[1]).any()

    # largest_only restores the reference's one-box semantics
    _, b1, _, v1 = build_detector_batches_device(imgs, [1, 1], dc,
                                                 largest_only=True)
    assert np.asarray(v1[0]).tolist() == [True, False, False, False]
    np.testing.assert_allclose(np.asarray(b1[0, 0]), np.asarray(boxes[0, 0]))


def test_device_batches_single_blob_agrees_with_host_path():
    """Single-object render: device and host batch builders emit identical
    GT (the round-3 guarantee, now via real CC instead of bbox-of-all)."""
    dc = DetectorConfig(num_classes=2, image_size=32, max_iter=2,
                        images_per_batch=2, warmup_iters=1)
    rng = np.random.RandomState(3)
    img = np.zeros((30, 30, 3), np.float32)
    img[7:19, 9:23] = rng.uniform(0.3, 1.0, (12, 14, 3))
    imgs = np.stack([img, img])

    i_d, b_d, l_d, v_d = build_detector_batches_device(imgs, [0, 1], dc)
    i_h, b_h, l_h, v_h = build_detector_batches(imgs, [0, 1], dc)
    np.testing.assert_allclose(np.asarray(b_d[:, 0]), np.asarray(b_h[:, 0]))
    np.testing.assert_array_equal(np.asarray(v_d), np.asarray(v_h))
    np.testing.assert_array_equal(np.asarray(l_d[:, 0]), np.asarray(l_h[:, 0]))
    np.testing.assert_allclose(np.asarray(i_d), np.asarray(i_h))


def test_device_annotation_jits_and_multiblob_grad_safe():
    """The CC labeling (while_loop) must stay off the differentiable path:
    grads w.r.t. images flow through prepare_images while boxes act as
    data — the unrolled hypergradient's usage (hypergrad/unrolled.py:69)."""
    dc = DetectorConfig(num_classes=2, image_size=16, max_iter=1,
                        images_per_batch=1, warmup_iters=1)
    img = jnp.zeros((1, 12, 12, 3)).at[0, 2:5, 2:5].set(0.9)
    img = img.at[0, 8:11, 7:11].set(0.5)

    @jax.jit
    def f(x):
        inputs, b, l, v = build_detector_batches_device(x, [1], dc)
        return jnp.sum(inputs ** 2)

    g = jax.grad(f)(img)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0.0
