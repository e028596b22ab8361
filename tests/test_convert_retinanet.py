"""torchvision-layout RetinaNet state_dict -> Flax params: structural parity
(every converted tensor must drop into the live model and run)."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.detector.trainer import init_detector, make_detector_apply
from neuralsim_tpu.models.convert_retinanet import convert_torchvision_retinanet

# real torchvision exports have the P6-from-P5 (256-in) layout
DC = DetectorConfig(num_classes=6, image_size=64, fpn_p6_source="p5")


def _fake_torchvision_sd(rng, num_classes=6, p6_in=256):
    sd = {}

    def conv(name, cout, cin, k, bias=False):
        # fan-in scaling keeps the 50-layer forward finite with random weights
        std = 1.0 / np.sqrt(cin * k * k)
        sd[f"{name}.weight"] = (rng.randn(cout, cin, k, k) * std).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = (rng.randn(cout) * 0.01).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32) + 0.5
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = rng.rand(c).astype(np.float32) + 0.5

    body = "backbone.body"
    conv(f"{body}.conv1", 64, 3, 7)
    bn(f"{body}.bn1", 64)
    widths = (64, 128, 256, 512)
    blocks = (3, 4, 6, 3)
    cin = 64
    for s, (nb, w) in enumerate(zip(blocks, widths)):
        for b in range(nb):
            base = f"{body}.layer{s + 1}.{b}"
            conv(f"{base}.conv1", w, cin if b == 0 else w * 4, 1)
            bn(f"{base}.bn1", w)
            conv(f"{base}.conv2", w, w, 3)
            bn(f"{base}.bn2", w)
            conv(f"{base}.conv3", w * 4, w, 1)
            bn(f"{base}.bn3", w * 4)
            if b == 0:
                conv(f"{base}.downsample.0", w * 4, cin, 1)
                bn(f"{base}.downsample.1", w * 4)
        cin = w * 4

    for i, c in enumerate((512, 1024, 2048)):
        conv(f"backbone.fpn.inner_blocks.{i}", 256, c, 1, bias=True)
        conv(f"backbone.fpn.layer_blocks.{i}", 256, 256, 3, bias=True)
    conv("backbone.fpn.extra_blocks.p6", 256, p6_in, 3, bias=True)
    conv("backbone.fpn.extra_blocks.p7", 256, 256, 3, bias=True)

    for i in range(4):
        conv(f"head.classification_head.conv.{i}", 256, 256, 3, bias=True)
        conv(f"head.regression_head.conv.{i}", 256, 256, 3, bias=True)
    conv("head.classification_head.cls_logits", 9 * num_classes, 256, 3, bias=True)
    conv("head.regression_head.bbox_reg", 9 * 4, 256, 3, bias=True)
    return sd


def test_converted_params_drop_into_model(rng):
    sd = _fake_torchvision_sd(rng)
    converted = convert_torchvision_retinanet(sd)

    state = init_detector(jax.random.PRNGKey(0), DC)
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, state.params)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, converted)
    assert jax.tree_util.tree_structure(ref_shapes) == jax.tree_util.tree_structure(got_shapes)
    mismatches = [
        (p, a, b) for (p, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(ref_shapes),
            jax.tree_util.tree_leaves_with_path(got_shapes),
        ) if a != b
    ]
    assert not mismatches, mismatches[:5]

    # converted params actually run
    _, apply_fn = make_detector_apply(DC)
    logits, deltas = apply_fn(
        jax.tree_util.tree_map(jnp.asarray, converted),
        jnp.zeros((1, 64, 64, 3)),
    )
    assert np.isfinite(np.asarray(logits)).all()
    assert np.isfinite(np.asarray(deltas)).all()


def test_bn_folding_math(rng):
    from neuralsim_tpu.models.convert_retinanet import _frozen_bn

    sd = {}
    c = 8
    sd["bn.weight"] = rng.rand(c).astype(np.float32) + 0.5
    sd["bn.bias"] = rng.randn(c).astype(np.float32)
    sd["bn.running_mean"] = rng.randn(c).astype(np.float32)
    sd["bn.running_var"] = rng.rand(c).astype(np.float32) + 0.5
    folded = _frozen_bn(sd, "bn")
    x = rng.randn(4, c).astype(np.float32)
    want = (x - sd["bn.running_mean"]) / np.sqrt(sd["bn.running_var"] + 1e-5) \
        * sd["bn.weight"] + sd["bn.bias"]
    got = x * folded["scale"] + folded["bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_detect_p6_source(rng):
    from neuralsim_tpu.models.convert_retinanet import detect_p6_source

    tv = convert_torchvision_retinanet(_fake_torchvision_sd(rng, p6_in=256))
    d2 = convert_torchvision_retinanet(_fake_torchvision_sd(rng, p6_in=2048))
    assert detect_p6_source(tv) == "p5"
    assert detect_p6_source(d2) == "c5"

    # detectron2-layout checkpoints drop into the default (c5) model
    _, apply_fn = make_detector_apply(DetectorConfig(num_classes=6, image_size=64))
    logits, _ = apply_fn(
        jax.tree_util.tree_map(jnp.asarray, d2), jnp.zeros((1, 64, 64, 3))
    )
    assert np.isfinite(np.asarray(logits)).all()


def test_init_detector_pretrained(rng, tmp_path):
    """The reference's --pretrain_weight path (neural_sim_main.py:602-606):
    init_detector warm-starts backbone/FPN/towers from a COCO-class
    checkpoint, and the 6-class cls_score keeps its fresh init."""
    import dataclasses

    sd = _fake_torchvision_sd(rng, num_classes=80)
    path = str(tmp_path / "retinanet_coco.npz")
    np.savez(path, **sd)

    dc = dataclasses.replace(DC, pretrain=True, pretrain_weight=path)
    key = jax.random.PRNGKey(0)
    state = init_detector(key, dc)
    fresh = init_detector(key, DC)
    converted = convert_torchvision_retinanet(sd)

    # backbone + FPN + towers + bbox_pred come from the checkpoint
    for section in ("backbone", "fpn"):
        got = jax.tree_util.tree_leaves(state.params[section])
        want = jax.tree_util.tree_leaves(converted[section])
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["bbox_pred"]["kernel"]),
        converted["head"]["bbox_pred"]["kernel"])
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["cls_tower0"]["kernel"]),
        converted["head"]["cls_tower0"]["kernel"])

    # the 80-class cls_score does NOT fit the 6-class head: fresh init kept
    assert state.params["head"]["cls_score"]["kernel"].shape[-1] == 9 * 6
    np.testing.assert_array_equal(
        np.asarray(state.params["head"]["cls_score"]["kernel"]),
        np.asarray(fresh.params["head"]["cls_score"]["kernel"]))


def test_init_detector_p6_mismatch_raises(rng, tmp_path):
    import dataclasses

    import pytest

    sd = _fake_torchvision_sd(rng, p6_in=256)
    path = str(tmp_path / "tv.npz")
    np.savez(path, **sd)
    dc = dataclasses.replace(DC, pretrain_weight=path, fpn_p6_source="c5")
    with pytest.raises(ValueError, match="P6 source"):
        init_detector(jax.random.PRNGKey(0), dc)
