"""torchvision/detectron2 RetinaNet checkpoint -> Flax params converter.

The reference initializes its detector from the detectron2 model zoo or a
user checkpoint (``--pretrain_weight``, ``optimization/neural_sim_main.py:
602-606``). This converter maps a torchvision ``retinanet_resnet50_fpn``
state_dict (the publicly downloadable equivalent) onto our
models.retinanet.RetinaNet parameter tree:

  - conv weights: torch [out, in, kh, kw] -> flax [kh, kw, in, out]
  - BatchNorm folds into FrozenBN: scale = gamma / sqrt(var + eps),
    bias = beta - running_mean * scale
  - tower/predictor convs keep their per-level sharing (torchvision shares
    them too)
  - FPN P6 layouts differ between sources: detectron2 feeds C5 (2048 ch)
    into P6, torchvision feeds P5 (256 ch). ``detect_p6_source`` reads the
    layout off the converted kernel; build the model with the matching
    ``DetectorConfig.fpn_p6_source``.

torchvision itself is NOT required — the converter consumes a plain
{name: ndarray} mapping (torch tensors accepted), so checkpoints can be
pre-exported to npz on any machine with torch installed.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

_BN_EPS = 1e-5


def _arr(x) -> np.ndarray:
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.asarray(x, np.float32)


def _conv(sd: Mapping, name: str) -> Dict[str, np.ndarray]:
    out = {"kernel": _arr(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _arr(sd[f"{name}.bias"])
    return out


def _frozen_bn(sd: Mapping, name: str) -> Dict[str, np.ndarray]:
    gamma = _arr(sd[f"{name}.weight"])
    beta = _arr(sd[f"{name}.bias"])
    mean = _arr(sd[f"{name}.running_mean"])
    var = _arr(sd[f"{name}.running_var"])
    scale = gamma / np.sqrt(var + _BN_EPS)
    return {"scale": scale, "bias": beta - mean * scale}


def convert_torchvision_retinanet(sd: Mapping) -> Dict:
    """Full state_dict -> {'backbone': ..., 'fpn': ..., 'head': ...}."""
    params: Dict = {"backbone": {}, "fpn": {}, "head": {}}
    bb = params["backbone"]
    body = "backbone.body"

    bb["stem_conv"] = _conv(sd, f"{body}.conv1")
    bb["stem_bn"] = _frozen_bn(sd, f"{body}.bn1")

    blocks_per_stage = (3, 4, 6, 3)
    for stage, n_blocks in enumerate(blocks_per_stage):
        layer = f"{body}.layer{stage + 1}"
        for b in range(n_blocks):
            dst = {}
            for ci in (1, 2, 3):
                dst[f"conv{ci}"] = _conv(sd, f"{layer}.{b}.conv{ci}")
                dst[f"bn{ci}"] = _frozen_bn(sd, f"{layer}.{b}.bn{ci}")
            if f"{layer}.{b}.downsample.0.weight" in sd:
                dst["downsample_conv"] = _conv(sd, f"{layer}.{b}.downsample.0")
                dst["downsample_bn"] = _frozen_bn(sd, f"{layer}.{b}.downsample.1")
            bb[f"res{stage + 2}_block{b}"] = dst

    fpn = params["fpn"]
    # torchvision fpn: inner_blocks (lateral 1x1) and layer_blocks (3x3) for
    # C3..C5 in order; extra_blocks.p6/p7
    for i, lvl in enumerate((3, 4, 5)):
        inner = f"backbone.fpn.inner_blocks.{i}"
        outer = f"backbone.fpn.layer_blocks.{i}"
        # torchvision >=0.13 nests Conv2dNormActivation: `.0`; older is bare
        inner = inner if f"{inner}.weight" in sd else f"{inner}.0"
        outer = outer if f"{outer}.weight" in sd else f"{outer}.0"
        fpn[f"lateral{lvl}"] = _conv(sd, inner)
        fpn[f"output{lvl}"] = _conv(sd, outer)
    fpn["p6"] = _conv(sd, "backbone.fpn.extra_blocks.p6")
    fpn["p7"] = _conv(sd, "backbone.fpn.extra_blocks.p7")

    head = params["head"]
    for i in range(4):
        cname = f"head.classification_head.conv.{i}"
        bname = f"head.regression_head.conv.{i}"
        cname = cname if f"{cname}.weight" in sd else f"{cname}.0"
        bname = bname if f"{bname}.weight" in sd else f"{bname}.0"
        head[f"cls_tower{i}"] = _conv(sd, cname)
        head[f"box_tower{i}"] = _conv(sd, bname)
    head["cls_score"] = _conv(sd, "head.classification_head.cls_logits")
    head["bbox_pred"] = _conv(sd, "head.regression_head.bbox_reg")
    return params


def detect_p6_source(params: Dict) -> str:
    """Which feature the checkpoint's FPN P6 conv consumes, from its kernel
    in-channels: 2048 -> "c5" (detectron2 LastLevelP6P7(in_feature="res5"),
    the reference layout), 256 -> "p5" (torchvision LastLevelP6P7(256, 256)).
    Build the model with the matching ``fpn_p6_source`` or loading fails."""
    cin = int(params["fpn"]["p6"]["kernel"].shape[2])
    if cin == 2048:
        return "c5"
    if cin == 256:
        return "p5"
    raise ValueError(f"unrecognized P6 kernel in-channels: {cin}")


def merge_pretrained(params: Dict, converted: Dict):
    """Copy every converted tensor whose shape matches into ``params``;
    shape-mismatched leaves (the num_classes-dependent cls_score when the
    checkpoint was trained on COCO) keep their fresh initialization —
    detectron2-checkpointer semantics (the reference's NUM_CLASSES=6 resize,
    neural_sim_main.py:602-617). Returns (merged, skipped_paths)."""
    import jax

    import jax.numpy as jnp

    skipped = []

    def pick(path, fresh, ckpt):
        if tuple(np.shape(fresh)) == tuple(np.shape(ckpt)):
            return jnp.asarray(ckpt, dtype=jnp.asarray(fresh).dtype)
        skipped.append(jax.tree_util.keystr(path))
        return fresh

    merged = jax.tree_util.tree_map_with_path(pick, params, converted)
    return merged, skipped


def load_retinanet_checkpoint(path: str) -> Dict:
    """Load a .pth/.pt/.npz checkpoint file into our param tree."""
    if path.endswith(".npz"):
        flat = np.load(path)
        sd = {k: flat[k] for k in flat.files}
    else:
        import torch

        ckpt = torch.load(path, map_location="cpu", weights_only=True)
        sd = ckpt.get("model", ckpt.get("state_dict", ckpt))
    return convert_torchvision_retinanet(sd)
