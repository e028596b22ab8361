"""Detector dataset construction: auto-annotation + on-device batches +
COCO-format export.

Capability parity with the reference's ``createCocoJSONFromSynthetics`` /
``create_dataset`` / ``find_bbox`` / ``get_annotation``
(``optimization/neural_sim_main.py:624-832``): bounding boxes come from the
rendered image alone — grayscale, threshold > 1/255, connected components,
largest component's box — and a COCO JSON can be written for
interoperability. The OpenCV/pycocotools C extensions are replaced by
first-party code (``neuralsim_tpu.native``: C++ connected components + RLE
with a pure-numpy fallback).

TPU-native difference: the primary data path keeps rendered images as device
arrays end-to-end (the reference round-trips through 8-bit PNGs between the
renderer and detector, run_nerf_noscale.py:245-250); PNG export is the
optional interoperability mode.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.native import connected_components, rle_encode

# ITU-R BT.601 luma — what cv2.cvtColor(RGB2GRAY) computes (reference :793)
_LUMA = np.array([0.299, 0.587, 0.114], np.float32)


def auto_annotate(image: np.ndarray) -> Optional[Tuple[int, int, int, int]]:
    """Largest-component bounding box (x, y, w, h) of a rendered image, or
    None for an empty image. ``image`` is [H, W, 3+] float in [0,1] or uint8."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img[..., :3], 0, 1) * 255).astype(np.uint8)
    gray = (img[..., :3].astype(np.float32) @ _LUMA).round().astype(np.uint8)
    mask = (gray > 1).astype(np.uint8)
    stats = connected_components(mask)  # [(x, y, w, h, area), ...] no bg
    if not stats:
        return None
    x, y, w, h, _ = max(stats, key=lambda s: s[2] * s[3])
    return int(x), int(y), int(w), int(h)


def annotation_mask(image: np.ndarray) -> np.ndarray:
    """Binary foreground mask (the reference's cv2.threshold output)."""
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img[..., :3], 0, 1) * 255).astype(np.uint8)
    gray = (img[..., :3].astype(np.float32) @ _LUMA).round().astype(np.uint8)
    return (gray > 1).astype(np.uint8)


def prepare_images(images: np.ndarray, dc: DetectorConfig,
                   pixel_mean: Sequence[float] = (0.485, 0.456, 0.406),
                   pixel_std: Sequence[float] = (0.229, 0.224, 0.225)):
    """RGBA/RGB renders [N,H,W,C] in [0,1] -> padded normalized model input
    [N, S, S, 3] (top-left pad to dc.image_size, matching the reference's
    augmentation-free loaders that keep pixels aligned with render output —
    required so image gradients align pixel-for-pixel, dataset_mapper note
    in SURVEY.md §2.2)."""
    import jax.numpy as jnp

    imgs = jnp.asarray(images)[..., :3]
    n, h, w, _ = imgs.shape
    s = dc.image_size
    if h > s or w > s:
        raise ValueError(f"renders {h}x{w} exceed detector input {s}")
    imgs = jnp.pad(imgs, ((0, 0), (0, s - h), (0, s - w), (0, 0)))
    mean = jnp.asarray(pixel_mean)
    std = jnp.asarray(pixel_std)
    return (imgs - mean) / std


def build_detector_batches_device(images, labels: Sequence[int],
                                  dc: DetectorConfig, max_boxes: int = 4,
                                  largest_only: bool = False):
    """Device-resident twin of build_detector_batches: renders stay on
    device end-to-end into the detector (no host round trip / relay
    latency). Boxes come from exact 8-connected components computed ON
    DEVICE (ops.components — static-shape segmented-scan labeling), so
    the path agrees with the host/reference connected-components
    semantics even on multi-blob frames (VERDICT r3 #5; the previous
    bbox-of-all-foreground approximation trained on systematically wider
    boxes there). Slot 0 is the host auto_annotate largest-component box
    exactly; remaining slots carry the next-largest components (same
    class label — a rendered frame contains one object class), which the
    reference's single-box annotation simply drops (neural_sim_main.py:
    689-690). ``largest_only=True`` restores that reference behavior."""
    import jax.numpy as jnp

    from neuralsim_tpu.ops.components import component_boxes

    imgs = jnp.asarray(images)[..., :3]
    n, h, w, _ = imgs.shape
    # floor, not round: matches the host path's to8b truncation
    # ((clip*255).astype(uint8), reference run_nerf_helpers.py:14) so a
    # pixel near the threshold classifies identically whether annotated
    # on-device or from the written PNG (ADVICE r2)
    u8 = jnp.floor(jnp.clip(imgs, 0.0, 1.0) * 255.0)
    gray = jnp.round(u8 @ jnp.asarray(_LUMA, jnp.float32))
    mask = gray > 1.0                                    # [N, H, W]

    gt_boxes, gt_valid = component_boxes(mask, max_boxes)
    if largest_only:
        gt_valid = gt_valid.at[:, 1:].set(False)
        gt_boxes = gt_boxes.at[:, 1:].set(0.0)
    gt_labels = jnp.broadcast_to(
        jnp.asarray(labels, jnp.int32)[:, None], (n, max_boxes))
    gt_labels = jnp.where(gt_valid, gt_labels, 0)
    inputs = prepare_images(imgs, dc)
    return inputs, gt_boxes, gt_labels, gt_valid


def build_detector_batches(images: np.ndarray, labels: Sequence[int],
                           dc: DetectorConfig, max_boxes: int = 4):
    """Annotate every image and pack GT into padded arrays.

    Args:
      images: [N, H, W, C] rendered/synthetic images in [0,1].
      labels: per-image 0-based class id.

    Returns (model_inputs [N,S,S,3], gt_boxes [N,max_boxes,4] XYXY,
    gt_labels [N,max_boxes], gt_valid [N,max_boxes]).
    """
    import jax.numpy as jnp

    n = len(images)
    gt_boxes = np.zeros((n, max_boxes, 4), np.float32)
    gt_labels = np.zeros((n, max_boxes), np.int32)
    gt_valid = np.zeros((n, max_boxes), bool)
    for i, (img, lab) in enumerate(zip(images, labels)):
        bbox = auto_annotate(img)
        if bbox is None:
            continue
        x, y, w, h = bbox
        gt_boxes[i, 0] = [x, y, x + w, y + h]
        gt_labels[i, 0] = lab
        gt_valid[i, 0] = True
    inputs = prepare_images(images, dc)
    return inputs, jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid)


# --------------------------------------------------------------------------- #
# COCO-format export / import (interoperability with the reference layout)
# --------------------------------------------------------------------------- #


def write_coco_json(class_dirs: Dict[str, str], json_path: str,
                    copy_to: Optional[str] = None,
                    with_rle_masks: bool = False) -> dict:
    """Walk per-class image directories, auto-annotate each PNG, and emit a
    COCO JSON (reference createCocoJSONFromSynthetics, :624-727 — same
    dataset dict: category ids are 1-based in directory order, one largest
    box per image)."""
    import imageio.v2 as imageio
    from shutil import copyfile

    images, annotations, categories = [], [], []
    image_id, annotation_id = 1, 1
    for class_index, (class_name, class_dir) in enumerate(class_dirs.items()):
        category_id = class_index + 1
        categories.append(
            {"supercategory": "ycbv", "id": category_id, "name": class_name}
        )
        files = sorted(
            f for f in os.listdir(class_dir) if f.endswith(".png")
        )
        for fname in files:
            path = os.path.join(class_dir, fname)
            img = imageio.imread(path)
            h, w = img.shape[:2]
            rel = os.path.join(class_name, fname)
            if copy_to:
                dst = os.path.join(copy_to, class_name)
                os.makedirs(dst, exist_ok=True)
                copyfile(path, os.path.join(dst, fname))
            images.append({
                "license": 0, "file_name": rel, "width": w, "height": h,
                "id": image_id,
            })
            bbox = auto_annotate(np.asarray(img))
            if bbox is not None:
                ann = {
                    "iscrowd": 0, "image_id": image_id,
                    "category_id": category_id, "id": annotation_id,
                    "bbox": list(bbox), "area": bbox[2] * bbox[3],
                }
                if with_rle_masks:
                    ann["segmentation"] = rle_encode(annotation_mask(np.asarray(img)))
                annotations.append(ann)
                annotation_id += 1
            image_id += 1

    doc = {
        "info": {"description": os.path.basename(os.path.dirname(json_path)),
                 "version": "1"},
        "licenses": [{"url": "", "id": 0, "name": "License"}],
        "images": images, "categories": categories, "annotations": annotations,
    }
    os.makedirs(os.path.dirname(json_path) or ".", exist_ok=True)
    with open(json_path, "w") as f:
        json.dump(doc, f)
    return doc


def dataset_dicts_from_dirs(basedir: str, cate_to_id: Dict[str, int],
                            with_rle_masks: bool = True) -> List[dict]:
    """Walk ``basedir/{category}/*.png`` and build detectron2-style dataset
    dicts with auto-annotated boxes + RLE masks (reference get_ycbv_dicts,
    ``neural_sim_main.py:799-832`` — the alternative, JSON-free registration
    path)."""
    import imageio.v2 as imageio

    dicts: List[dict] = []
    image_index = 0
    for cate in sorted(os.listdir(basedir)):
        cdir = os.path.join(basedir, cate)
        if not os.path.isdir(cdir) or cate not in cate_to_id:
            continue
        for fname in sorted(os.listdir(cdir)):
            if not fname.endswith(".png"):
                continue
            path = os.path.join(cdir, fname)
            img = np.asarray(imageio.imread(path))
            h, w = img.shape[:2]
            record = {"file_name": path, "image_id": image_index,
                      "height": h, "width": w, "annotations": []}
            bbox = auto_annotate(img)
            if bbox is not None:
                x, y, bw, bh = bbox
                ann = {"bbox": [x, y, x + bw, y + bh],
                       "category_id": cate_to_id[cate], "iscrowd": 0}
                if with_rle_masks:
                    ann["segmentation"] = rle_encode(annotation_mask(img))
                record["annotations"].append(ann)
            dicts.append(record)
            image_index += 1
    return dicts


def resolve_train_val_dirs(train_val_path_info: str, test_distribution: str,
                           object_id: str, rendered_dir: str, basedir: str):
    """Reference create_dataset path resolution (:729-745): the optimized
    class's train dir points at the fresh renders; background classes and the
    chosen val distribution come from the path-info JSON."""
    with open(train_val_path_info) as f:
        info = json.load(f)
    train_info = dict(info["train_info"])
    test_info = dict(info["test_info"][test_distribution])
    for cate in train_info:
        if cate == object_id:
            train_info[cate] = os.path.join(rendered_dir, object_id)
        else:
            train_info[cate] = os.path.join(basedir, train_info[cate])
    for cate in test_info:
        test_info[cate] = os.path.join(basedir, test_info[cate])
    return train_info, test_info
