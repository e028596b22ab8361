from neuralsim_tpu.detector.trainer import (
    DetectorState,
    init_detector,
    inner_train,
    make_detector_apply,
)
from neuralsim_tpu.detector.dataset import (
    auto_annotate,
    build_detector_batches,
    prepare_images,
)
from neuralsim_tpu.detector.evaluator import coco_map

__all__ = [
    "DetectorState",
    "init_detector",
    "inner_train",
    "make_detector_apply",
    "auto_annotate",
    "build_detector_batches",
    "prepare_images",
    "coco_map",
]
