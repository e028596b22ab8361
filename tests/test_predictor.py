"""DetectorPredictor + box drawing."""

import jax
import numpy as np

from neuralsim_tpu.config import DetectorConfig
from neuralsim_tpu.detector.predictor import DetectorPredictor, draw_detections
from neuralsim_tpu.detector.trainer import init_detector

DC = DetectorConfig(num_classes=2, image_size=64)


def test_predictor_runs_single_image():
    state = init_detector(jax.random.PRNGKey(0), DC)
    pred = DetectorPredictor(state.params, DC)
    img = np.zeros((50, 60, 3), np.float32)
    img[10:40, 10:40] = 0.8
    out = pred(img)
    assert set(out) == {"boxes", "scores", "labels"}
    assert out["boxes"].shape[1:] == (4,)
    # untrained prior 0.01 < score threshold -> usually empty; shapes consistent
    assert len(out["boxes"]) == len(out["scores"]) == len(out["labels"])


def test_draw_detections():
    img = np.zeros((32, 32, 3), np.float32)
    out = draw_detections(img, [[4, 4, 20, 25]], labels=[1], thickness=1)
    assert out.dtype == np.uint8
    assert (out[4, 4:21] != 0).any()      # top edge drawn
    assert (out[25, 4:21] != 0).any()     # bottom edge
    assert (out[4:26, 4] != 0).any()      # left edge
    assert (out[3, :] == 0).all()         # outside untouched
