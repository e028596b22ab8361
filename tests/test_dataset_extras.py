"""dataset_dicts_from_dirs, sampler diagnostics, COCO JSON export."""

import json
import os

import numpy as np
import jax.numpy as jnp


def test_dataset_dicts_from_dirs(tmp_path):
    import imageio.v2 as imageio

    from neuralsim_tpu.detector.dataset import dataset_dicts_from_dirs
    from neuralsim_tpu.native import rle_decode

    for cate in ("1", "2"):
        d = tmp_path / cate
        d.mkdir()
        img = np.zeros((24, 24, 3), np.uint8)
        img[6:18, 4:20] = 200
        imageio.imwrite(str(d / "000000.png"), img)

    dicts = dataset_dicts_from_dirs(str(tmp_path), {"1": 1, "2": 2})
    assert len(dicts) == 2
    rec = dicts[0]
    ann = rec["annotations"][0]
    assert ann["bbox"] == [4, 6, 20, 18]
    mask = rle_decode(ann["segmentation"])
    assert mask.sum() == 12 * 16
    assert {r["annotations"][0]["category_id"] for r in dicts} == {1, 2}


def test_write_coco_json(tmp_path):
    import imageio.v2 as imageio

    from neuralsim_tpu.detector.dataset import write_coco_json

    for cate in ("a", "b"):
        d = tmp_path / "src" / cate
        d.mkdir(parents=True)
        img = np.zeros((16, 16, 3), np.uint8)
        img[4:12, 4:12] = 255
        imageio.imwrite(str(d / "000000.png"), img)

    out = tmp_path / "D_train"
    doc = write_coco_json(
        {"a": str(tmp_path / "src" / "a"), "b": str(tmp_path / "src" / "b")},
        str(out / "ycbv_train.json"), copy_to=str(out / "train"),
    )
    assert len(doc["images"]) == 2
    assert len(doc["annotations"]) == 2
    assert doc["categories"][0]["id"] == 1
    assert doc["annotations"][0]["bbox"] == [4, 4, 8, 8]
    assert os.path.exists(out / "train" / "a" / "000000.png")
    # registrable through the catalog
    from neuralsim_tpu.detector.catalog import DatasetCatalog, MetadataCatalog, register_coco_instances

    register_coco_instances("t", {}, str(out / "ycbv_train.json"),
                            str(out / "train"), DatasetCatalog(), MetadataCatalog())


def test_sampler_diagnostics_tracks_target():
    from neuralsim_tpu.sampler.diagnostics import temperature_sweep

    probs = jnp.array([0.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.7, 0.0])
    sweep = temperature_sweep(probs, temperatures=(0.01, 5.0), n_samples=2000)
    lo, hi = sweep[0.01], sweep[5.0]
    # low temperature follows the target
    assert abs(lo[1] - 0.3) < 0.06 and abs(lo[6] - 0.7) < 0.06
    # high temperature collapses the soft expectation toward the MEAN of the
    # bin centers (~180 deg, bins 3-4) — losing the true modes
    assert hi[3] + hi[4] > 0.7
    assert hi[1] + hi[6] < 0.2


def test_device_batches_match_host_path():
    """build_detector_batches_device equals the host CC path on
    single-object renders (exact-zero background, one blob) — the
    production pipeline's per-epoch case."""
    import jax.numpy as jnp

    from neuralsim_tpu.config import DetectorConfig
    from neuralsim_tpu.detector.dataset import (
        build_detector_batches,
        build_detector_batches_device,
    )

    dc = DetectorConfig(num_classes=2, image_size=64)
    rng = np.random.RandomState(0)
    imgs = np.zeros((3, 48, 40, 3), np.float32)
    imgs[0, 10:30, 5:25] = rng.rand(20, 20, 3) * 0.8 + 0.2
    imgs[1, 0:8, 30:40] = 0.5
    # image 2 stays empty -> invalid gt
    labels = [0, 1, 0]

    h_in, h_box, h_lab, h_val = build_detector_batches(imgs, labels, dc)
    d_in, d_box, d_lab, d_val = build_detector_batches_device(
        jnp.asarray(imgs), labels, dc)

    np.testing.assert_allclose(np.asarray(d_in), np.asarray(h_in), atol=1e-6)
    np.testing.assert_array_equal(np.asarray(d_val), np.asarray(h_val))
    np.testing.assert_array_equal(np.asarray(d_lab) * np.asarray(d_val),
                                  np.asarray(h_lab) * np.asarray(h_val))
    # boxes compared only where valid
    hv = np.asarray(h_val)[:, 0]
    np.testing.assert_allclose(np.asarray(d_box)[hv, 0],
                               np.asarray(h_box)[hv, 0], atol=1e-6)


def test_device_quantization_matches_host_at_threshold():
    """Regression (ADVICE r2): the device path must quantize with the same
    floor (to8b truncation) as the host/PNG path, so threshold-adjacent
    gray pixels (u8 gray == 1 vs 2) classify identically in both."""
    import jax.numpy as jnp

    from neuralsim_tpu.config import DetectorConfig
    from neuralsim_tpu.detector.dataset import (
        build_detector_batches,
        build_detector_batches_device,
    )

    dc = DetectorConfig(num_classes=2, image_size=64)
    # constant 1.6/255: round -> u8 2 (foreground), floor -> u8 1
    # (background). One real object pixel so the box is well-defined.
    imgs = np.full((1, 32, 32, 3), 1.6 / 255.0, np.float32)
    imgs[0, 10:14, 10:14] = 0.9
    labels = [0]

    _, h_box, _, h_val = build_detector_batches(imgs, labels, dc)
    _, d_box, _, d_val = build_detector_batches_device(
        jnp.asarray(imgs), labels, dc)
    np.testing.assert_array_equal(np.asarray(d_val), np.asarray(h_val))
    np.testing.assert_allclose(np.asarray(d_box)[0, 0],
                               np.asarray(h_box)[0, 0], atol=1e-6)
