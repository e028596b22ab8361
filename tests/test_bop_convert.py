"""BOP -> NeRF converter: pose inversion, axis flip, near/far, splits."""

import json
import os

import numpy as np

from neuralsim_tpu.data.bop_convert import (
    convert_bop_scene,
    near_far_from_poses,
    w2c_to_c2w_gl,
    write_traindata_info,
)


def test_w2c_inversion_roundtrip(rng):
    # random rotation via QR
    q, _ = np.linalg.qr(rng.randn(3, 3))
    if np.linalg.det(q) < 0:
        q[:, 0] *= -1
    t_mm = rng.randn(3) * 500
    c2w = w2c_to_c2w_gl(q, t_mm)
    # camera center: -R^T t (meters) regardless of axis flip
    np.testing.assert_allclose(c2w[:3, 3], -q.T @ (t_mm / 1000.0), rtol=1e-6)
    # rotation block stays orthonormal after the OpenCV->OpenGL flip
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-8)
    # y/z columns flipped: R[:, 1] == -R_w2c^T[:, 1]
    np.testing.assert_allclose(R[:, 1], -(q.T)[:, 1], atol=1e-8)
    np.testing.assert_allclose(R[:, 2], -(q.T)[:, 2], atol=1e-8)


def test_near_far_covers_object():
    c2w = np.eye(4)
    c2w[:3, 3] = [0, 0, 1.0]
    near, far = near_far_from_poses([c2w], object_id=2)  # cheesebox d=269.573mm
    r = 269.573 / 2000.0
    np.testing.assert_allclose(near, 1.0 - r - 0.05, rtol=1e-6)
    np.testing.assert_allclose(far, 1.0 + r + 0.05, rtol=1e-6)


def test_convert_bop_scene(tmp_path, rng):
    scene = tmp_path / "000000"
    (scene / "rgb").mkdir(parents=True)
    cams = {}
    for i in range(10):
        q, _ = np.linalg.qr(rng.randn(3, 3))
        cams[str(i)] = {
            "cam_K": [1066.0, 0, 320.0, 0, 1067.0, 240.0, 0, 0, 1],
            "cam_R_w2c": q.reshape(-1).tolist(),
            "cam_t_w2c": (rng.randn(3) * 100 + [0, 0, 1000]).tolist(),
        }
    with open(scene / "scene_camera.json", "w") as f:
        json.dump(cams, f)

    out = tmp_path / "nerf"
    paths = convert_bop_scene(str(scene), str(out), object_id=2)
    assert set(paths) == {"train", "val", "test"}
    with open(paths["train"]) as f:
        train = json.load(f)
    n_total = sum(
        len(json.load(open(paths[s]))["frames"]) for s in ("train", "val", "test")
    )
    assert n_total == 10
    assert len(train["frames"]) == 8  # 80% split
    fr = train["frames"][0]
    assert np.asarray(fr["transform_matrix"]).shape == (4, 4)
    assert np.asarray(fr["intrinsic_matrix"]).shape == (3, 3)
    assert train["near"] < train["far"]


def test_write_traindata_info(tmp_path):
    from neuralsim_tpu.data.blender import load_data_param

    K = np.array([[1333.33, 0, 195.4], [0, 1334.2, 200.6], [0, 0, 1]])
    p = tmp_path / "nerf_traindata_info.json"
    write_traindata_info(str(p), 400, 400, K, 0.81, 1.43)
    cam = load_data_param(str(tmp_path), half_res=True)
    assert (cam.height, cam.width) == (100, 100)
