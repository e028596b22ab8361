"""Data layer: torch .tar conversion round-trip, loaders, checkpointing."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig
from neuralsim_tpu.data.convert_torch import (
    convert_torch_checkpoint,
    load_nerf_checkpoint,
    load_params_npz,
    save_params_npz,
)
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params

NET = NeRFNetConfig()


def _torch_nerf_state_dict(rng):
    """Build a state dict with the published checkpoint layout
    (run_nerf_helpers.py:82-97 shapes)."""
    import torch

    sd = {}
    in_ch, in_views, w = 63, 27, 256
    fan = in_ch
    for i in range(8):
        sd[f"pts_linears.{i}.weight"] = torch.tensor(
            rng.randn(w, fan).astype(np.float32))
        sd[f"pts_linears.{i}.bias"] = torch.tensor(rng.randn(w).astype(np.float32))
        fan = w + in_ch if i == 4 else w
    sd["feature_linear.weight"] = torch.tensor(rng.randn(w, w).astype(np.float32))
    sd["feature_linear.bias"] = torch.tensor(rng.randn(w).astype(np.float32))
    sd["alpha_linear.weight"] = torch.tensor(rng.randn(1, w).astype(np.float32))
    sd["alpha_linear.bias"] = torch.tensor(rng.randn(1).astype(np.float32))
    sd["views_linears.0.weight"] = torch.tensor(
        rng.randn(w // 2, w + in_views).astype(np.float32))
    sd["views_linears.0.bias"] = torch.tensor(rng.randn(w // 2).astype(np.float32))
    sd["rgb_linear.weight"] = torch.tensor(rng.randn(3, w // 2).astype(np.float32))
    sd["rgb_linear.bias"] = torch.tensor(rng.randn(3).astype(np.float32))
    return sd


def test_torch_tar_roundtrip(tmp_path, rng):
    """torch .tar -> our params -> forward pass matches a torch forward."""
    import torch

    sd = _torch_nerf_state_dict(rng)
    ckpt = {
        "global_step": 12345,
        "network_fn_state_dict": sd,
        "network_fine_state_dict": _torch_nerf_state_dict(rng),
    }
    path = str(tmp_path / "ycbvid2.tar")
    torch.save(ckpt, path)

    models, step = load_nerf_checkpoint(path)
    assert step == 12345
    assert set(models) == {"coarse", "fine"}
    assert models["coarse"]["pts_0_kernel"].shape == (63, 256)
    assert models["coarse"]["pts_5_kernel"].shape == (63 + 256, 256)
    assert models["coarse"]["views_0_kernel"].shape == (256 + 27, 128)

    # numerical parity of a forward pass vs torch execution of the same MLP
    from neuralsim_tpu.models.nerf import nerf_apply

    x = rng.randn(7, 63).astype(np.float32)
    d = rng.randn(7, 27).astype(np.float32)
    ours = np.asarray(nerf_apply(
        {k: jnp.asarray(v) for k, v in models["coarse"].items()},
        jnp.array(x), jnp.array(d), NET,
    ))

    with torch.no_grad():
        h = torch.tensor(x)
        inp = torch.tensor(x)
        for i in range(8):
            h = torch.relu(
                h @ sd[f"pts_linears.{i}.weight"].T + sd[f"pts_linears.{i}.bias"]
            )
            if i == 4:
                h = torch.cat([inp, h], -1)
        alpha = h @ sd["alpha_linear.weight"].T + sd["alpha_linear.bias"]
        feat = h @ sd["feature_linear.weight"].T + sd["feature_linear.bias"]
        hv = torch.cat([feat, torch.tensor(d)], -1)
        hv = torch.relu(hv @ sd["views_linears.0.weight"].T + sd["views_linears.0.bias"])
        rgb = hv @ sd["rgb_linear.weight"].T + sd["rgb_linear.bias"]
        want = torch.cat([rgb, alpha], -1).numpy()

    np.testing.assert_allclose(ours, want, rtol=1e-3, atol=1e-4)


def test_npz_roundtrip(tmp_path):
    models = init_nerf_pipeline_params(jax.random.PRNGKey(0), NET, 128)
    path = str(tmp_path / "params.npz")
    save_params_npz(path, jax.tree_util.tree_map(np.asarray, models))
    loaded = load_params_npz(path)
    for m in models:
        for k in models[m]:
            np.testing.assert_array_equal(np.asarray(models[m][k]), loaded[m][k])


def test_tar_export_reimport(tmp_path):
    from neuralsim_tpu.utils.checkpoint import save_nerf_tar_compatible

    models = init_nerf_pipeline_params(jax.random.PRNGKey(1), NET, 128)
    models_np = jax.tree_util.tree_map(np.asarray, models)
    path = str(tmp_path / "export.tar")
    save_nerf_tar_compatible(path, models_np, global_step=7)
    back, step = load_nerf_checkpoint(path)
    assert step == 7
    for m in models_np:
        for k in models_np[m]:
            np.testing.assert_array_equal(models_np[m][k], back[m][k])


def test_load_data_param(tmp_path):
    from neuralsim_tpu.data.blender import load_data_param

    info = {
        "near": 0.81, "far": 1.43, "H": 400, "W": 400,
        "frames": [{"intrinsic_matrix": [[1333.3, 0, 195.4], [0, 1334.2, 200.6], [0, 0, 1]],
                    "file_path": "x", "transform_matrix": np.eye(4).tolist()}],
    }
    with open(tmp_path / "nerf_traindata_info.json", "w") as f:
        json.dump(info, f)

    cam = load_data_param(str(tmp_path), half_res=False)
    assert (cam.height, cam.width) == (400, 400)
    np.testing.assert_allclose(cam.near, 0.31)
    np.testing.assert_allclose(cam.far, 1.93)

    # pipeline half_res divides by 4 (reference :186)
    cam = load_data_param(str(tmp_path), half_res=True)
    assert (cam.height, cam.width) == (100, 100)
    np.testing.assert_allclose(cam.focal, 1333.3 / 4, rtol=1e-6)


def test_load_linemod_data(tmp_path):
    import imageio.v2 as imageio

    from neuralsim_tpu.data.blender import load_linemod_data

    rng = np.random.RandomState(0)
    k = [[100.0, 0, 16.0], [0, 100.0, 16.0], [0, 0, 1]]
    for split, n in [("train", 3), ("val", 2), ("test", 2)]:
        frames = []
        for i in range(n):
            p = tmp_path / f"{split}_{i}.png"
            imageio.imwrite(str(p), rng.randint(0, 255, (32, 32, 4), dtype=np.uint8))
            frames.append({
                "file_path": str(p),
                "transform_matrix": np.eye(4).tolist(),
                "intrinsic_matrix": k,
            })
        with open(tmp_path / f"transforms_{split}.json", "w") as f:
            json.dump({"frames": frames, "near": 0.8, "far": 1.4}, f)

    ds = load_linemod_data(str(tmp_path), half_res=False, testskip=0)
    assert ds.images.shape == (7, 32, 32, 4)
    assert ds.camera.height == 32
    assert ds.camera.near == 0.8 - 1 and ds.camera.far == 1.4 + 1
    assert len(ds.i_split[0]) == 3

    ds2 = load_linemod_data(str(tmp_path), half_res=True, testskip=0)
    assert ds2.images.shape == (7, 16, 16, 4)
    np.testing.assert_allclose(ds2.camera.focal, 50.0)


def test_checkpoint_manager_npz(tmp_path):
    from neuralsim_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), max_to_keep=2, use_orbax=False)
    state = {"psi": np.arange(8.0), "epoch": np.int32(3)}
    mgr.save(0, state)
    mgr.save(1, {"psi": np.arange(8.0) + 1, "epoch": np.int32(4)})
    mgr.save(2, {"psi": np.arange(8.0) + 2, "epoch": np.int32(5)})
    assert mgr.latest_step() == 2
    restored = mgr.restore(like=state)
    np.testing.assert_array_equal(restored["psi"], np.arange(8.0) + 2)
    # pruned to max_to_keep
    assert len(os.listdir(tmp_path / "ck")) == 2


def test_checkpoint_manager_orbax(tmp_path):
    from neuralsim_tpu.utils.checkpoint import CheckpointManager

    mgr = CheckpointManager(str(tmp_path / "ck"), use_orbax=True)
    if mgr._mgr is None:
        pytest.skip("orbax unavailable")
    state = {"psi": np.arange(8.0), "nested": {"a": np.ones((2, 2))}}
    mgr.save(0, state)
    restored = mgr.restore(like=state)
    np.testing.assert_array_equal(restored["psi"], state["psi"])
    np.testing.assert_array_equal(restored["nested"]["a"], state["nested"]["a"])
