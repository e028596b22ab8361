"""Pipeline facade details: render_factor, checkpoint resolution order."""

import dataclasses
import json

import jax
import numpy as np

from tests.test_bilevel_e2e import tiny_cfg


def _info_json(tmp_path, H=128, W=128):
    info = {
        "near": 0.8, "far": 1.4, "H": H, "W": W,
        "frames": [{
            "file_path": "x", "transform_matrix": np.eye(4).tolist(),
            "intrinsic_matrix": [[426.66, 0, 62.5], [0, 426.9, 64.2], [0, 0, 1]],
        }],
    }
    (tmp_path / "nerf_traindata_info.json").write_text(json.dumps(info))


def test_render_factor_downsamples(tmp_path):
    from neuralsim_tpu.pipeline import NeuralSimRenderer

    cfg = tiny_cfg()
    _info_json(tmp_path)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, datadir=str(tmp_path), half_res=True, render_factor=2,
        basedir=str(tmp_path),
    ))
    # info 128^2, half_res /4 -> 32^2, render_factor 2 -> 16^2
    r = NeuralSimRenderer(cfg, key=jax.random.PRNGKey(0))
    assert (r.H, r.W) == (16, 16)
    np.testing.assert_allclose(r.K[0, 0], 426.66 / 4 / 2, rtol=1e-5)
    imgs, noise = r.render_images(np.zeros(8, np.float32) + 0.1,
                                  jax.random.PRNGKey(1), num_k=2)
    assert imgs.shape == (2, 16, 16, 3)


def test_checkpoint_npz_resolution(tmp_path):
    from neuralsim_tpu.data.convert_torch import save_params_npz
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
    from neuralsim_tpu.pipeline import NeuralSimRenderer

    cfg = tiny_cfg()
    _info_json(tmp_path)
    models = init_nerf_pipeline_params(jax.random.PRNGKey(7), cfg.net,
                                       cfg.render.n_importance)
    ckdir = tmp_path / "nerf_models"
    ckdir.mkdir()
    save_params_npz(str(ckdir / "ycbvid2.npz"),
                    jax.tree_util.tree_map(np.asarray, models))
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, datadir=str(tmp_path), basedir=str(tmp_path), object_id="2",
    ))
    r = NeuralSimRenderer(cfg, key=jax.random.PRNGKey(0))
    np.testing.assert_array_equal(
        np.asarray(r.models["coarse"]["pts_0_kernel"]),
        np.asarray(models["coarse"]["pts_0_kernel"]),
    )


def test_pipeline_culled_render_derived_bbox(tmp_path):
    """The pipeline's production path (hit_budget < 1.0) derives its
    occupancy bbox from the scene like the driver does (round-3 review:
    this path previously hard-coded (-0.4, 0.4)^3): an object OUTSIDE the
    legacy cube must render identically with culling enabled."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import box_scene_params
    from neuralsim_tpu.pipeline import NeuralSimRenderer

    cfg = tiny_cfg()
    _info_json(tmp_path, H=32, W=32)
    cfg = cfg.replace(data=dataclasses.replace(
        cfg.data, datadir=str(tmp_path), basedir=str(tmp_path)))
    params = box_scene_params(cfg.net, jax.random.PRNGKey(0), half=0.06,
                              center=(0.55, 0.0, 0.0))
    models = {"coarse": params, "fine": params}

    r_exact = NeuralSimRenderer(cfg, models=models, key=jax.random.PRNGKey(0))
    imgs_exact, _ = r_exact.render_images(np.zeros(8, np.float32) + 0.1,
                                          jax.random.PRNGKey(1), num_k=2)

    cfg_cull = cfg.replace(render=dataclasses.replace(
        cfg.render, hit_budget=0.3, tighten_bounds=False))
    r_cull = NeuralSimRenderer(cfg_cull, models=models,
                               key=jax.random.PRNGKey(0))
    assert r_cull.grid is not None
    # the derived bbox brackets the off-cube object
    bmin = np.asarray(r_cull.grid.bbox_min)
    bmax = np.asarray(r_cull.grid.bbox_max)
    assert (bmin <= [0.49, -0.06, -0.06]).all()
    assert (bmax >= [0.61, 0.06, 0.06]).all()
    imgs_cull, _ = r_cull.render_images(np.zeros(8, np.float32) + 0.1,
                                        jax.random.PRNGKey(1), num_k=2)
    mse = float(np.mean((np.asarray(imgs_exact) - np.asarray(imgs_cull)) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, f"off-cube object culled by pipeline: {psnr:.1f} dB"
