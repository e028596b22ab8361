"""L7 entry-point integration: reference-style flags + directory layout ->
a full bilevel run through cli.main."""

import dataclasses
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate


def _write_reference_layout(tmp_path, rng):
    """Minimal reference-shaped experiment dir: nerfdata info json,
    train_val_path_info with background class dirs + a val distribution."""
    import imageio.v2 as imageio

    basedir = tmp_path / "logs"
    datadir = basedir / "nerfdata"
    datadir.mkdir(parents=True)
    info = {
        "near": 0.8, "far": 1.4, "H": 128, "W": 128,
        "frames": [{
            "file_path": "x", "transform_matrix": np.eye(4).tolist(),
            "intrinsic_matrix": [[426.66, 0, 62.5], [0, 426.9, 64.2], [0, 0, 1]],
        }],
    }
    (datadir / "nerf_traindata_info.json").write_text(json.dumps(info))

    def _dump_class_dir(d, n=2):
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            img = np.zeros((32, 32, 3), np.uint8)
            y, x = rng.randint(4, 16, 2)
            img[y: y + 12, x: x + 12] = rng.randint(100, 255, 3)
            imageio.imwrite(str(d / f"{i:06d}.png"), img)

    for cate in ("1", "2"):
        _dump_class_dir(basedir / "D_train" / cate)
        _dump_class_dir(basedir / "D_val" / "one_1" / cate)

    path_info = {
        "dataset_name": "test",
        "train_info": {"1": "D_train/1", "2": "D_train/2"},
        "test_info": {"one_1": {"1": "D_val/one_1/1", "2": "D_val/one_1/2"}},
    }
    pi = tmp_path / "path_info.json"
    pi.write_text(json.dumps(path_info))
    return str(basedir), str(datadir), str(pi)


def test_cli_flag_parsing_reference_surface(tmp_path):
    from neuralsim_tpu.config import parse_cli

    cfg_txt = tmp_path / "nerf_param.txt"
    cfg_txt.write_text(
        "N_samples = 64\nN_importance = 128\nchunk = 512 # comment\n"
        "half_res = True\nuse_viewdirs = True\nno_batching = True\n"
        "lrate_decay = 500\n"
    )
    cfg = parse_cli([
        "--config", str(cfg_txt), "--expname", "exp1", "--object_id", "2",
        "--psi_pose_cats_mode", "5", "--test_distribution", "one_1",
        "--n_samples_K", "10", "--opt_method", "Adam", "--gumble_T", "0.1",
    ])
    assert cfg.render.n_samples == 64
    assert cfg.render.n_importance == 128
    assert cfg.render.ray_chunk == 512
    assert cfg.data.half_res and cfg.net.use_viewdirs
    assert cfg.data.expname == "exp1" and cfg.data.object_id == "2"
    assert cfg.bilevel.psi_pose_cats_mode == "5"
    assert cfg.sampler.n_samples_k == 10
    assert cfg.bilevel.opt_method == "Adam"


def test_cli_production_sampling_flags(tmp_path):
    """Every knob of the benched production configuration is reachable from
    the CLI (round-3 review: n_importance_culled was missing from the flag
    map, so the published rays/s config couldn't be reproduced by flag)."""
    from neuralsim_tpu.config import parse_cli

    cfg = parse_cli([
        "--expname", "exp1", "--object_id", "2",
        "--hit_budget", "0.75", "--tighten_bounds", "True",
        "--cull_mode", "aabb", "--n_samples_culled", "16",
        "--n_importance_culled", "64",
    ])
    assert cfg.render.hit_budget == 0.75
    assert cfg.render.tighten_bounds is True
    assert cfg.render.cull_mode == "aabb"
    assert cfg.render.n_samples_culled == 16
    assert cfg.render.n_importance_culled == 64

    # `--flag None` restores the disabled state of nullable knobs (the
    # string "None" must not reach sample-count arithmetic)
    cfg = parse_cli([
        "--expname", "exp1", "--object_id", "2",
        "--n_samples_culled", "None", "--n_importance_culled", "None",
    ])
    assert cfg.render.n_samples_culled is None
    assert cfg.render.n_importance_culled is None


def test_cli_end_to_end_bilevel(tmp_path, rng):
    """Full L7 path: reference directory layout in, bilevel epoch out."""
    import jax

    from neuralsim_tpu import cli
    from tests.test_bilevel_e2e import tiny_cfg

    basedir, datadir, path_info = _write_reference_layout(tmp_path, rng)

    base = tiny_cfg()
    cfg = base.replace(
        data=dataclasses.replace(
            base.data, basedir=basedir, datadir=datadir,
            train_val_path_info=path_info, test_distribution="one_1",
            object_id="2", expname="cli_e2e", save_pngs=False,
        ),
        bilevel=dataclasses.replace(base.bilevel, n_epochs=1),
        camera=base.camera,  # info json is 128^2 but half_res/4 -> 32^2
    )
    result = cli.main(cfg=cfg)
    assert result["psi"].shape == (8,)
    assert len(result["history"]) == 1
    # experiment record written
    out = os.path.join(basedir, "cli_e2e")
    assert os.path.exists(os.path.join(out, "args.txt"))
    resfile = os.path.join(out, "detectron_output", "save_result.txt")
    assert os.path.exists(resfile)
    assert "AP" in open(resfile).read()
