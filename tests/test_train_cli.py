"""Standalone trainer CLI: periodic in-loop artifacts + render_only.

Parity targets: the reference's i_weights/.tar, i_video spiral and
i_testset dumps inside the training loop (run_nerf_noscale.py:723-756) and
the render_only short-circuit (:582-602).
"""

import json
import os

import numpy as np
import pytest

from neuralsim_tpu.train_cli import main

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate


@pytest.fixture()
def tiny_scene(tmp_path):
    """Blender-layout dataset: 2 frames per split, 16x16 RGBA PNGs."""
    import imageio.v2 as imageio

    datadir = tmp_path / "scene"
    datadir.mkdir()
    rng = np.random.RandomState(0)
    K = [[20.0, 0.0, 8.0], [0.0, 20.0, 8.0], [0.0, 0.0, 1.0]]
    for split in ("train", "val", "test"):
        frames = []
        for i in range(2):
            img = (rng.rand(16, 16, 4) * 255).astype(np.uint8)
            path = datadir / f"{split}_{i}.png"
            imageio.imwrite(path, img)
            c2w = np.eye(4)
            c2w[2, 3] = 1.2 + 0.1 * i
            frames.append({
                "file_path": str(path),
                "transform_matrix": c2w.tolist(),
                "intrinsic_matrix": K,
            })
        (datadir / f"transforms_{split}.json").write_text(
            json.dumps({"frames": frames, "near": 1.5, "far": 2.5})
        )
    return datadir


TINY_FLAGS = [
    "--netdepth", "2", "--netwidth", "16",
    "--netdepth_fine", "2", "--netwidth_fine", "16",
    "--multires", "2", "--multires_views", "1",
    "--N_samples", "4", "--N_importance", "4",
    "--N_rand", "16", "--chunk", "256",
]


def test_periodic_artifacts_in_loop(tiny_scene, tmp_path):
    expdir = tmp_path / "logs" / "run"
    argv = TINY_FLAGS + [
        "--datadir", str(tiny_scene),
        "--basedir", str(tmp_path / "logs"), "--expname", "run",
        "--n_iters", "4", "--i_weights", "2", "--i_video", "4",
        "--i_testset", "4", "--i_print", "0",
    ]
    main(argv)
    # i_weights=2 over 4 iters -> tar dumps at 2 and 4 (in-loop, not only
    # at the end)
    assert (expdir / "000002.tar").exists()
    assert (expdir / "000004.tar").exists()
    # i_video/i_testset=4 -> one in-loop spiral video + testset dir
    assert any(p.name.startswith("spiral_000004") for p in expdir.iterdir())
    assert (expdir / "testset_000004").is_dir()
    assert (expdir / "testset_000004" / "000.png").exists()


def test_render_only_short_circuit(tiny_scene, tmp_path):
    base = [
        "--datadir", str(tiny_scene),
        "--basedir", str(tmp_path / "logs"), "--expname", "run",
    ]
    # no checkpoint yet -> explicit failure, not silent training
    with pytest.raises(SystemExit):
        main(TINY_FLAGS + base + ["--render_only"])

    # train 2 iters to produce a checkpoint, then render_only from it
    main(TINY_FLAGS + base + ["--n_iters", "2", "--i_weights", "2",
                              "--i_video", "0", "--i_testset", "0",
                              "--i_print", "0"])
    expdir = tmp_path / "logs" / "run"
    out = main(TINY_FLAGS + base + ["--render_only"])
    assert out is None  # short-circuit: no training state returned
    ro = [p for p in expdir.iterdir() if p.name.startswith("renderonly_path_")]
    assert len(ro) == 1 and any(ro[0].iterdir())

    main(TINY_FLAGS + base + ["--render_only", "--render_test"])
    rt = [p for p in expdir.iterdir() if p.name.startswith("renderonly_test_")]
    assert len(rt) == 1 and (rt[0] / "000.png").exists()
