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


def restore_params(cfg, expdir: str):
    """Resolve pretrained params the way the reference's create_nerf does
    (run_nerf_noscale.py:295-315): explicit ``ft_path`` (.npz torch-free or
    .tar via the torch import boundary) wins, else the latest checkpoint in
    ``{expdir}/checkpoints``. Returns (models-or-None, global_step)."""
    ft = cfg.data.ft_path
    if ft:
        if ft.endswith(".npz"):
            from neuralsim_tpu.data.convert_torch import load_params_npz

            return load_params_npz(ft), 0
        from neuralsim_tpu.data.convert_torch import load_nerf_checkpoint

        return load_nerf_checkpoint(ft)
    from neuralsim_tpu.utils.checkpoint import CheckpointManager

    ckpt = CheckpointManager(os.path.join(expdir, "checkpoints"))
    step = ckpt.latest_step()
    if step is None:
        return None, 0
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params

    like = {"params": init_nerf_pipeline_params(
        jax.random.PRNGKey(0), cfg.net, cfg.render.n_importance)}
    return ckpt.restore(step, like=like)["params"], step


def main(argv=None):
    from neuralsim_tpu.config import parse_cli
    from neuralsim_tpu.data.blender import load_linemod_data
    from neuralsim_tpu.train_nerf import TrainState, init_train_state, train_nerf
    from neuralsim_tpu.utils.checkpoint import CheckpointManager, save_nerf_tar_compatible
    from neuralsim_tpu.utils.logging import save_args_snapshot

    cfg = parse_cli(argv)
    tc = cfg.train
    key = jax.random.PRNGKey(cfg.seed)

    expdir = os.path.join(cfg.data.basedir, cfg.data.expname)
    os.makedirs(expdir, exist_ok=True)
    save_args_snapshot(expdir, cfg)

    dataset = load_linemod_data(cfg.data.datadir, cfg.data.half_res,
                                cfg.data.testskip)
    rc = dataclasses.replace(
        cfg.render, near=dataset.camera.near, far=dataset.camera.far
    )

    if tc.render_only:
        # reference run_nerf_noscale.py:582-602: no training — render the
        # spiral path (or the held-out test set with render_test) from the
        # restored checkpoint into renderonly_{path|test}_{start:06d}/
        models, start = restore_params(cfg, expdir)
        if models is None:
            raise SystemExit(
                "render_only requires a checkpoint: set --ft_path or train "
                f"first (no checkpoints under {expdir}/checkpoints)"
            )
        tag = "test" if tc.render_test else "path"
        out_dir = os.path.join(expdir, f"renderonly_{tag}_{start:06d}")
        if tc.render_test:
            psnr = render_testset(models, dataset, cfg.net, rc, out_dir)
            print(f"render_only: test set -> {out_dir} PSNR={psnr:.2f}")
        else:
            video = render_spiral_video(
                models, dataset, cfg.net, rc,
                os.path.join(out_dir, "video.mp4"),
            )
            print(f"render_only: spiral -> {video}")
        return None

    ckpt = CheckpointManager(os.path.join(expdir, "checkpoints"))
    init_models, start = restore_params(cfg, expdir)
    state0 = None
    if init_models is not None:
        fresh = init_train_state(key, cfg.net, rc, tc)
        state0 = TrainState(
            jax.tree_util.tree_map(jnp.asarray, init_models),
            fresh.opt_state, jnp.asarray(start, jnp.int32),
        )

    def periodic(i: int, state: TrainState):
        # the reference's in-loop artifact cadence (run_nerf_noscale.py:
        # 723-756): .tar every i_weights, spiral video every i_video,
        # test-set renders every i_testset
        if tc.i_weights and i % tc.i_weights == 0:
            ckpt.save(i, {"params": state.params})
            save_nerf_tar_compatible(
                os.path.join(expdir, f"{i:06d}.tar"),
                jax.tree_util.tree_map(np.asarray, state.params),
                global_step=i,
            )
        if tc.i_video and i % tc.i_video == 0:
            render_spiral_video(
                state.params, dataset, cfg.net, rc,
                os.path.join(expdir, f"spiral_{i:06d}.mp4"),
            )
        if tc.i_testset and i % tc.i_testset == 0:
            render_testset(
                state.params, dataset, cfg.net, rc,
                os.path.join(expdir, f"testset_{i:06d}"),
            )

    state, metrics = train_nerf(
        dataset, cfg.net, rc, tc, key=key, log_every=tc.i_print,
        hook=periodic, state=state0,
    )

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
