"""Semantic end-to-end demo: train a NeRF on a synthetic scene, then run
the bilevel loop so rendered objects drive real detections.

Pipeline exercised (all first-party):
  1. ground-truth images of an analytic density-sphere scene rendered with
     our own compositing
  2. NeRF trained on those views (train_nerf)
  3. bilevel epochs: psi-sampled poses -> NeRF renders (now showing a real
     object) -> auto-annotation -> RetinaNet inner-train -> mAP on a held-out
     val set rendered from the same scene

Run: PYTHONPATH=. python scripts/demo_e2e.py [--iters 400] [--det-steps 150]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import tempfile

import jax

# run wherever a backend exists; fall back to CPU if the configured platform
# (e.g. a TPU plugin) is unavailable in this process
try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def analytic_scene_raw(pts):
    """Raw field of a soft red sphere (radius .35 at origin) on empty space."""
    d = jnp.linalg.norm(pts, axis=-1)
    sigma = 40.0 * jax.nn.sigmoid((0.35 - d) * 40.0)
    rgb_logits = jnp.stack(
        [jnp.full_like(d, 3.0), jnp.full_like(d, -2.0), jnp.full_like(d, -2.0)],
        axis=-1,
    )
    return jnp.concatenate([rgb_logits, sigma[..., None]], axis=-1)


def render_analytic(poses, H, W, K, n_samples=64, near=0.5, far=2.0):
    from neuralsim_tpu.ops.rays import get_rays
    from neuralsim_tpu.ops.volume import raw2outputs, stratified_z_vals

    frames = []
    for c2w in poses:
        ro, rd = get_rays(H, W, K, c2w)
        ro = ro.reshape(-1, 3)
        rd = rd.reshape(-1, 3)
        z = stratified_z_vals(None, ro.shape[0], n_samples, near, far, False)
        pts = ro[:, None, :] + rd[:, None, :] * z[..., None]
        raw = analytic_scene_raw(pts)
        rgb, _, _, _, _ = raw2outputs(raw, z, rd)
        frames.append(np.asarray(rgb.reshape(H, W, 3)))
    return np.stack(frames)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=400)
    ap.add_argument("--det-steps", type=int, default=150)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from neuralsim_tpu.config import (
        BilevelConfig, CameraConfig, DetectorConfig, NeRFNetConfig,
        NeuralSimConfig, RenderConfig, SamplerConfig, TrainConfig,
    )
    from neuralsim_tpu.data.blender import CameraParams, LinemodDataset
    from neuralsim_tpu.sampler.poses import pose_spherical
    from neuralsim_tpu.train_nerf import train_nerf

    out_dir = args.out or tempfile.mkdtemp(prefix="demo_e2e_")
    os.makedirs(out_dir, exist_ok=True)
    H = W = 48
    K = np.array([[60.0, 0, 24.0], [0, 60.0, 24.0], [0, 0, 1.0]], np.float32)

    # [1] ground-truth views of the analytic scene
    train_angles = np.linspace(0, 360, 24, endpoint=False)
    poses = np.asarray(pose_spherical(jnp.array(train_angles),
                                      jnp.full(24, -20.0), 1.2))
    gt = render_analytic(poses, H, W, K)
    print(f"[1] analytic scene: {gt.shape}, object pixels/frame ~"
          f"{(gt.max(-1) > 0.2).mean(axis=(1, 2)).mean():.1%}")

    # [2] train the NeRF
    net = NeRFNetConfig(netdepth=4, netwidth=64, netdepth_fine=4, netwidth_fine=64,
                        skips=(2,), multires=6, multires_views=2)
    rc = RenderConfig(n_samples=32, n_importance=32, ray_chunk=2304,
                      near=0.5, far=2.0)
    tc = TrainConfig(n_rand=1024, lrate=5e-3, lrate_decay=5)
    images4 = np.concatenate([gt, np.ones_like(gt[..., :1])], -1)
    dataset = LinemodDataset(
        images4.astype(np.float32), poses, poses,
        CameraParams(H, W, 60.0, K, 0.5, 2.0),
        (np.arange(24), np.array([]), np.array([])),
    )
    state, metrics = train_nerf(dataset, net, rc, tc,
                                key=jax.random.PRNGKey(0), n_iters=args.iters)
    print(f"[2] NeRF trained {args.iters} iters: "
          f"PSNR {float(metrics['psnr']):.1f} dB")

    # [3] bilevel epochs on the trained NeRF
    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.detector.trainer import init_detector

    cfg = NeuralSimConfig(
        net=net,
        render=dataclasses.replace(rc, perturb=False),
        camera=CameraConfig(height=H, width=W, focal=60.0, fx=60.0, fy=60.0,
                            cx=24.0, cy=24.0),
        sampler=SamplerConfig(n_samples_k=12),
        detector=DetectorConfig(num_classes=2, image_size=64,
                                max_iter=args.det_steps, images_per_batch=4,
                                base_lr=2e-3, warmup_iters=10),
        bilevel=BilevelConfig(opt_lr=1e-3, opt_method="momentum",
                              psi_pose_cats_mode="uniform",
                              ihvp_solver="onestep", grad_e_max_images=4),
    )

    # held-out val: analytic renders from fresh poses, auto-annotated
    val_poses = np.asarray(pose_spherical(
        jnp.array([15.0, 95.0, 185.0, 275.0]), jnp.full(4, -15.0), 1.2))
    val_imgs = render_analytic(val_poses, H, W, K)
    images, boxes, labels, valid = build_detector_batches(
        val_imgs, [0] * 4, cfg.detector)
    print(f"[3] val annotations: {np.asarray(valid[:, 0]).tolist()}")

    drv = BilevelDriver(cfg, state.params, ValData(images, boxes, labels, valid),
                        key=jax.random.PRNGKey(3), object_class=0,
                        output_dir=out_dir)
    psi = psi_init("uniform")
    popt = psi_optimizer_init("momentum", cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(4), cfg.detector)
    for epoch in range(2):
        r = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
        psi, popt, det = r["psi"], r["psi_opt"], r["detector_state"]
        print(f"    epoch {epoch}: inner_loss {r['inner_loss']:.3f} "
              f"AP50 {r['map']['AP50']:.1f} AP {r['map']['AP']:.1f} "
              f"|grad_psi| {np.abs(r['grad_psi']).max():.2e}")

    # [4] visual artifact: NeRF render + detections overlay
    from neuralsim_tpu.detector.predictor import DetectorPredictor, draw_detections
    from neuralsim_tpu.ops.render import render_poses as rp, to8b
    import imageio.v2 as imageio

    demo = np.asarray(rp(state.params, jnp.asarray(val_poses[:1]), H, W, K,
                         None, net, cfg.render)["rgb_map"][0])
    pred = DetectorPredictor(det.params, cfg.detector)
    d = pred(demo)
    vis = draw_detections(demo, d["boxes"], d["labels"])
    imageio.imwrite(os.path.join(out_dir, "demo_detection.png"), vis)
    imageio.imwrite(os.path.join(out_dir, "demo_render.png"), to8b(demo))
    print(f"[4] {len(d['boxes'])} detections on a NeRF render; artifacts in {out_dir}")
    return out_dir


if __name__ == "__main__":
    main()
