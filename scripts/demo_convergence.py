"""psi-convergence demonstration: the framework visibly does Neural-Sim's
job (VERDICT r4 #1).

The reference's entire purpose is the outer loop drifting psi toward the
validation pose distribution (``optimization/neural_sim_main.py:1144-1212``,
psi logging ``:1208-1210``) — yet no prior-round artifact showed
softmax(psi) concentrating on a known-optimal bin with mAP beating the
``optimization=False`` ablation. This script constructs exactly that
experiment:

  - Scene: an EXACT box density (bench.box_scene_params) OFF-CENTER at
    (+x) so the object's frame position and apparent size depend strongly
    on camera azimuth — i.e. on the psi-sampled bin. The box MLP has a
    real NeRF's architecture; its weights are hand-constructed, so no
    NeRF pre-training is needed and the renders are bit-reproducible.
  - Val set: renders of the SAME scene from poses drawn ONLY from the
    target azimuth bin, auto-annotated — the "test distribution" whose
    pose statistics psi must discover (reference --test_distribution).
  - Loop: the full BilevelDriver (render -> annotate -> inner-train ->
    eval -> hypergrad -> psi update) for N epochs, in either hypergrad
    mode ("influence" = the reference's approximation chain, "unrolled" =
    exact dL_val/dI), plus an optimization=False ablation.

Success = softmax(psi) mass on the target bin rising above the uniform
1/8 to a clear majority, and final mAP >= the ablation's.

Run (CPU stub scale, ~2-4 min):
    PYTHONPATH=. python scripts/demo_convergence.py --epochs 40
Pipeline scale on TPU (100^2 renders, K=50, full R50-FPN RetinaNet):
    PYTHONPATH=. python scripts/demo_convergence.py --scale pipeline \
        --epochs 30 --out scripts/results/convergence_tpu.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

TARGET_BIN = 4  # center 202.5 deg — mid-range, away from the linear-mix edge


def stub_cfg(hypergrad_mode: str, optimization: bool, n_k: int = 8,
             opt_lr: float = 2e-3, n_epochs: int = 50,
             ihvp_solver: str = "onestep", explore_eps: float = 0.0,
             det_iters: int = 12):
    from neuralsim_tpu.config import (
        BilevelConfig, CameraConfig, DetectorConfig, NeRFNetConfig,
        NeuralSimConfig, RenderConfig, SamplerConfig,
    )

    return NeuralSimConfig(
        net=NeRFNetConfig(netdepth=2, netwidth=16, netdepth_fine=2,
                          netwidth_fine=16, skips=(0,), multires=2,
                          multires_views=1),
        render=RenderConfig(n_samples=24, n_importance=0, ray_chunk=4096,
                            near=0.4, far=2.0, perturb=False),
        camera=CameraConfig(height=32, width=32, focal=40.0, fx=40.0,
                            fy=40.0, cx=16.0, cy=16.0),
        sampler=SamplerConfig(n_samples_k=n_k),
        detector=DetectorConfig(num_classes=2, image_size=32,
                                max_iter=det_iters,
                                images_per_batch=4, base_lr=4e-3,
                                warmup_iters=4),
        bilevel=BilevelConfig(
            optimization=optimization, opt_lr=opt_lr, opt_method="adam",
            psi_pose_cats_mode="uniform", hypergrad_mode=hypergrad_mode,
            ihvp_solver=ihvp_solver, grad_e_max_images=n_k,
            # match the reference LR schedule's decay horizon to the actual
            # run length: decay hits exactly 0 at the final epoch instead of
            # going negative past the 50-epoch default (psi_opt.py clamp)
            n_epochs=n_epochs, explore_eps=explore_eps,
            # pin f32 for the psi chain: the production bf16 default is
            # hardware-gated at 400^2 scale (probe cosine 0.9999999), but
            # the 32^2 stub's gradients are small/cancellation-prone and
            # CPU bf16 is emulated (slower AND noisier) — a post-flip
            # stub run at the previously-steady lr=0.05 collapsed where
            # the f32 run rose monotonically
            grad_compute_dtype="float32"),
    )


def pipeline_cfg(hypergrad_mode: str, optimization: bool,
                 opt_lr: float = 0.05, n_epochs: int = 50,
                 ihvp_solver: str = "onestep", explore_eps: float = 0.0):
    """North-star pipeline shape: 100^2 renders (the reference's default
    pipeline resolution, load_LINEMOD_noscale.py:185-192), K=50 poses,
    full-size NeRF MLP, R50-FPN RetinaNet, 50-step inner train."""
    from neuralsim_tpu.config import (
        BilevelConfig, CameraConfig, DetectorConfig, NeRFNetConfig,
        NeuralSimConfig, RenderConfig, SamplerConfig,
    )

    h = w = 100
    return NeuralSimConfig(
        net=NeRFNetConfig(),
        render=RenderConfig(ray_chunk=40960, near=0.4, far=2.0,
                            perturb=False),
        camera=CameraConfig(height=h, width=w, focal=333.33,
                            fx=333.33, fy=333.33, cx=48.86, cy=50.16),
        sampler=SamplerConfig(),                       # K=50
        detector=DetectorConfig(num_classes=2),        # 50-step R50-FPN
        bilevel=BilevelConfig(
            optimization=optimization, opt_lr=opt_lr, opt_method="adam",
            psi_pose_cats_mode="uniform", hypergrad_mode=hypergrad_mode,
            ihvp_solver=ihvp_solver, grad_e_max_images=12,
            n_epochs=n_epochs, explore_eps=explore_eps,
            grad_compute_dtype="float32"),
    )


def scene_models(cfg, half=0.08, center=(0.2, 0.0, 0.0),
                 view_gate=0.0):
    """Exact off-center box whose frame appearance is azimuth-dependent:
    with theta ~ 90 deg the camera orbits the x-z plane (sampler/poses.py
    conventions), so a +x offset moves the object across the frame and
    changes its apparent size as psi shifts azimuth bins."""
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import box_scene_params

    params = box_scene_params(cfg.net, jax.random.PRNGKey(0), half=half,
                              center=center, view_gate=view_gate)
    return {"coarse": params, "fine": params}


def val_from_bin(models, cfg, bin_k: int, n_val: int, key):
    """Render the val distribution: poses ONLY from bin_k (its full
    45-degree width), theta ~ U(85, 95) — the statistics psi must find."""
    from neuralsim_tpu.bilevel.driver import ValData
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.ops.render import render_poses
    from neuralsim_tpu.sampler.poses import bin_centers, pose_spherical

    sc, cam = cfg.sampler, cfg.camera
    k1, k2 = jax.random.split(key)
    center = float(bin_centers(sc)[bin_k])
    az = center + (jax.random.uniform(k1, (n_val,)) - 0.5) * sc.bin_width_deg
    th = jax.random.uniform(k2, (n_val,), minval=sc.theta_low_deg,
                            maxval=sc.theta_high_deg)
    poses = pose_spherical(th, az - 180.0, sc.radius)
    rc = cfg.render.test_mode()
    rgb = np.asarray(render_poses(models, poses, cam.height, cam.width,
                                  cam.K, None, cfg.net, rc)["rgb_map"])
    inputs, boxes, labels, valid = build_detector_batches(
        rgb, [0] * n_val, cfg.detector)
    n_annot = int(np.asarray(valid[:, 0]).sum())
    assert n_annot == n_val, f"val annotation found {n_annot}/{n_val} boxes"
    return ValData(inputs, boxes, labels, valid)


def bin_landscape(cfg, models, bins=(0, 2, 4, 6), n_train=8,
                  n_val=8, seed=0, target_bin=None):
    """The outer objective, measured directly: for each azimuth bin,
    render n_train BIN-PURE images, train the detector from ONE shared
    init for cfg.detector.max_iter steps, and evaluate the summed val
    loss on the TARGET_BIN val set — L_val(bin-pure psi) up to sampling
    noise. The bilevel loop's job is descending this landscape; a scene
    is a valid convergence demo only if the target bin is its argmin
    (deterministic given seeds — no outer-loop dynamics involved)."""
    import jax

    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.detector.trainer import (
        cycle_indices,
        init_detector,
        inner_train,
        make_detector_apply,
    )
    from neuralsim_tpu.models.retinanet import (
        DetBatch,
        generate_anchors,
        retinanet_loss,
    )
    from neuralsim_tpu.ops.render import render_poses
    from neuralsim_tpu.sampler.poses import bin_centers, pose_spherical

    tb = TARGET_BIN if target_bin is None else target_bin
    sc, cam, dc = cfg.sampler, cfg.camera, cfg.detector
    val = val_from_bin(models, cfg, tb, n_val, jax.random.PRNGKey(100 + seed))
    anchors = jnp.concatenate(generate_anchors(dc.image_size), axis=0)
    det_apply = make_detector_apply(dc)[1]
    det0 = init_detector(jax.random.PRNGKey(1000 + seed), dc)
    rc = cfg.render.test_mode()
    k1, k2 = jax.random.split(jax.random.PRNGKey(7 + seed))
    # same within-bin offsets for every bin: only the bin center differs
    off = (jax.random.uniform(k1, (n_train,)) - 0.5) * sc.bin_width_deg
    th = jax.random.uniform(k2, (n_train,), minval=sc.theta_low_deg,
                            maxval=sc.theta_high_deg)
    idx = cycle_indices(n_train, dc.max_iter, dc.images_per_batch,
                        jax.random.PRNGKey(11))

    @jax.jit
    def train_and_val_loss(images, boxes, labels, valid):
        state, _ = inner_train(
            det0, (DetBatch(images, boxes, labels, valid), idx), dc,
            anchors)
        loss, _ = retinanet_loss(
            det_apply, state.params,
            DetBatch(val.images, val.gt_boxes, val.gt_labels, val.gt_valid),
            anchors, dc)
        return loss

    out = {}
    for k in bins:
        az = float(bin_centers(sc)[k]) + off
        poses = pose_spherical(th, az - 180.0, sc.radius)
        rgb = np.asarray(render_poses(models, poses, cam.height, cam.width,
                                      cam.K, None, cfg.net, rc)["rgb_map"])
        images, boxes, labels, valid = build_detector_batches(
            rgb, [0] * n_train, dc)
        out[k] = float(train_and_val_loss(images, boxes, labels, valid))
    return out


def run_convergence(hypergrad_mode: str = "influence",
                    optimization: bool = True, n_epochs: int = 40,
                    seed: int = 0, scale: str = "stub", n_val: int = 6,
                    verbose: bool = True, out_dir: str | None = None,
                    opt_lr: float = 0.05, warm_start: bool = False,
                    ihvp_solver: str = "onestep", n_k: int = 8,
                    explore_eps: float = 0.0, det_iters: int = 12,
                    center_x: float = 0.2, lr_horizon: int | None = None,
                    view_gate: float = 0.0):
    """Run the full driver; returns the per-epoch history:
    [{epoch, target_mass, psi_probs, AP, AP50, inner_loss}, ...].

    warm_start=True chains detector state across epochs like the
    reference (neural_sim_main.py:839-842 reloads model_final.pth) and
    is the REGIME THAT CONVERGES: with a competent persistent detector,
    the unrolled gradient is a coherent distribution-match signal
    (training on target-bin data keeps val loss lowest; off-bin data
    perturbs the detector away) and psi climbs steadily — the recorded
    artifact runs. warm_start=False re-initializes the detector every
    epoch (a stationary cold objective); measured round 5: EVERY
    cold-start run, in both hypergrad modes at lr in {0.05, 0.1, 0.2},
    K in {8, 16}, with and without the exploration floor, drifts AWAY
    from the target bin — after a 12-step train from random init the
    val loss rewards generic detectability, not the target pose
    distribution, so the cold landscape's minimum is genuinely
    elsewhere. (An earlier round-5 note claimed the opposite; it had
    conflated influence-mode drift — the sign-unstable approximation,
    see diag_hypergrad_solvers.py — with the warm-start objective.)"""
    from neuralsim_tpu.bilevel.driver import BilevelDriver
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    horizon = lr_horizon if lr_horizon is not None else n_epochs
    if scale == "pipeline":
        cfg = pipeline_cfg(hypergrad_mode, optimization, opt_lr=opt_lr,
                           n_epochs=horizon, ihvp_solver=ihvp_solver,
                           explore_eps=explore_eps)
    else:
        cfg = stub_cfg(hypergrad_mode, optimization, n_k=n_k,
                       opt_lr=opt_lr, n_epochs=horizon,
                       ihvp_solver=ihvp_solver, explore_eps=explore_eps,
                       det_iters=det_iters)
    models = scene_models(cfg, center=(center_x, 0.0, 0.0),
                          view_gate=view_gate)
    val = val_from_bin(models, cfg, TARGET_BIN, n_val,
                       jax.random.PRNGKey(100 + seed))
    drv = BilevelDriver(cfg, models, val, key=jax.random.PRNGKey(seed),
                        object_class=0,
                        output_dir=out_dir or tempfile.mkdtemp(
                            prefix="convergence_"))
    psi = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr,
                              dim=psi.shape[0])
    det = init_detector(jax.random.PRNGKey(1000 + seed), cfg.detector)

    history = []
    for epoch in range(n_epochs):
        r = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
        psi, popt = r["psi"], r["psi_opt"]
        if warm_start:
            det = r["detector_state"]
        probs = np.asarray(r["psi_probs"], np.float64)
        rec = {
            "epoch": epoch,
            "target_mass": float(probs[TARGET_BIN]),
            "psi_probs": [round(float(p), 4) for p in probs],
            "AP": float(r["map"]["AP"]),
            "AP50": float(r["map"]["AP50"]),
            "inner_loss": float(r["inner_loss"]),
        }
        if "grad_psi" in r:
            rec["grad_l2"] = float(np.linalg.norm(np.asarray(r["grad_psi"])))
        history.append(rec)
        if verbose:
            print(f"  epoch {epoch:3d}  mass[{TARGET_BIN}]="
                  f"{rec['target_mass']:.3f}  AP50={rec['AP50']:5.1f}  "
                  f"AP={rec['AP']:5.1f}  loss={rec['inner_loss']:.3f}",
                  flush=True)
    return history


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=40)
    ap.add_argument("--mode", type=str, default="influence",
                    choices=["influence", "unrolled"])
    ap.add_argument("--scale", type=str, default="stub",
                    choices=["stub", "pipeline"])
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--lr", type=float, default=0.05,
                    help="psi Adam step size. Adam moves psi ~lr per epoch, "
                    "so mass must travel ~T*log-odds / lr epochs; 2e-3 "
                    "(an early default) provably cannot converge in <100 "
                    "epochs through softmax(psi/0.25).")
    ap.add_argument("--n-k", type=int, default=8,
                    help="poses per epoch (stub scale): K. The gradient "
                    "is a mean over K pose draws, so variance ~ 1/K; the "
                    "reference runs K=50 — K=8 stubs are chaotic/"
                    "seed-fragile, K=16 is the demonstrated-stable point.")
    ap.add_argument("--n-val", type=int, default=6)
    ap.add_argument("--det-iters", type=int, default=12,
                    help="stub inner-train steps (longer = stronger, less "
                    "noisy epoch signal at ~linear epoch cost)")
    ap.add_argument("--view-gate", type=float, default=0.0,
                    help="view-dependent box color (bench.box_scene_params"
                    " view_gate): -5 lights the bins-3/4 azimuth arc and "
                    "makes the box near-invisible from the far side, so "
                    "val is UNLEARNABLE without target-arc training views "
                    "— the scene for the convergence demonstration")
    ap.add_argument("--center-x", type=float, default=0.2,
                    help="scene box +x offset; larger = stronger azimuth "
                    "dependence of frame appearance = stronger "
                    "separation between pose bins")
    ap.add_argument("--explore-eps", type=float, default=0.1,
                    help="exploration floor on the sampling distribution "
                    "(BilevelConfig.explore_eps). The bilevel dynamics "
                    "have a wrong-bin collapse trap (soft weights on "
                    "target poses vanish once psi concentrates "
                    "off-target); the floor keeps recovery signal alive. "
                    "0 = reference parity.")
    ap.add_argument("--solver", type=str, default="onestep",
                    help="influence-mode inverse-HVP solver (onestep | "
                    "cg | cg_normal | lissa | neumann | identity)")
    ap.add_argument("--skip-ablation", action="store_true")
    ap.add_argument("--ablation-epochs", type=int, default=12,
                    help="ablation arm length; optimization=False is "
                    "STATIONARY (psi frozen at uniform, cold-start "
                    "detector each epoch), so a short run estimates its "
                    "mean AP as well as a full-length one")
    ap.add_argument("--warm-start", action="store_true",
                    help="chain detector state across epochs (reference "
                    "parity mode; saturates this synthetic scene — see "
                    "run_convergence docstring)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    print(f"[convergence] mode={args.mode} scale={args.scale} "
          f"epochs={args.epochs} target_bin={TARGET_BIN} "
          f"warm_start={args.warm_start}", flush=True)
    hist = run_convergence(args.mode, True, args.epochs, args.seed,
                           args.scale, n_val=args.n_val, opt_lr=args.lr,
                           warm_start=args.warm_start,
                           ihvp_solver=args.solver, n_k=args.n_k,
                           explore_eps=args.explore_eps,
                           det_iters=args.det_iters,
                           center_x=args.center_x,
                           view_gate=args.view_gate)

    result = {"mode": args.mode, "scale": args.scale,
              "solver": args.solver, "lr": args.lr,
              "target_bin": TARGET_BIN, "optimized": hist}
    if not args.skip_ablation:
        print("[convergence] ablation: optimization=False", flush=True)
        result["ablation"] = run_convergence(
            args.mode, False, min(args.epochs, args.ablation_epochs),
            args.seed, args.scale, n_val=args.n_val, opt_lr=args.lr,
            warm_start=args.warm_start, ihvp_solver=args.solver,
            n_k=args.n_k, explore_eps=args.explore_eps,
            det_iters=args.det_iters, center_x=args.center_x,
            view_gate=args.view_gate)

    tail = hist[-5:]
    final_mass = float(np.mean([h["target_mass"] for h in tail]))
    final_ap = float(np.mean([h["AP50"] for h in tail]))
    summary = {"final_target_mass": round(final_mass, 4),
               "final_AP50": round(final_ap, 2)}
    if "ablation" in result:
        summary["ablation_AP50"] = round(float(np.mean(
            [h["AP50"] for h in result["ablation"]])), 2)
    result["summary"] = summary
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[convergence] wrote {args.out}")


if __name__ == "__main__":
    main()
