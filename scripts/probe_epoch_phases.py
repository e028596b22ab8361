"""Reference-scale bilevel epoch phase profile on TPU.

Scale per SURVEY §6: K=50 renders at 100^2, RetinaNet 6-class 50-iter
inner train (batch 8), grad_E capped at 8 images, strips psi-gradient.
NeRF = full-size MLP with the bench's exact-box density (realistic
single-object sparsity for the occupancy path).

Prints per-epoch wall time plus the utils.profiling phase breakdown —
the instrument behind the README's epoch profile and the VERDICT r2 #5
before/after for the jitted evaluate path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/probe_epoch_phases.py
"""

from __future__ import annotations

import dataclasses
import json
import os
import tempfile
import time

import jax
import numpy as np

os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import box_scene_params  # noqa: E402
from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData  # noqa: E402
from neuralsim_tpu.bilevel.psi_init import psi_init  # noqa: E402
from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init  # noqa: E402
from neuralsim_tpu.config import NeuralSimConfig  # noqa: E402
from neuralsim_tpu.detector.dataset import build_detector_batches  # noqa: E402
from neuralsim_tpu.detector.trainer import init_detector  # noqa: E402
from neuralsim_tpu.utils.profiling import GLOBAL_PHASES  # noqa: E402


def build_scene(base: NeuralSimConfig):
    params = box_scene_params(base.net, jax.random.PRNGKey(0))
    models = {"coarse": params, "fine": params}
    rng = np.random.RandomState(1)
    val_imgs = np.zeros((8, 100, 100, 3), np.float32)
    for i in range(8):
        x0, y0 = rng.randint(10, 50, 2)
        val_imgs[i, y0:y0 + 30, x0:x0 + 30] = rng.rand(3)
    images, boxes, labels, valid = build_detector_batches(
        val_imgs, [0] * 8, base.detector)
    return models, ValData(images, boxes, labels, valid)


def run_per_epoch_phases(label: str, cfg: NeuralSimConfig, models, val,
                         n_epochs: int = 3) -> None:
    drv = BilevelDriver(cfg, models, val, key=jax.random.PRNGKey(7),
                        object_class=0, output_dir=tempfile.mkdtemp())
    psi = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(8), cfg.detector)
    for epoch in range(n_epochs):
        GLOBAL_PHASES.totals.clear()
        GLOBAL_PHASES.counts.clear()
        t0 = time.time()
        rec = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
        psi, popt, det = rec["psi"], rec["psi_opt"], rec["detector_state"]
        dt = time.time() - t0
        phases = {k: round(v["total_s"], 3)
                  for k, v in GLOBAL_PHASES.report().items()}
        print(f"{label} epoch {epoch}: {dt:.1f}s {json.dumps(phases)}",
              flush=True)


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=100,
                    help="render side (100 = reference scale; 400 = "
                         "north-star scale, BASELINE.json config 4)")
    ap.add_argument("--ge", type=int, default=8,
                    help="grad_e_max_images (strips-gradient image count)")
    ap.add_argument("--single_pass", action="store_true",
                    help="production_mode() single-pass render for the "
                         "K-pose forward (round 4 headline preset)")
    ap.add_argument("--epochs", type=int, default=3)
    args = ap.parse_args()

    base = NeuralSimConfig()
    scale = args.hw / 100.0
    base = dataclasses.replace(
        base,
        render=dataclasses.replace(base.render, compute_dtype="bfloat16",
                                   ray_chunk=32768),
        camera=dataclasses.replace(
            base.camera, height=args.hw, width=args.hw,
            focal=base.camera.focal * scale, fx=base.camera.fx * scale,
            fy=base.camera.fy * scale, cx=base.camera.cx * scale,
            cy=base.camera.cy * scale),
        bilevel=dataclasses.replace(base.bilevel,
                                    grad_e_max_images=args.ge),
    )
    models, val = build_scene(base)
    if args.single_pass:
        rc = base.render.production_mode()
        rc = dataclasses.replace(rc, compute_dtype=base.render.compute_dtype,
                                 ray_chunk=base.render.ray_chunk)
    else:
        rc = dataclasses.replace(base.render, hit_budget=0.2,
                                 tighten_bounds=True)
    cfg_prod = dataclasses.replace(base, render=rc)
    label = (f"production hw={args.hw} ge={args.ge}"
             + (" single_pass" if args.single_pass else ""))
    run_per_epoch_phases(label, cfg_prod, models, val, n_epochs=args.epochs)
    print("EPOCH BENCH DONE", flush=True)


if __name__ == "__main__":
    main()
