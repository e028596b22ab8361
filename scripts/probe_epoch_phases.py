"""Reference-scale bilevel epoch on TPU: exact vs production render config.

Scale per SURVEY §6: K=50 renders at 100^2, RetinaNet 6-class 50-iter
inner train (batch 8), grad_E capped at 8 images (round-1 comparable),
strips psi-gradient. NeRF = full-size MLP with the bench's exact-box
density (realistic single-object sparsity for the occupancy path).
"""
import dataclasses, tempfile, time
import jax, jax.numpy as jnp, numpy as np
import os
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neuralsim_tpu.config import NeuralSimConfig, RenderConfig, BilevelConfig
from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
from neuralsim_tpu.bilevel.psi_init import psi_init
from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
from neuralsim_tpu.detector.dataset import build_detector_batches
from neuralsim_tpu.detector.trainer import init_detector
from bench import box_scene_params

base = NeuralSimConfig()
base = dataclasses.replace(
    base,
    render=dataclasses.replace(base.render, compute_dtype="bfloat16",
                               ray_chunk=32768),
    bilevel=dataclasses.replace(base.bilevel, grad_e_max_images=8),
)

params = box_scene_params(base.net, jax.random.PRNGKey(0))
models = {"coarse": params, "fine": params}

rng = np.random.RandomState(1)
val_imgs = np.zeros((8, 100, 100, 3), np.float32)
for i in range(8):
    x0, y0 = rng.randint(10, 50, 2)
    val_imgs[i, y0:y0 + 30, x0:x0 + 30] = rng.rand(3)
images, boxes, labels, valid = build_detector_batches(
    val_imgs, [0] * 8, base.detector)
val = ValData(images, boxes, labels, valid)


def run(label, cfg):
    drv = BilevelDriver(cfg, models, val, key=jax.random.PRNGKey(7),
                        object_class=0, output_dir=tempfile.mkdtemp())
    psi = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(8), cfg.detector)
    rec = None
    times = []
    for epoch in range(3):
        t0 = time.time()
        rec = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
        psi, popt, det = rec["psi"], rec["psi_opt"], rec["detector_state"]
        dt = time.time() - t0
        times.append(dt)
        print(f"{label} epoch {epoch}: {dt:.1f}s  grad_norm="
              f"{np.linalg.norm(np.asarray(rec['grad_psi'])):.2e}", flush=True)
    print(f"{label} steady-state epoch: {min(times[1:]):.1f}s", flush=True)
    return rec


import json

from neuralsim_tpu.utils.profiling import GLOBAL_PHASES

cfg_prod = dataclasses.replace(
    base, render=dataclasses.replace(
        base.render, hit_budget=0.2, tighten_bounds=True))


def run_per_epoch_phases(label, cfg):
    drv = BilevelDriver(cfg, models, val, key=jax.random.PRNGKey(7),
                        object_class=0, output_dir=tempfile.mkdtemp())
    psi = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr)
    det = init_detector(jax.random.PRNGKey(8), cfg.detector)
    for epoch in range(3):
        GLOBAL_PHASES.totals.clear(); GLOBAL_PHASES.counts.clear()
        t0 = time.time()
        rec = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
        psi, popt, det = rec["psi"], rec["psi_opt"], rec["detector_state"]
        dt = time.time() - t0
        phases = {k: round(v["total_s"], 3)
                  for k, v in GLOBAL_PHASES.report().items()}
        print(f"{label} epoch {epoch}: {dt:.1f}s {json.dumps(phases)}",
              flush=True)


run_per_epoch_phases("production", cfg_prod)
print("EPOCH BENCH DONE", flush=True)
