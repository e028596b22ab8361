"""Multi-object / multi-distribution bilevel sweep (BASELINE.json config 5).

The reference runs one `neural_sim_main.py` process per (object_id,
test_distribution) pair (README.md:104-117); this script is the sweep
driver: for each pair it builds the pipeline config (optionally at 800^2
via --render_hw), runs `n_epochs` bilevel epochs through BilevelDriver,
and writes one JSONL row per run with the final mAP and psi.

With real YCB-V data present (the reference directory layout consumed by
neuralsim_tpu.cli), pass --data-root; without it (--synthetic), each
object is a synthetic box scene of a per-object size so the sweep is
executable end-to-end in this environment.

Run:
  PYTHONPATH=. python scripts/sweep_multiobject.py --synthetic \
      --objects 2 5 --distributions one_1 one_3 --epochs 2 --render_hw 800
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import tempfile
import time

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def synthetic_models(net, object_id: int):
    """Full-size NeRF computing an exact box density; per-object size maps
    loosely to the YCB-V diameter table (data/bop_convert.py)."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import box_scene_params

    half = 0.03 + 0.01 * (object_id % 4)
    params = box_scene_params(net, jax.random.PRNGKey(object_id), half=half)
    return {"coarse": params, "fine": params}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--objects", type=int, nargs="+", default=[2])
    ap.add_argument("--distributions", type=str, nargs="+", default=["one_1"])
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--render_hw", type=int, default=100,
                    help="render side; 800 for BASELINE config 5 scale")
    ap.add_argument("--n_samples_K", type=int, default=8)
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--data-root", type=str, default=None)
    ap.add_argument("--production", action="store_true",
                    help="occupancy culling + z tightening")
    ap.add_argument("--det-iters", type=int, default=None,
                    help="override detector inner iterations (CPU smokes)")
    ap.add_argument("--compute-dtype", type=str, default="bfloat16",
                    help="float32 for CPU smokes (bf16 is emulated on CPU)")
    ap.add_argument("--out", type=str, default="sweep_results.jsonl")
    args = ap.parse_args(argv)

    from neuralsim_tpu.bilevel.driver import BilevelDriver, ValData
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.config import NeuralSimConfig
    from neuralsim_tpu.detector.dataset import build_detector_batches
    from neuralsim_tpu.detector.trainer import init_detector

    base = NeuralSimConfig()
    hw = args.render_hw
    scale = hw / base.camera.height
    base = dataclasses.replace(
        base,
        camera=dataclasses.replace(
            base.camera, height=hw, width=hw,
            fx=base.camera.fx * scale, fy=base.camera.fy * scale,
            cx=base.camera.cx * scale, cy=base.camera.cy * scale),
        sampler=dataclasses.replace(base.sampler,
                                    n_samples_k=args.n_samples_K),
        render=dataclasses.replace(
            base.render, compute_dtype=args.compute_dtype, ray_chunk=32768,
            hit_budget=0.2 if args.production else 1.0,
            tighten_bounds=args.production),
        bilevel=dataclasses.replace(base.bilevel, n_epochs=args.epochs,
                                    grad_e_max_images=4),
        # detector input must fit the renders (pad-only DatasetMapper);
        # at 800^2 this matches detectron2's min-size-800 default
        detector=dataclasses.replace(
            base.detector,
            image_size=max(base.detector.image_size, hw)),
    )
    if args.det_iters:
        base = dataclasses.replace(
            base, detector=dataclasses.replace(
                base.detector, max_iter=args.det_iters,
                warmup_iters=min(2, args.det_iters)))

    rows = []
    for obj in args.objects:
        cfg = dataclasses.replace(
            base, data=dataclasses.replace(base.data, object_id=obj))
        if args.synthetic:
            models = synthetic_models(cfg.net, obj)
            rng = np.random.RandomState(obj)
            val_imgs = np.zeros((4, hw, hw, 3), np.float32)
            for i in range(4):
                x0, y0 = rng.randint(hw // 10, hw // 2, 2)
                s = hw // 4
                val_imgs[i, y0:y0 + s, x0:x0 + s] = rng.rand(3)
            images, boxes, labels, valid = build_detector_batches(
                val_imgs, [0] * 4, cfg.detector)
            val = ValData(images, boxes, labels, valid)
        else:
            raise SystemExit(
                "real-data sweep: use neuralsim_tpu.cli per pair (this "
                "script's synthetic mode covers the environment without "
                "YCB-V artifacts)")

        for dist in args.distributions:
            cfg_d = dataclasses.replace(
                cfg, data=dataclasses.replace(cfg.data,
                                              test_distribution=dist))
            drv = BilevelDriver(cfg_d, models, val,
                                key=jax.random.PRNGKey(obj),
                                object_class=0,
                                output_dir=tempfile.mkdtemp())
            psi = psi_init(cfg_d.bilevel.psi_pose_cats_mode)
            popt = psi_optimizer_init(cfg_d.bilevel.opt_method,
                                      cfg_d.bilevel.opt_lr)
            det = init_detector(jax.random.PRNGKey(100 + obj),
                                cfg_d.detector)
            t0 = time.time()
            rec = None
            for epoch in range(args.epochs):
                rec = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
                psi, popt, det = (rec["psi"], rec["psi_opt"],
                                  rec["detector_state"])
            row = {
                "object_id": obj, "test_distribution": dist,
                "render_hw": hw, "epochs": args.epochs,
                "wallclock_s": round(time.time() - t0, 1),
                "final_map": {k: v for k, v in rec["map"].items()
                              if isinstance(v, float)},
                "psi_probs": np.asarray(rec["psi_probs"]).tolist(),
            }
            rows.append(row)
            print(json.dumps(row), flush=True)

    with open(args.out, "w") as f:
        for row in rows:
            f.write(json.dumps(row) + "\n")
    print(f"wrote {len(rows)} rows -> {args.out}")


if __name__ == "__main__":
    main()
