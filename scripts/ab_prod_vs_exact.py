"""Production-vs-exact bilevel A/B (VERDICT r4 #3): turn the 40 dB pixel
PSNR guard into an end-to-end contract.

The production data-generation preset (``RenderConfig.production_mode()``:
occupancy cull + z tightening + single-pass 16-sample march) feeds the
inner detector train and the grad_E evaluation, while the strips psi
gradient differentiates the EXACT-sampling render (bilevel/driver.py
[3.2] vs [3.3]) — a consistency question the pixel guard alone cannot
answer. This script answers it directly, at stub scale, with the same
known-optimal-bin scene as scripts/demo_convergence.py:

  A. PAIRED GRADIENT: two drivers (exact vs production renders), same
     PRNG key, same initial (psi, psi_opt, detector) state -> one epoch
     each. The pose noise draws are identical, so grad_psi differs ONLY
     through the production approximations. Reports cos(grad_prod,
     grad_exact) — the number VERDICT r4 weak #2 asked for.
  B. TRAJECTORY: N epochs each from the same seed. Reports per-epoch
     AP50 + target-bin mass for both arms — does production data
     generation preserve the bilevel behavior (psi still converges to
     the target bin, mAP comparable)?

Reference semantics being approximated: run_nerf_noscale.py:390-501
(exact coarse+fine render feeding both the detector train images and the
graded render loop at :126-210).

Run (CPU stub scale, ~4-6 min):
    PYTHONPATH=. python scripts/ab_prod_vs_exact.py --epochs 12 \
        --out scripts/results/ab_prod_vs_exact_cpu.json
One epoch-pair on TPU (the hardware evidence):
    PYTHONPATH=. python scripts/ab_prod_vs_exact.py --epochs 1 \
        --out scripts/results/ab_prod_vs_exact_tpu.json
"""

from __future__ import annotations

import argparse
import dataclasses
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

import numpy as np

from scripts.demo_convergence import (  # noqa: E402
    TARGET_BIN,
    pipeline_cfg,
    scene_models,
    stub_cfg,
    val_from_bin,
)


def make_driver(cfg, models, val, seed: int):
    from neuralsim_tpu.bilevel.driver import BilevelDriver

    return BilevelDriver(cfg, models, val, key=jax.random.PRNGKey(seed),
                         object_class=0,
                         output_dir=tempfile.mkdtemp(prefix="ab_"))


def fresh_state(cfg, seed: int):
    from neuralsim_tpu.bilevel.psi_init import psi_init
    from neuralsim_tpu.bilevel.psi_opt import psi_optimizer_init
    from neuralsim_tpu.detector.trainer import init_detector

    psi = psi_init(cfg.bilevel.psi_pose_cats_mode)
    popt = psi_optimizer_init(cfg.bilevel.opt_method, cfg.bilevel.opt_lr,
                              dim=psi.shape[0])
    det = init_detector(jax.random.PRNGKey(1000 + seed), cfg.detector)
    return psi, popt, det


def run_arm(cfg, models, val, n_epochs: int, seed: int, tag: str):
    drv = make_driver(cfg, models, val, seed)
    psi, popt, det = fresh_state(cfg, seed)
    hist = []
    for epoch in range(n_epochs):
        r = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
        psi, popt, det = r["psi"], r["psi_opt"], r["detector_state"]
        probs = np.asarray(r["psi_probs"], np.float64)
        hist.append({
            "epoch": epoch,
            "target_mass": float(probs[TARGET_BIN]),
            "AP": float(r["map"]["AP"]),
            "AP50": float(r["map"]["AP50"]),
            "grad_psi": [float(g) for g in np.asarray(r["grad_psi"])],
        })
        print(f"  [{tag}] epoch {epoch:3d} mass[{TARGET_BIN}]="
              f"{hist[-1]['target_mass']:.3f} AP50={hist[-1]['AP50']:5.1f}",
              flush=True)
    return hist


def cosine(a, b) -> float:
    a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
    return float(np.dot(a, b)
                 / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30))


def run_ab(n_epochs: int = 12, seed: int = 0, prod_samples: int = 16,
           hit_budget_floor: float = 0.45, mode: str = "unrolled",
           det_iters: int = 20, scale: str = "stub"):
    # mode="unrolled" by default: the paired-arm cosine is only a clean
    # measure of the PRODUCTION-RENDER approximation if the gradient
    # itself is stable — the influence/onestep chain is sign-unstable on
    # the indefinite stub Hessian (scripts/diag_hypergrad_solvers.py),
    # which would fold solver noise into the render-sensitivity number.
    # det_iters=20 for the same reason, measured the hard way: at the
    # 12-step inner train the bin landscape is nearly flat (bin_landscape,
    # demo_convergence.py) and the epoch-0 hypergradient is a chaotic
    # two-bin dipole — backend-level precision differences alone flipped
    # its sign (CPU +0.99 vs TPU -0.99 on identical code/seeds). At 20
    # steps the objective separates 7x and the gradient carries signal.
    # scale="pipeline": the north-star 100^2 / K=50 / R50-FPN shape —
    # the regime whose pairing the ROADMAP flags as the stable contract
    # statement (stub 32^2 dipole gradients are backend-sensitive).
    cfg_exact = (pipeline_cfg(mode, True) if scale == "pipeline"
                 else stub_cfg(mode, True, det_iters=det_iters))
    cfg_prod = dataclasses.replace(
        cfg_exact,
        render=cfg_exact.render.production_mode(
            n_samples=prod_samples, hit_budget_floor=hit_budget_floor))
    models = scene_models(cfg_exact)
    val = val_from_bin(models, cfg_exact, TARGET_BIN, 6,
                       jax.random.PRNGKey(100 + seed))

    print("[A/B] arm=exact", flush=True)
    hist_exact = run_arm(cfg_exact, models, val, n_epochs, seed, "exact")
    print("[A/B] arm=production", flush=True)
    hist_prod = run_arm(cfg_prod, models, val, n_epochs, seed, "prod")

    # paired first-epoch gradient: same key + same fresh state in both arms,
    # so epoch-0 grad_psi differs only through the production approximations
    g_cos = [cosine(he["grad_psi"], hp["grad_psi"])
             for he, hp in zip(hist_exact, hist_prod)]
    result = {
        "mode": mode,
        "scale": scale,
        "det_iters": det_iters,
        "prod_samples": prod_samples,
        "hit_budget_floor": hit_budget_floor,
        "target_bin": TARGET_BIN,
        "exact": hist_exact,
        "production": hist_prod,
        "grad_cosine_epoch0": g_cos[0],
        "grad_cosine_per_epoch": [round(c, 6) for c in g_cos],
        "summary": {
            "grad_cosine_epoch0": round(g_cos[0], 6),
            "final_mass_exact": round(hist_exact[-1]["target_mass"], 4),
            "final_mass_prod": round(hist_prod[-1]["target_mass"], 4),
            "final_AP50_exact": round(float(np.mean(
                [h["AP50"] for h in hist_exact[-3:]])), 2),
            "final_AP50_prod": round(float(np.mean(
                [h["AP50"] for h in hist_prod[-3:]])), 2),
        },
    }
    return result


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=12)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--prod-samples", type=int, default=16)
    ap.add_argument("--mode", type=str, default="unrolled",
                    choices=["unrolled", "influence"])
    ap.add_argument("--det-iters", type=int, default=20)
    ap.add_argument("--scale", type=str, default="stub",
                    choices=["stub", "pipeline"])
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    result = run_ab(args.epochs, args.seed, args.prod_samples,
                    mode=args.mode, det_iters=args.det_iters,
                    scale=args.scale)
    print(json.dumps(result["summary"]))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"[A/B] wrote {args.out}")


if __name__ == "__main__":
    main()
