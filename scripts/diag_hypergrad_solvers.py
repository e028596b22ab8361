"""Which influence-mode IHVP solver tracks the TRUE hypergradient?

The unrolled mode differentiates dL_val/dI through the whole inner
training scan — the exact gradient of the objective the driver actually
optimizes (finite-step inner train). The influence mode estimates the
same quantity with the reference's IFT chain (val-grad -> inverse-HVP ->
mixed partial, neural_sim_main.py:855-1069), whose live default
"onestep" is (H + damping I) v — NOT an inverse (see
hypergrad/influence.py:102-104). Round-5 convergence runs showed
unrolled drifting psi onto the known-optimal bin while
influence/onestep drifts AWAY: a systematic direction error, not noise.

This diagnostic quantifies it: follow the unrolled arm's trajectory for
N epochs; at every state, run ONE paired epoch per influence solver
(same PRNG key + same input state -> identical pose noise + renders) and
record cos(grad_influence, grad_unrolled). The solver ranking decides
what the convergence demo/test and the production default should use.

FINDINGS (round 5, scripts/results/diag_hypergrad_solvers.json):
  - Solver layer: plain cg breaks down (NaN: non-SPD curvature) and
    fixed-scale lissa diverges to 1e36/NaN on the indefinite stub
    Hessian; cg_normal and lissa_auto (the round-5 additions) stay
    finite with magnitudes on the oracle's order (0.2-28 vs onestep's
    1e5-1e6).
  - Approximation layer: at one of five states (epoch 2) EVERY
    influence variant — including the sign-correct cg_normal —
    anti-aligns with the exact gradient (cos ~ -0.98). The IFT chain
    assumes the inner train reached a stationary minimum; after a
    12-step cold-start train that assumption fails hard enough to flip
    the direction, independent of how well H^{-1}v is solved.
  => The convergence demo/test ride hypergrad_mode="unrolled" (the
     exact gradient this framework adds over the reference); influence
     mode stays reference-parity (onestep default) with cg_normal as
     the robust solver choice when influence is selected.

Run (CPU stub scale):
    PYTHONPATH=. python scripts/diag_hypergrad_solvers.py --epochs 5 \
        --out scripts/results/diag_hypergrad_solvers.json
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

from scripts.ab_prod_vs_exact import cosine, fresh_state, make_driver
from scripts.demo_convergence import (
    TARGET_BIN,
    scene_models,
    stub_cfg,
    val_from_bin,
)

# "lissa_auto" = lissa with lissa_scale<=0 (power-iteration auto scale);
# "cg_normal" = SPD normal-equations CG — both round-5 additions motivated
# by this diagnostic's first run (cg/lissa NaN, onestep sign-alternating)
SOLVERS = ("onestep", "neumann", "cg", "cg_normal", "lissa", "lissa_auto",
           "identity")


def solver_cfg(base, solver: str, damping: float, cg_iters: int):
    lissa_scale = base.bilevel.lissa_scale
    if solver == "lissa_auto":
        solver, lissa_scale = "lissa", -1.0
    bc = dataclasses.replace(base.bilevel, hypergrad_mode="influence",
                             ihvp_solver=solver, ihvp_damping=damping,
                             cg_iters=cg_iters, lissa_scale=lissa_scale)
    return dataclasses.replace(base, bilevel=bc)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--damping", type=float, default=1e-2)
    ap.add_argument("--cg-iters", type=int, default=10)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    base = stub_cfg("unrolled", True)
    models = scene_models(base)
    val = val_from_bin(models, base, TARGET_BIN, 6,
                       jax.random.PRNGKey(100 + args.seed))

    oracle = make_driver(base, models, val, args.seed)
    arms = {
        s: make_driver(solver_cfg(base, s, args.damping, args.cg_iters),
                       models, val, args.seed)
        for s in SOLVERS
    }

    psi, popt, det = fresh_state(base, args.seed)
    rows = []
    for epoch in range(args.epochs):
        r0 = oracle.run_epoch(epoch, psi, popt, det, save_pngs=False)
        g0 = np.asarray(r0["grad_psi"], np.float64)
        row = {"epoch": epoch,
               "target_mass": float(np.asarray(
                   r0["psi_probs"], np.float64)[TARGET_BIN]),
               "grad_unrolled": [float(g) for g in g0],
               "cos": {}, "grad_l2": {"unrolled": float(np.linalg.norm(g0))}}
        for s, drv in arms.items():
            # same epoch + same driver seed + same input state -> the pose
            # noise, renders, and inner train are bit-identical to the
            # oracle arm; only steps [3.1]/[3.2] differ
            ri = drv.run_epoch(epoch, psi, popt, det, save_pngs=False)
            gi = np.asarray(ri["grad_psi"], np.float64)
            row["cos"][s] = round(cosine(gi, g0), 6)
            row["grad_l2"][s] = float(np.linalg.norm(gi))
        rows.append(row)
        print(f"epoch {epoch}: mass[{TARGET_BIN}]={row['target_mass']:.3f} "
              + " ".join(f"{s}={row['cos'][s]:+.3f}" for s in SOLVERS),
              flush=True)
        # advance along the ORACLE trajectory (cold-start detector regime:
        # det stays at init, matching demo_convergence warm_start=False)
        psi, popt = r0["psi"], r0["psi_opt"]

    summary = {s: round(float(np.mean([r["cos"][s] for r in rows])), 4)
               for s in SOLVERS}
    result = {"damping": args.damping, "cg_iters": args.cg_iters,
              "epochs": rows, "mean_cos": summary}
    print(json.dumps(summary))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
