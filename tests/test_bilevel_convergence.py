"""psi-convergence certification: the framework does Neural-Sim's job
(VERDICT r4 #1), asserted at the two layers that are deterministic.

The reference's outer loop exists to drift psi toward the validation
pose distribution (``optimization/neural_sim_main.py:1144-1212``). On
the known-optimal-bin scene of scripts/demo_convergence.py (view-gated
off-center box: bright only from the bins-3/4 azimuth arc, val set
rendered ONLY from TARGET_BIN poses):

1. THE OBJECTIVE: per-bin-pure training from one shared detector init
   places the val-loss argmin at the target bin with a wide margin
   (`bin_landscape`). Round-5 measurements drove the scene design: at a
   12-step inner train the original gray box's landscape was nearly
   FLAT between bins 4 and 6 (0.995 vs 1.058 — gradients there are
   chaotic dipoles; backend precision alone flipped their sign), while
   the shipped 20-step view-gated scene separates to 0.47 (target) vs
   0.82 (adjacent bright bin) vs 3.3-7.4 (off-arc, where the box is
   near-invisible).
2. THE GRADIENT, END TO END: the driver's composed grad_psi (unrolled
   dL_val/dI -> strips dI/dpsi -> explore/softmax chain) matches
   central finite differences of the TRUE outer objective — same pose
   noise, same annotation, same batch schedule — on the dominant
   coordinate (scripts/fd_outer_gradient.py; measured driver +3.826 vs
   FD +2.683). The per-component FD tests (test_unrolled,
   test_render_grad) never certified the driver's composition.

What is deliberately NOT asserted: endpoint convergence of the stub
DYNAMICS. Recorded evidence (scripts/results/mean_hypergrad_uniform.json)
shows the per-epoch cold-start hypergradient is heavy-tail
noise-dominated (|grad| spans 1e-3..30 across seeds; a 10-seed mean has
SEM ~ mean), so single psi trajectories at this scale random-walk under
Adam's sign normalization — both risers and drifters are recorded
(scripts/results/convergence_*.json, CPU and TPU pipeline scale). The
reference's own regime (50 real-data epochs, momentum at 5e-5) is
magnitude-sensitive for exactly this reason. scripts/demo_convergence.py
remains the dynamics driver with every lever exposed
(--warm-start/--n-k/--det-iters/--explore-eps/--view-gate).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow  # full driver epochs + FD re-evaluations

DET_ITERS = 20
VIEW_GATE = -5.0


def test_outer_objective_prefers_target_bin():
    """Landscape certification (deterministic): L_val after bin-pure
    training is minimized at the target bin. Margins sit ~2x below the
    recorded measurement (0.47 / 0.82 / 3.3-7.4)."""
    from scripts.demo_convergence import (
        TARGET_BIN, bin_landscape, scene_models, stub_cfg)

    cfg = stub_cfg("unrolled", True, det_iters=DET_ITERS)
    models = scene_models(cfg, view_gate=VIEW_GATE)
    land = bin_landscape(cfg, models, bins=(0, 2, 3, 4, 6))
    assert min(land, key=land.get) == TARGET_BIN, land
    # adjacent bright bin (3): geometry separates it; off-arc bins: the
    # box is near-invisible there, so bin-pure training barely helps val
    assert land[TARGET_BIN] < 0.75 * land[3], land
    off_arc = min(land[k] for k in (0, 2, 6))
    assert land[TARGET_BIN] < 0.25 * off_arc, land


def test_driver_hypergradient_matches_fd_oracle():
    """End-to-end gradient certification: the driver's composed
    grad_psi agrees with large-step central differences of the true
    outer objective on the dominant coordinate — same sign, magnitude
    within 3x (FD at delta=0.5 is a secant on a curved objective)."""
    from scripts.fd_outer_gradient import fd_vs_driver

    out = fd_vs_driver(det_iters=DET_ITERS, view_gate=VIEW_GATE, seed=0)
    probe = out["probes"][0]
    assert probe["same_sign"], out
    ratio = abs(probe["driver"]) / max(abs(probe["fd"]), 1e-9)
    assert 1 / 3 < ratio < 3, out
    # and the gradient is a real signal at this state, not numerical dust
    assert abs(probe["driver"]) > 0.1, out
