"""psi-convergence: the framework visibly does Neural-Sim's job
(VERDICT r4 #1).

The reference's outer loop exists to drift psi toward the validation
pose distribution (``optimization/neural_sim_main.py:1144-1212``, psi
logging ``:1208-1210``). This test builds the known-optimal-bin scene of
scripts/demo_convergence.py — an off-center box whose frame position and
apparent size depend on camera azimuth, with a val set rendered ONLY
from TARGET_BIN poses — runs the full driver for tens of epochs, and
asserts the psi mass concentrates on the target bin while the
optimization=False ablation stays at its uniform initialization.

Mode choice is evidence-driven (scripts/diag_hypergrad_solvers.py +
the round-5 stub convergence runs): the "unrolled" hypergradient — the
exact dL_val/dI this framework adds over the reference — converges
cleanly, while the reference-parity influence/onestep chain is
sign-unstable at this scale (its (H+damping)v "inverse" on the
indefinite 12-step-inner-train Hessian alternates direction per epoch).
The influence mode's convergence behavior is characterized by the
diagnostic, not asserted here.

Stub scale (32^2 renders, K=8, 12-step detector); the pipeline-scale
twin runs on hardware via scripts/demo_convergence.py --scale pipeline
and is recorded in scripts/results/convergence_tpu_*.json.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

pytestmark = pytest.mark.slow  # tens of full driver epochs


# lr chosen from the round-5 stub sweeps: 0.05 rises steadily
# (0.125 -> 0.27 by epoch 30 in /tmp-logged runs; the 80-epoch artifact in
# scripts/results/convergence_cpu_unrolled.json drives it further), while
# 0.1/0.2 overshoot during the warmup epochs into a wrong-bin
# vanishing-gradient trap (psi concentrates off-target, soft weights on
# target-bin poses -> 0, grad_l2 ~ 1e-3).
N_EPOCHS = 30
LR = 0.05
# K=16 (variance: the gradient is a K-draw mean; the reference's own K is
# 50) + a 0.1 exploration floor (BilevelConfig.explore_eps) — the
# demonstrated-robust configuration; K=8 floorless runs are seed-fragile
# (2 of 3 lr=0.05 runs fell into the wrong-bin collapse trap).
EPS = 0.1
UNIFORM = 1.0 / 8.0


@pytest.fixture(scope="module")
def optimized_history():
    from scripts.demo_convergence import run_convergence

    return run_convergence("unrolled", True, n_epochs=N_EPOCHS,
                           seed=0, scale="stub", verbose=False, opt_lr=LR,
                           n_k=16, explore_eps=EPS)


def test_psi_concentrates_on_target_bin(optimized_history):
    """softmax(psi) mass on the known-optimal bin rises from the uniform
    1/8 toward a clear plurality — the system discovers the val pose
    distribution. (The scripted 80-epoch artifact drives it further;
    this asserts the in-budget trajectory is decisively moving.)"""
    hist = optimized_history
    start = hist[0]["target_mass"]
    tail = float(np.mean([h["target_mass"] for h in hist[-5:]]))
    assert abs(start - UNIFORM) < 0.05, "psi must start near uniform"
    assert tail > 0.18, (
        f"target-bin mass only reached {tail:.3f} after {N_EPOCHS} epochs "
        f"(trajectory: {[round(h['target_mass'], 3) for h in hist]})")
    # rising, not a lucky endpoint
    head = float(np.mean([h["target_mass"] for h in hist[:5]]))
    assert tail > head + 0.05


def test_target_bin_is_argmax(optimized_history):
    probs = np.asarray(optimized_history[-1]["psi_probs"])
    from scripts.demo_convergence import TARGET_BIN

    assert int(np.argmax(probs)) == TARGET_BIN


def test_optimization_beats_ablation(optimized_history):
    """Final detector quality with psi optimization >= the
    optimization=False ablation (the reference's core claim). The
    ablation is STATIONARY (psi frozen at uniform, cold-start detector
    each epoch), so a shorter run suffices for its mean AP50."""
    from scripts.demo_convergence import run_convergence

    ablation = run_convergence("unrolled", False, n_epochs=8,
                               seed=0, scale="stub", verbose=False,
                               opt_lr=LR, n_k=16, explore_eps=EPS)
    # the ablation's psi never moves
    abl_mass = [h["target_mass"] for h in ablation]
    assert max(abs(m - UNIFORM) for m in abl_mass) < 1e-5
    ap_opt = float(np.mean([h["AP50"] for h in optimized_history[-5:]]))
    ap_abl = float(np.mean([h["AP50"] for h in ablation]))
    assert ap_opt >= ap_abl - 1.0, (
        f"optimized AP50 {ap_opt:.1f} vs ablation {ap_abl:.1f}")
