"""End-to-end FD certification of the driver's psi hypergradient.

Builds the TRUE outer objective L(psi) = val loss of the detector after
the epoch's inner train — same pose noise, same annotation path, same
batch schedule as BilevelDriver.run_epoch at epoch 0 — and compares the
driver's reported grad_psi against central finite differences of L.

This closes the certification gap the per-component FD tests leave
open: test_unrolled.py FD-checks dL_val/dI, test_render_grad.py checks
the strips machinery against psi_outer_loss, but nothing verified the
DRIVER'S COMPOSITION of them end to end. Measured (view-gated scene,
20-step inner train, seed 0): driver +3.826 vs FD +2.683 on the
dominant coordinate — same sign, magnitudes within 1.5x (FD at delta=
0.5 is a large-step secant on a curved objective; exact agreement is
not expected).

Context recorded alongside (scripts/results/mean_hypergrad_uniform.json):
the PER-EPOCH gradient at cold start is heavy-tail noise-dominated
(single epochs produce |grad| from 1e-3 to 30; a 10-seed mean has SEM ~
mean), which is why endpoint-convergence of the stub dynamics is not a
stable assertion while this FD check is deterministic and exact in
expectation. See README "psi-convergence" for the full story.

Run: PYTHONPATH=. JAX_PLATFORMS=cpu python scripts/fd_outer_gradient.py
"""
from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.devices()
except RuntimeError:
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def fd_vs_driver(det_iters: int = 20, view_gate: float = -5.0,
                 seed: int = 0, delta: float = 0.5, probe_bins=None):
    from scripts.ab_prod_vs_exact import fresh_state, make_driver
    from scripts.demo_convergence import (
        TARGET_BIN, scene_models, stub_cfg, val_from_bin)
    from neuralsim_tpu.detector.dataset import build_detector_batches_device
    from neuralsim_tpu.detector.trainer import (
        cycle_indices, inner_train, make_detector_apply)
    from neuralsim_tpu.models.retinanet import (
        DetBatch, generate_anchors, retinanet_loss)
    from neuralsim_tpu.sampler.poses import draw_pose_noise

    cfg = stub_cfg("unrolled", True, det_iters=det_iters)
    models = scene_models(cfg, view_gate=view_gate)
    val = val_from_bin(models, cfg, TARGET_BIN, 6,
                       jax.random.PRNGKey(100 + seed))
    psi0, popt, det0 = fresh_state(cfg, seed)
    dc = cfg.detector

    drv = make_driver(cfg, models, val, seed=seed)
    rec = drv.run_epoch(0, psi0, popt, det0, save_pngs=False)
    g = np.asarray(rec["grad_psi"], np.float64)

    # replicate run_epoch's epoch-0 key stream for the objective evaluator
    _, k_noise, k_batch, _ = jax.random.split(jax.random.PRNGKey(seed), 4)
    noise = draw_pose_noise(k_noise, cfg.sampler)
    anchors = jnp.concatenate(generate_anchors(dc.image_size), axis=0)
    det_apply = make_detector_apply(dc)[1]
    drv2 = make_driver(cfg, models, val, seed=seed)

    def L(psi):
        renders = drv2._do_render(psi, noise)
        if isinstance(renders, tuple):
            renders = renders[0]
        labels = [0] * int(renders.shape[0])
        inputs, gb, gl, gv = build_detector_batches_device(renders, labels, dc)
        batches = (DetBatch(inputs, gb, gl, gv),
                   cycle_indices(inputs.shape[0], dc.max_iter,
                                 dc.images_per_batch, k_batch))
        state, _ = inner_train(det0, batches, dc, anchors)
        loss, _ = retinanet_loss(
            det_apply, state.params,
            DetBatch(val.images, val.gt_boxes, val.gt_labels, val.gt_valid),
            anchors, dc)
        return float(loss)

    bins = probe_bins if probe_bins is not None else [int(np.argmax(np.abs(g)))]
    rows = []
    for k in bins:
        e = jnp.zeros(8).at[k].set(delta)
        fd = (L(psi0 + e) - L(psi0 - e)) / (2 * delta)
        rows.append({"bin": int(k), "fd": float(fd), "driver": float(g[k]),
                     "same_sign": bool(fd * g[k] > 0)})
    return {"det_iters": det_iters, "view_gate": view_gate, "seed": seed,
            "delta": delta, "grad_psi": [float(x) for x in g], "probes": rows}


if __name__ == "__main__":
    out = fd_vs_driver()
    print(json.dumps(out, indent=1))
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results", "fd_outer_gradient.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")
