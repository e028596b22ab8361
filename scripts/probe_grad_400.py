"""Round-4 probe: the psi-gradient strips pass at the NORTH-STAR shape
(400^2 renders) on hardware — VERDICT r3 #2's missing measurement.

The reference's graded render loop (run_nerf_noscale.py:126-210) is the
workload being replaced; the repo's strips formulation dispatches one
compiled reverse-mode program per (image-batch, strip). At 400^2 with
grad_ray_chunk=5000, one image is 32 strips; the question is wall-clock
per image and whether (a) image batching at constant rays/program and
(b) single-tile REMAT reverse programs (which cut residual memory ~S-fold
and so allow far more rays per program = fewer dispatches) survive the
v5e backend and how fast they run.

Reports seconds per IMAGE of gradient pass for each surviving variant and
an extrapolated 100-image (grad_e_max_images cap) pass time.
"""

import dataclasses
import json
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np

import sys
sys.path.insert(0, "/root/repo")
from bench import box_scene_params
from neuralsim_tpu.config import NeRFNetConfig, RenderConfig, SamplerConfig
from neuralsim_tpu.hypergrad.render_grad import render_grad_psi_strips
from neuralsim_tpu.sampler.poses import draw_pose_noise

H = W = 400


VARIANTS = [
    # name, strip, image_batch, remat, dtype, dynamic_start
    ("serial_s5000", 5000, 1, False, "float32", False),  # r3 shipped shape
    ("batch2_s5000", 5000, 2, False, "float32", False),  # 10k rays/program
    ("batch4_s5000", 5000, 4, False, "float32", False),  # 20k — vmem spill
    ("remat_s20000", 20000, 1, True, "float32", False),  # 20k — vmem spill
    ("remat_s10000", 10000, 1, True, "float32", False),  # 10k remat
    ("remat_b4_s20000", 20000, 4, True, "float32", False),  # 80k rays/prog
    ("remat_b8_s40000", 40000, 8, True, "float32", False),  # 320k rays/prog
    # bf16 reverse: newly LEGAL after the 2026-08 libtpu fix (the old
    # backend RET_CHECKed on any differentiated bf16-cast render graph).
    # cos_vs_serial in the output is the accuracy gate for a default flip.
    ("bf16_s5000", 5000, 1, False, "bfloat16", False),
    ("bf16_b2_s5000", 5000, 2, False, "bfloat16", False),
    ("bf16_remat_s10000", 10000, 1, True, "bfloat16", False),
    # dynamic strip offset: ONE program for all 32 offsets (traced-offset
    # dynamic slices — the OTHER shape the 2026-08 libtpu legalized).
    # Expect first_call_incl_compile_s to collapse ~32x vs serial_s5000;
    # steady-state s_per_image should match its static twin.
    ("dyn_s5000", 5000, 1, False, "float32", True),
    ("dyn_bf16_b2_s5000", 5000, 2, False, "bfloat16", True),
    # single-lever dynamic variants: each flips exactly ONE knob vs
    # dyn_s5000, and each compiles ONE program — the cheapest clean
    # evidence for the bf16 / image-batch default decisions.
    ("dyn_bf16_s5000", 5000, 1, False, "bfloat16", True),
    ("dyn_b2_s5000", 5000, 2, False, "float32", True),
]

# (name, strip, image_batch, dtype, hit_budget) — occupancy-CULLED strips:
# a selection program picks the top hit_budget fraction of rays per image
# (occupied-AABB slab test), the strip programs gather-render only those.
# Exact up to grid conservativeness (empty rays have identically-zero psi
# gradient): fewer dispatches AND FLOPs vs serial_s5000 in proportion to
# 1/hit_budget. Gather indices are traced operands, so there is ONE
# program per (length, batch) — compile collapse included.
CULLED_VARIANTS = [
    # box-scene 400^2 hit fraction measured 0.42-0.50 over poses (the bench
    # object fills much of the frame; the YCB-V pipeline is similar — its
    # calibrated forward budget is 0.75 with the 1.25x margin), so 0.55
    # exercises the selection branch: 18 strips/image instead of 32
    ("cull55_s5000", 5000, 1, "float32", 0.55),
    ("cull55_b2_s5000", 5000, 2, "float32", 0.55),
    ("cull55_bf16_s5000", 5000, 1, "bfloat16", 0.55),
    ("cull55_bf16_b2_s5000", 5000, 2, "bfloat16", 0.55),
]


def run_all(n_img: int):
    """Each variant in its OWN subprocess: a backend RET_CHECK aborts the
    process (SIGABRT), and the remaining variants must still run."""
    import json as _json
    import subprocess

    only_names = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    merged = {"n_img": n_img, "hw": H}
    for name, *_ in VARIANTS + CULLED_VARIANTS:
        if only_names and name not in only_names:
            continue
        try:
            p = subprocess.run(
                [sys.executable, __file__, str(n_img), name],
                capture_output=True, timeout=5400)
            out = p.stdout.decode(errors="replace")
            line = next((l for l in out.splitlines()
                         if l.startswith("{")), None)
            if p.returncode == 0 and line:
                merged.update({k: v for k, v in _json.loads(line).items()
                               if k not in ("n_img", "hw")})
            else:
                merged[name] = {"error": f"rc={p.returncode}",
                                "tail": (p.stderr.decode(errors='replace')
                                         [-300:])}
        except subprocess.TimeoutExpired:
            merged[name] = {"error": "timeout 5400s"}
        print(f"== {name}: "
              f"{merged.get(name, 'see line above')}", flush=True)
        # persist after EVERY variant so a killed run keeps its results
        with open("/tmp/probe_grad_400.json", "w") as f:
            _json.dump(merged, f, indent=1)

    # accuracy cross-check: cosine of every variant's gradient against the
    # f32 serial oracle (all variants compute the SAME mathematical object)
    ref = merged.get("serial_s5000", {}).get("grad_vec")
    if ref is not None:
        ref = np.asarray(ref)
        for name, r in merged.items():
            if isinstance(r, dict) and "grad_vec" in r:
                v = np.asarray(r["grad_vec"])
                r["cos_vs_serial"] = float(
                    np.dot(v, ref)
                    / max(np.linalg.norm(v) * np.linalg.norm(ref), 1e-30))
        with open("/tmp/probe_grad_400.json", "w") as f:
            _json.dump(merged, f, indent=1)
    print(json.dumps(merged))


def main():
    # usage: probe_grad_400.py [n_img] [variant|all [name,name,...]]
    # "all" (or no 2nd arg) = orchestrate every/listed variant in
    # subprocess isolation; a single variant name = run it inline.
    n_img = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if only is None or only == "all":
        return run_all(n_img)

    net = NeRFNetConfig()
    # the driver's gradient config: EXACT sampling (64+128), f32, no cull
    rc = RenderConfig(ray_chunk=32768, compute_dtype="float32").test_mode()
    sc = SamplerConfig()
    K = np.array([[1333.3334, 0.0, 195.42932],
                  [0.0, 1334.2196, 200.6318],
                  [0.0, 0.0, 1.0]], np.float32)
    params = box_scene_params(net, jax.random.PRNGKey(0))
    models = {"coarse": params, "fine": params}
    psi = jnp.zeros((8,), jnp.float32)
    noise = draw_pose_noise(jax.random.PRNGKey(1), sc, num_k=n_img)
    grad_E = (jax.random.normal(jax.random.PRNGKey(2), (n_img, H, W, 3))
              * 1e-3).astype(jnp.float32)

    grid = None
    if any(name == only for name, *_ in CULLED_VARIANTS):
        from neuralsim_tpu.models.nerf import make_sigma_fn
        from neuralsim_tpu.ops.occupancy import (
            build_scene_grid,
            scene_half_extent,
        )

        grid = build_scene_grid(
            make_sigma_fn(params, net),
            scene_half_extent(sc.radius, rc.far, H, W, K))

    todo = ([(n, s, b, r, d, dy, None, 1.0)
             for n, s, b, r, d, dy in VARIANTS]
            + [(n, s, b, False, d, False, grid, hb)
               for n, s, b, d, hb in CULLED_VARIANTS])
    results = {"n_img": n_img, "hw": H}
    for name, strip, ib, remat, dtype, dyn, gv, hb in todo:
        if only and name != only:
            continue
        rcv = dataclasses.replace(rc, remat=remat)
        cache = {}
        try:
            t0 = time.perf_counter()
            g = render_grad_psi_strips(
                models, psi, noise, grad_E, H, W, K, net, rcv, sc,
                strip=strip, image_batch=ib, jit_cache=cache,
                compute_dtype=dtype, dynamic_start=dyn,
                grid=gv, hit_budget=hb)
            np.asarray(g)       # true barrier
            t_compile = time.perf_counter() - t0
            t0 = time.perf_counter()
            g = render_grad_psi_strips(
                models, psi, noise, grad_E, H, W, K, net, rcv, sc,
                strip=strip, image_batch=ib, jit_cache=cache,
                compute_dtype=dtype, dynamic_start=dyn,
                grid=gv, hit_budget=hb)
            g_np = np.asarray(g)
            dt = time.perf_counter() - t0
            assert np.isfinite(g_np).all()
            results[name] = {
                "s_total": round(dt, 2),
                "s_per_image": round(dt / n_img, 3),
                "s_100_images_est": round(dt / n_img * 100, 1),
                "first_call_incl_compile_s": round(t_compile, 1),
                "grad_l2": float(np.linalg.norm(g_np)),
                "grad_vec": [float(x) for x in g_np],
            }
            print(f"{name}: {dt:.2f}s total, {dt / n_img:.3f}s/image "
                  f"(compile pass {t_compile:.0f}s)", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:300]}
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    if only is None:
        with open("/tmp/probe_grad_400.json", "w") as f:
            json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
