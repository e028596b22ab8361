"""Round-3 probe 4: ray-major march kernel vs point-major path.

Compares rc.fuse_pointgen (new fused_nerf_march: point-gen + PE + MLP
in VMEM, channel-separated raw outputs) against the point-major widepe
kernel + query_points scaffolding, interleaved in one process, on the
exact-hierarchical and production (culled+tightened) workloads.
Slope probes per the verify skill (k_hi=3).
"""

import dataclasses
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import sys
sys.path.insert(0, "/root/repo")
from bench import box_scene_params
from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
from neuralsim_tpu.models.nerf import make_sigma_fn
from neuralsim_tpu.ops.occupancy import (
    build_occupancy_grid,
    calibrate_hit_budget,
    derive_scene_bbox,
)
from neuralsim_tpu.ops.render import render_poses
from neuralsim_tpu.sampler.poses import pose_spherical

N_ALL = 8 * 400 * 400


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def slope(fn, *args, k_hi=3, reps=3):
    @jax.jit
    def rep1(*a):
        return jnp.sum(fn(*a))

    @jax.jit
    def repk(*a):
        def body(i, s):
            return jnp.sum(fn(a[0] + s.astype(a[0].dtype), *a[1:])) * 1e-24

        return jax.lax.fori_loop(0, k_hi, body, jnp.zeros((), jnp.float32))

    sync(rep1(*args))
    sync(repk(*args))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(rep1(*args))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(repk(*args))
        tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / (k_hi - 1))
    return best


def psnr(a, b):
    mse = float(np.mean((np.asarray(a) - np.asarray(b)) ** 2))
    return 10.0 * np.log10(1.0 / max(mse, 1e-12))


def main():
    net = NeRFNetConfig()
    rc = RenderConfig(ray_chunk=32768, compute_dtype="bfloat16").test_mode()
    H = W = 400
    K = np.array([[1333.3334, 0.0, 195.42932],
                  [0.0, 1334.2196, 200.6318],
                  [0.0, 0.0, 1.0]], np.float32)
    params = box_scene_params(net, jax.random.PRNGKey(0))
    models = {"coarse": params, "fine": params}
    poses = pose_spherical(jnp.linspace(0.0, 300.0, 8),
                           jnp.full((8,), -30.0), 1.01)
    sigma_fn = make_sigma_fn(params, net)
    bmin, bmax = derive_scene_bbox(sigma_fn,
                                   max(1.01 - rc.near, rc.far - 1.01))
    grid = build_occupancy_grid(sigma_fn, bmin, bmax, resolution=96,
                                threshold=1e-2, dilate=2)
    budget = calibrate_hit_budget(grid, poses, H, W, K, rc)
    print(f"budget(aabb)={budget}", flush=True)

    results = {"budget": budget}
    variants = [
        ("exact_old", dataclasses.replace(rc, fuse_pointgen=False), False),
        ("exact_march", rc, False),
        ("prod_old", dataclasses.replace(
            rc, hit_budget=budget, tighten_bounds=True,
            fuse_pointgen=False), True),
        ("prod_march", dataclasses.replace(
            rc, hit_budget=budget, tighten_bounds=True), True),
        # larger ray tiles now that per-sample HBM traffic is ~20B
        ("exact_march_c65k", dataclasses.replace(
            rc, ray_chunk=65536), False),
        ("prod_march_c65k", dataclasses.replace(
            rc, hit_budget=budget, tighten_bounds=True,
            ray_chunk=65536), True),
    ]
    imgs = {}
    for name, rcv, use_grid in variants:
        try:
            def rf(p):
                return render_poses(models, p, H, W, K, None, net, rcv,
                                    grid=grid if use_grid else None
                                    )["rgb_map"]

            dt = slope(rf, poses)
            imgs[name] = np.asarray(jax.jit(rf)(poses))
            results[name] = {"s": round(dt, 4),
                             "rays_per_s": round(N_ALL / dt)}
            print(f"{name}: {dt*1e3:.0f} ms  {N_ALL/dt/1e3:.0f}k rays/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)

    # numerics: new kernel vs old path on identical configs
    for a, b, key in [("exact_march", "exact_old", "psnr_exact"),
                      ("prod_march", "prod_old", "psnr_prod")]:
        if a in imgs and b in imgs:
            results[key] = round(psnr(imgs[a], imgs[b]), 1)
            print(f"{key}: {results[key]} dB", flush=True)

    with open("/tmp/probe_march_kernel.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
