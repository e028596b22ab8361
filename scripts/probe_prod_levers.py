"""Round-4 probe: the two new production levers on hardware (VERDICT r3 #1).

Ladder measured on the bench box scene at 400^2, 8 poses:
  - prod_ic64        round-3 headline (cull+tighten, 16c+64f, re-march all)
  - reuse_ic{64,48,32}  coarse-raw reuse: fine net marches ONLY the
                     importance samples; composite merges coarse raws
                     (rc.reuse_coarse)
  - single{96,64,48} single-pass grid-guided: one uniform march inside the
                     tightened z-interval, no coarse/fine split
                     (n_importance_culled=0, n_samples_culled=N)
Each point reports slope-probed throughput + PSNR vs the exact render;
the >40dB guard decides what ships as the bench headline.
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
    build_scene_grid,
    calibrate_hit_budget,
    scene_half_extent,
)
from neuralsim_tpu.ops.render import render_poses
from neuralsim_tpu.sampler.poses import pose_spherical

N_ALL = 8 * 400 * 400


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def slope(fn, *args, k_hi=4, reps=3):
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
    grid = build_scene_grid(
        sigma_fn, scene_half_extent(1.01, rc.far, H, W, K),
        resolution=96, threshold=1e-2, dilate=2,
    )
    budget = calibrate_hit_budget(grid, poses, H, W, K, rc)
    print(f"budget(aabb)={budget}", flush=True)

    results = {"budget": budget}

    def rf_exact(p):
        return render_poses(models, p, H, W, K, None, net, rc)["rgb_map"]

    exact_img = np.asarray(jax.jit(rf_exact)(poses))

    base = dataclasses.replace(rc, hit_budget=budget, tighten_bounds=True)
    variants = [("prod_ic64", dataclasses.replace(base,
                                                  n_importance_culled=64))]
    for ic in (64, 48, 32):
        variants.append((f"reuse_ic{ic}", dataclasses.replace(
            base, n_importance_culled=ic, reuse_coarse=True)))
    for ns in (96, 64, 48):
        variants.append((f"single{ns}", dataclasses.replace(
            base, n_importance_culled=0, n_samples_culled=ns)))

    for name, rcv in variants:
        try:
            def rf(p, rcv=rcv):
                return render_poses(models, p, H, W, K, None, net, rcv,
                                    grid=grid)["rgb_map"]

            dt = slope(rf, poses)
            img = np.asarray(jax.jit(rf)(poses))
            db = psnr(img, exact_img)
            results[name] = {"s": round(dt, 4),
                             "rays_per_s": round(N_ALL / dt),
                             "psnr_vs_exact": round(db, 1)}
            print(f"{name}: {dt*1e3:.0f} ms  {N_ALL/dt/1e3:.0f}k rays/s  "
                  f"{db:.1f} dB", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)

    with open("/tmp/probe_prod_levers.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
