"""Round-3 probe 2b: remaining render-phase components + the single-tile
(big ray_chunk) production variant. Slope probes with a SCALAR feedback
carry (probe 2's full-array carry allocated k copies of a 1.9GB operand).

Already measured (probe 2, /tmp/probe2.log): sort z_all 37ms,
merge-by-rank 977ms (loser), top_k 1.7ms, partition 5.4ms.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ALL = 8 * 400 * 400
N_ROUTED = int(N_ALL * 0.65)
S_COARSE = 16
S_FINE = 128
S_ALL = S_COARSE + S_FINE


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def slope(fn, *args, k_hi=9, reps=3):
    # reduce with a SUM (not a one-element slice): a slice would let XLA
    # dead-code-eliminate the rest of the computation
    @jax.jit
    def rep1(*a):
        return jnp.sum(jax.tree_util.tree_leaves(fn(*a))[0])

    @jax.jit
    def repk(*a):
        def body(i, s):
            out = fn(a[0] + s.astype(a[0].dtype), *a[1:])
            return jnp.sum(jax.tree_util.tree_leaves(out)[0]) * 1e-24

        return jax.lax.fori_loop(0, k_hi, body, jnp.zeros((), a[0].dtype))

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


def main():
    key = jax.random.PRNGKey(0)
    results = {}

    from neuralsim_tpu.ops.volume import raw2outputs, sample_pdf

    nh = N_ROUTED // 2
    z16 = jnp.sort(jax.random.uniform(key, (nh, S_COARSE), jnp.float32,
                                      0.3, 1.9), axis=-1)
    zall = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1),
                                       (nh, S_ALL), jnp.float32, 0.3, 1.9),
                    axis=-1)
    raw = jax.random.normal(jax.random.fold_in(key, 3), (nh, S_ALL, 4))
    rays_d = jax.random.normal(jax.random.fold_in(key, 4), (nh, 3))

    dt = slope(lambda r, z, rd: raw2outputs(r, z, rd)[0], raw, zall, rays_d,
               k_hi=5)
    results["raw2outputs_x2"] = dt * 2
    print(f"raw2outputs (x2 scaled): {dt*2e3:.1f} ms", flush=True)

    w = jax.random.uniform(jax.random.fold_in(key, 5),
                           (nh, S_COARSE - 2)) + 0.01
    zmid = 0.5 * (z16[:, 1:] + z16[:, :-1])
    dt = slope(lambda ww, zm: sample_pdf(None, zm, ww, S_FINE, det=True),
               w, zmid, k_hi=5)
    results["sample_pdf_x2"] = dt * 2
    print(f"sample_pdf (x2 scaled): {dt*2e3:.1f} ms", flush=True)

    maps = jax.random.normal(jax.random.fold_in(key, 6), (N_ALL, 3))
    k_sel = -(-N_ROUTED // 8) * 8
    sel = jnp.arange(k_sel, dtype=jnp.int32)
    dt = slope(lambda mm, ss: mm.at[ss].set(mm[:k_sel] * 1.0001), maps, sel)
    results["route_scatter"] = dt
    print(f"route scatter: {dt*1e3:.1f} ms", flush=True)

    from neuralsim_tpu.ops.occupancy import build_occupancy_grid, grid_lookup

    grid = build_occupancy_grid(
        lambda p: jnp.maximum(0.2 - jnp.linalg.norm(p, axis=-1), 0.0) * 100,
        bbox_min=(-0.4,) * 3, bbox_max=(0.4,) * 3, resolution=96)
    ro = jax.random.normal(jax.random.fold_in(key, 7), (N_ALL, 3)) * 0.01
    rd = jax.random.normal(jax.random.fold_in(key, 8), (N_ALL, 3))
    rd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z64 = jnp.linspace(0.3, 1.9, 64)

    def probe_occ(o, d):
        pts = o[:, None, :] + d[:, None, :] * z64[None, :, None]
        return jnp.sum(grid_lookup(grid, pts), axis=-1)

    dt = slope(probe_occ, ro, rd, k_hi=5)
    results["occ_probe"] = dt
    print(f"occ probe: {dt*1e3:.1f} ms", flush=True)

    # --- full renders: shipped chunking vs single tile -------------------
    import dataclasses
    import sys
    sys.path.insert(0, "/root/repo")
    from bench import box_scene_params
    from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
    from neuralsim_tpu.models.nerf import make_sigma_fn
    from neuralsim_tpu.ops.occupancy import (
        calibrate_hit_budget,
        derive_scene_bbox,
    )
    from neuralsim_tpu.ops.render import render_poses
    from neuralsim_tpu.sampler.poses import pose_spherical

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
    sgrid = build_occupancy_grid(sigma_fn, bmin, bmax, resolution=96,
                                 threshold=1e-2, dilate=2)
    budget = calibrate_hit_budget(sgrid, poses, H, W, K, rc)
    print(f"bbox {np.asarray(bmin)}..{np.asarray(bmax)} budget {budget}",
          flush=True)

    variants = [
        ("prod_c32k", dataclasses.replace(rc, hit_budget=budget,
                                          tighten_bounds=True), True),
        ("prod_big", dataclasses.replace(rc, hit_budget=budget,
                                         tighten_bounds=True,
                                         ray_chunk=10 ** 9), True),
        ("prod_c131k", dataclasses.replace(rc, hit_budget=budget,
                                           tighten_bounds=True,
                                           ray_chunk=131072), True),
        ("exact_c32k", rc, False),
        ("exact_c131k", dataclasses.replace(rc, ray_chunk=131072), False),
        ("prod_big_fused", dataclasses.replace(
            rc, hit_budget=budget, tighten_bounds=True, ray_chunk=10 ** 9,
            fuse_compositing=True), True),
    ]
    for name, rcv, use_grid in variants:
        try:
            def render_fn(p):
                return render_poses(models, p, H, W, K, None, net, rcv,
                                    grid=sgrid if use_grid else None
                                    )["rgb_map"]

            dt = slope(render_fn, poses, k_hi=3)
            results[name] = {"s": dt, "rays_per_s": round(N_ALL / dt, 0)}
            print(f"{name}: {dt*1e3:.0f} ms  "
                  f"{N_ALL/dt/1e3:.0f}k rays/s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:200]}
            print(f"{name}: FAILED {str(e)[:150]}", flush=True)

    with open("/tmp/probe_render_phases2.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
