"""Round-3 probe 2: where does the production render spend its non-MLP
time? Slope-probe the XLA glue ops standalone at production shapes
(8 poses @ 400^2, hit_budget 0.65, tighten 16 coarse + 128 importance)
against the full render. Informs which ops to restructure (merge-by-rank
instead of bitonic sort, partition instead of top_k, ...).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N_ALL = 8 * 400 * 400            # rays in the K-pose batch
N_ROUTED = int(N_ALL * 0.65)     # budget-selected rays
S_COARSE = 16
S_FINE = 128
S_ALL = S_COARSE + S_FINE


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def slope(fn, *args, k_hi=9, reps=3):
    @jax.jit
    def rep1(*a):
        return fn(*a)

    @jax.jit
    def repk(*a):
        def body(i, carry):
            out = fn(*carry)
            # feed one scalar back into the first arg to defeat CSE
            a0 = carry[0] + (jax.tree_util.tree_leaves(out)[0]
                             .reshape(-1)[0] * 1e-24).astype(carry[0].dtype)
            return (a0,) + carry[1:]

        final = jax.lax.fori_loop(0, k_hi, body, a)
        return final[0]

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

    # --- components at production shapes --------------------------------
    z16 = jnp.sort(jax.random.uniform(key, (N_ROUTED, S_COARSE), jnp.float32,
                                      0.3, 1.9), axis=-1)
    z128 = jnp.sort(jax.random.uniform(jax.random.fold_in(key, 1),
                                       (N_ROUTED, S_FINE), jnp.float32,
                                       0.3, 1.9), axis=-1)
    zcat = jnp.concatenate([z16, z128], axis=-1)

    results["sort_zall"] = slope(
        lambda z: jnp.sort(z, axis=-1), zcat)
    print(f"sort z_all [{N_ROUTED},{S_ALL}]: "
          f"{results['sort_zall']*1e3:.1f} ms", flush=True)

    # merge-by-rank alternative (both inputs sorted): position = own index
    # + comparison-count rank in the other array, then two scatters
    def merge_sorted(a, b):
        ra = jnp.sum(a[:, :, None] > b[:, None, :], axis=-1)   # [N, 16]
        rb = jnp.sum(b[:, :, None] >= a[:, None, :], axis=-1)  # [N, 128]
        ia = jnp.arange(a.shape[1]) + ra
        ib = jnp.arange(b.shape[1]) + rb
        out = jnp.zeros((a.shape[0], a.shape[1] + b.shape[1]), a.dtype)
        rows = jnp.arange(a.shape[0])[:, None]
        return out.at[rows, ia].set(a).at[rows, ib].set(b)

    m = merge_sorted(z16, z128)
    err = float(jnp.max(jnp.abs(m - jnp.sort(zcat, axis=-1))))
    results["merge_correct_err"] = err
    results["merge_by_rank"] = slope(merge_sorted, z16, z128)
    print(f"merge-by-rank: {results['merge_by_rank']*1e3:.1f} ms "
          f"(err {err:.1e})", flush=True)

    scores = jax.random.uniform(jax.random.fold_in(key, 2), (N_ALL,))
    k_sel = -(-N_ROUTED // 8) * 8
    results["topk_sel"] = slope(
        lambda s: jax.lax.top_k(s, k_sel)[1], scores)
    print(f"top_k {k_sel} of {N_ALL}: {results['topk_sel']*1e3:.1f} ms",
          flush=True)

    # partition alternative: hits to the front by cumsum-rank scatter
    def partition_sel(s):
        hit = s > 0.35
        chit = jnp.cumsum(hit.astype(jnp.int32))
        n_hit = chit[-1]
        pos = jnp.where(hit, chit - 1,
                        n_hit + jnp.cumsum((~hit).astype(jnp.int32)) - 1)
        inv = jnp.zeros((N_ALL,), jnp.int32).at[pos].set(
            jnp.arange(N_ALL, dtype=jnp.int32))
        return inv[:k_sel]

    results["partition_sel"] = slope(partition_sel, scores)
    print(f"partition: {results['partition_sel']*1e3:.1f} ms", flush=True)

    from neuralsim_tpu.ops.volume import raw2outputs, sample_pdf

    # NOTE: every big operand must be an ARGUMENT — a closed-over device
    # array is baked into the program as a constant and the relay rejects
    # >~100MB uploads (HTTP 413)
    raw = jax.random.normal(jax.random.fold_in(key, 3),
                            (N_ROUTED, S_ALL, 4))
    rays_d = jax.random.normal(jax.random.fold_in(key, 4), (N_ROUTED, 3))
    results["raw2outputs"] = slope(
        lambda r, z, rd: raw2outputs(r, z, rd)[0], raw, m, rays_d)
    print(f"raw2outputs: {results['raw2outputs']*1e3:.1f} ms", flush=True)

    w = jax.random.uniform(jax.random.fold_in(key, 5),
                           (N_ROUTED, S_COARSE - 2)) + 0.01
    zmid = 0.5 * (z16[:, 1:] + z16[:, :-1])
    results["sample_pdf"] = slope(
        lambda ww, zm: sample_pdf(None, zm, ww, S_FINE, det=True), w, zmid)
    print(f"sample_pdf: {results['sample_pdf']*1e3:.1f} ms", flush=True)

    # gather/scatter of the culled routing
    maps = jax.random.normal(jax.random.fold_in(key, 6), (N_ALL, 3))
    sel = jnp.arange(k_sel, dtype=jnp.int32)
    results["route_scatter"] = slope(
        lambda mm, ss: mm.at[ss].set(mm[:k_sel] * 1.0001), maps, sel)
    print(f"route scatter: {results['route_scatter']*1e3:.1f} ms", flush=True)

    # occupancy probe (grid lookup over 64 coarse samples x all rays)
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

    results["occ_probe"] = slope(probe_occ, ro, rd)
    print(f"occ probe: {results['occ_probe']*1e3:.1f} ms", flush=True)

    # --- full production + exact render reference points ----------------
    import dataclasses

    import sys
    sys.path.insert(0, "/root/repo")
    from bench import box_scene_params
    from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
    from neuralsim_tpu.models.nerf import make_sigma_fn
    from neuralsim_tpu.ops.occupancy import calibrate_hit_budget
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
    sgrid = build_occupancy_grid(
        make_sigma_fn(params, net), bbox_min=(-0.4,) * 3,
        bbox_max=(0.4,) * 3, resolution=96, threshold=1e-2, dilate=2)
    budget = calibrate_hit_budget(sgrid, poses, H, W, K, rc)
    rc_prod = dataclasses.replace(rc, hit_budget=budget, tighten_bounds=True)

    def prod(p):
        return render_poses(models, p, H, W, K, None, net, rc_prod,
                            grid=sgrid)["rgb_map"]

    def exact(p):
        return render_poses(models, p, H, W, K, None, net, rc)["rgb_map"]

    results["render_prod"] = slope(prod, poses, k_hi=3)
    print(f"production render: {results['render_prod']*1e3:.1f} ms "
          f"({N_ALL/results['render_prod']/1e3:.0f}k rays/s)", flush=True)
    results["render_exact"] = slope(exact, poses, k_hi=3)
    print(f"exact render: {results['render_exact']*1e3:.1f} ms "
          f"({N_ALL/results['render_exact']/1e3:.0f}k rays/s)", flush=True)

    with open("/tmp/probe_render_phases.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
