"""Benchmark: hierarchical NeRF render throughput (rays/sec/chip).

Workload = the reference pipeline's hot loop (SURVEY.md §6): full-image
hierarchical renders at 64 coarse + 128 importance samples per ray with the
8x256 NeRF MLP pair — the per-outer-iteration image generation of Neural-Sim.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is measured rays/s against the 5M rays/s/chip north star
(BASELINE.json; the reference publishes no numbers of its own).
"""

import json
import os
import time

import jax

# persistent compile cache: repeated bench runs skip the (minutes-long on
# this relay) XLA compile
os.makedirs("/root/repo/.jax_cache", exist_ok=True)
try:
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass

import jax.numpy as jnp
import numpy as np

NORTH_STAR_RAYS_PER_SEC = 5.0e6


def main():
    from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
    from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
    from neuralsim_tpu.ops.render import render_poses
    from neuralsim_tpu.sampler.poses import pose_spherical

    net = NeRFNetConfig()
    rc = RenderConfig(
        ray_chunk=32768,
        compute_dtype="bfloat16",   # MXU fast path; f32 parity path is tested
    ).test_mode()

    H = W = 400
    K = np.array(
        [[1333.3334, 0.0, 195.42932], [0.0, 1334.2196, 200.6318], [0.0, 0.0, 1.0]],
        np.float32,
    )
    n_poses = 4

    models = init_nerf_pipeline_params(jax.random.PRNGKey(0), net, rc.n_importance)
    poses = pose_spherical(
        jnp.linspace(0.0, 300.0, n_poses), jnp.full((n_poses,), -30.0), 1.01
    )

    fn = jax.jit(lambda m, p: render_poses(m, p, H, W, K, None, net, rc)["rgb_map"])

    def run_sync():
        out = fn(models, poses)
        # some PJRT transports complete block_until_ready before execution
        # finishes; a host transfer of one element is a true barrier
        np.asarray(out[0, 0, 0])
        return out

    # warmup/compile
    out = run_sync()
    assert np.isfinite(np.asarray(out)).all()

    n_rays = n_poses * H * W
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        run_sync()
        times.append(time.perf_counter() - t0)
    dt = min(times)
    rays_per_sec = n_rays / dt

    print(json.dumps({
        "metric": "render_rays_per_sec_per_chip_400sq_64c128f",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_sec / NORTH_STAR_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
