"""Round-3 probe 5: standalone MFU of the transposed march kernel.

Slope-probes fused_nerf_march (pointgen+PE+MLP) TF/s at the query across
tile sizes and epilogue modes, vs the point-major widepe kernel and the
bare 8-layer matmul chain ceiling (measured 136 TF/s round 3). Also
validates fast_epilogue numerics (max|delta| on raw sigma/rgb).
"""

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
from neuralsim_tpu.config import NeRFNetConfig
from neuralsim_tpu.kernels import raymarch as rm

N, S = 16384, 64          # 1.05M points per call
net = NeRFNetConfig()


def mlp_flops_per_point(p_x=128, p_d=32):
    w = net.netwidth
    macs = p_x * w + 6 * w * w + (p_x + w) * w + w * w + w \
        + (w + p_d) * (w // 2) + (w // 2) * 3
    return 2 * macs


def sync(x):
    return float(np.asarray(jax.tree_util.tree_leaves(x)[0].reshape(-1)[0]))


def slope(fn, *args, k_hi=3, reps=3):
    @jax.jit
    def rep1(*a):
        return jnp.sum(fn(*a)[0])

    @jax.jit
    def repk(*a):
        def body(i, s):
            return jnp.sum(fn(a[0] + s.astype(a[0].dtype), *a[1:])[0]) * 1e-24

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


def main():
    params = box_scene_params(net, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    ro = jnp.asarray(rng.randn(N, 3).astype(np.float32)) * 0.1
    rd = jnp.asarray(rng.randn(N, 3).astype(np.float32))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jnp.asarray(
        0.3 + 1.6 * rng.rand(N, S).astype(np.float32)), axis=-1)

    total_flop = N * S * mlp_flops_per_point()
    results = {"points": N * S, "flop_per_point": mlp_flops_per_point()}

    variants = [
        ("march_t4096", dict(target_tile=4096)),
        ("march_t2048", dict(target_tile=2048)),
        ("march_t8192", dict(target_tile=8192)),
        ("march_t16384", dict(target_tile=16384)),
        ("march_t4096_fastep", dict(target_tile=4096, fast_epilogue=True)),
        ("march_t8192_fastep", dict(target_tile=8192, fast_epilogue=True)),
    ]
    outs = {}
    for name, kw in variants:
        try:
            def f(o, d, v, zz, kw=kw):
                return rm._fused_march_channels(params, o, d, v, zz, net,
                                                jnp.bfloat16, **kw)

            dt = slope(f, ro, rd, vd, z)
            outs[name] = jax.jit(f)(ro, rd, vd, z)
            results[name] = {"s": round(dt, 4),
                             "tf_s": round(total_flop / dt / 1e12, 1)}
            print(f"{name}: {dt*1e3:.1f} ms  {total_flop/dt/1e12:.1f} TF/s",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:160]}
            print(f"{name}: FAILED {str(e)[:160]}", flush=True)

    # point-major comparator on the same points
    try:
        pts = (ro[:, None, :] + rd[:, None, :] * z[..., None]).reshape(-1, 3)
        dirs = jnp.broadcast_to(vd[:, None, :], (N, S, 3)).reshape(-1, 3)

        def g(p, d):
            return (rm.fused_nerf_mlp_widepe(params, p, d, net,
                                             jnp.bfloat16),)

        dt = slope(g, pts, dirs)
        results["widepe_t4096"] = {"s": round(dt, 4),
                                   "tf_s": round(total_flop / dt / 1e12, 1)}
        print(f"widepe_t4096: {dt*1e3:.1f} ms "
              f"{total_flop/dt/1e12:.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        results["widepe_t4096"] = {"error": str(e)[:160]}
        print(f"widepe_t4096: FAILED {str(e)[:160]}", flush=True)

    # fast_epilogue numerics vs the f32 epilogue
    if "march_t4096" in outs and "march_t4096_fastep" in outs:
        s0, c0 = outs["march_t4096"]
        s1, c1 = outs["march_t4096_fastep"]
        results["fastep_max_dsigma"] = float(
            jnp.max(jnp.abs(s0 - s1)))
        results["fastep_max_drgb"] = float(jnp.max(jnp.abs(c0 - c1)))
        print("fastep max|dsigma|=%.4g max|drgb|=%.4g" %
              (results["fastep_max_dsigma"], results["fastep_max_drgb"]),
              flush=True)

    with open("/tmp/probe_march_mfu.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
