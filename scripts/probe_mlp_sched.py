"""Round-3 probe 1: MLP kernel scheduling on the real chip.

Hypothesis (VERDICT r2 #2): the wide-lane-PE fused MLP sits at ~45% MFU
because per-layer VPU work (bias+relu epilogue, PE sin) serializes against
the MXU — the layer-(i+1) matmul depends on the layer-i epilogue. Splitting
the point tile into n_sub independent row-halves exposes instruction-level
parallelism: sub B's matmul has no dependence on sub A's epilogue, so
Mosaic's scheduler can overlap VPU and MXU.

All variants interleaved in ONE process, iteration-slope probes (k reps in
one program with data feedback; (t_k - t_1)/(k-1) cancels the ~200ms relay
latency). See .claude/skills/verify/SKILL.md.
"""

import functools
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from neuralsim_tpu.config import NeRFNetConfig
from neuralsim_tpu.kernels import raymarch as rm
from neuralsim_tpu.models.nerf import init_nerf_params

FLOPS_PER_PT = 2 * (64 * 256 + 7 * 256 * 256 + 64 * 256 + 256 * 256 + 256
                    + 288 * 128 + 128 * 3)  # ~1.189 MF (widepe padded shapes)


# --------------------------------------------------------------------- #
# experimental kernel: n_sub interleaved row-halves
# --------------------------------------------------------------------- #

def _mlp_widepe_sub_kernel(pts_ref, dirs_ref,
                           selx_ref, freqx_ref, phasex_ref, maskx_ref,
                           seld_ref, freqd_ref, phased_ref, maskd_ref,
                           *refs, depth, skips, p_x, p_d,
                           compute_dtype, fast_epilogue, n_sub, ts):
    out_ref = refs[-1]
    wrefs = refs[:-1]
    idx = 0

    def nxt():
        nonlocal idx
        k, b = wrefs[idx], wrefs[idx + 1]
        idx += 2
        return k, b

    def epilogue(acc, b):
        if fast_epilogue:
            return jnp.maximum(acc.astype(compute_dtype)
                               + b[:].astype(compute_dtype), 0.0)
        return jnp.maximum(acc + b[:].astype(jnp.float32),
                           0.0).astype(compute_dtype)

    cd = compute_dtype
    pe_x = [rm._wide_pe(pts_ref[j * ts:(j + 1) * ts], selx_ref, freqx_ref,
                        phasex_ref, maskx_ref, cd) for j in range(n_sub)]
    pe_d = [rm._wide_pe(dirs_ref[j * ts:(j + 1) * ts], seld_ref, freqd_ref,
                        phased_ref, maskd_ref, cd) for j in range(n_sub)]

    h = [None] * n_sub
    for i in range(depth):
        k, b = nxt()
        kc = k[:].astype(cd)
        for j in range(n_sub):
            if i == 0:
                acc = jnp.dot(pe_x[j], kc,
                              preferred_element_type=jnp.float32)
            elif (i - 1) in skips:
                acc = jnp.dot(pe_x[j], kc[:p_x],
                              preferred_element_type=jnp.float32)
                acc += jnp.dot(h[j], kc[p_x:],
                               preferred_element_type=jnp.float32)
            else:
                acc = jnp.dot(h[j], kc, preferred_element_type=jnp.float32)
            h[j] = epilogue(acc, b)

    fk, fb = nxt()
    ak, ab = nxt()
    vk, vb = nxt()
    rk, rb = nxt()
    fkc, akc, vkc, rkc = (fk[:].astype(cd), ak[:].astype(cd),
                          vk[:].astype(cd), rk[:].astype(cd))
    for j in range(n_sub):
        alpha = jnp.dot(h[j], akc, preferred_element_type=jnp.float32)
        alpha += ab[:].astype(jnp.float32)
        feature = jnp.dot(h[j], fkc, preferred_element_type=jnp.float32)
        feature = (feature + fb[:].astype(jnp.float32)).astype(cd)
        width = feature.shape[-1]
        hv = jnp.dot(feature, vkc[:width], preferred_element_type=jnp.float32)
        hv += jnp.dot(pe_d[j], vkc[width:], preferred_element_type=jnp.float32)
        hv = epilogue(hv, vb)
        rgb = jnp.dot(hv, rkc, preferred_element_type=jnp.float32)
        rgb += rb[:].astype(jnp.float32)
        out_ref[j * ts:(j + 1) * ts] = jnp.concatenate(
            [rgb, alpha], axis=-1).astype(out_ref.dtype)


def fused_forward_sub(params, pts, dirs, net, compute_dtype=jnp.bfloat16,
                      tile=8192, n_sub=2, fast_epilogue=False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    depth = sum(1 for k in params
                if k.startswith("pts_") and k.endswith("kernel"))
    assert n % tile == 0 and tile % n_sub == 0
    in_ch = 3 * (1 + 2 * net.multires)
    p_x = rm._round_up(in_ch, 64)
    p_d = rm._round_up(3 * (1 + 2 * net.multires_views), 32)
    pe_consts = [jnp.asarray(c)
                 for c in rm._wide_pe_consts(3, net.multires, p_x)
                 ] + [jnp.asarray(c)
                      for c in rm._wide_pe_consts(3, net.multires_views, p_d)]
    weights = [w.astype(compute_dtype)
               for w in rm._wide_param_list(params, depth, tuple(net.skips),
                                            in_ch, p_x, p_d)]
    grid = (n // tile,)
    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(rm._zero_index, c.ndim),
                     memory_space=pltpu.VMEM)
        for c in pe_consts
    ]
    w_specs = [
        pl.BlockSpec(w.shape, functools.partial(rm._zero_index, w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kernel = functools.partial(
        _mlp_widepe_sub_kernel, depth=depth, skips=tuple(net.skips),
        p_x=p_x, p_d=p_d, compute_dtype=compute_dtype,
        fast_epilogue=fast_epilogue, n_sub=n_sub, ts=tile // n_sub,
    )
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *const_specs,
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 4), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts, dirs, *pe_consts, *weights)


# --------------------------------------------------------------------- #
# bare matmul chain ceiling
# --------------------------------------------------------------------- #

def bare_chain(x, ws, tile=8192):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def kern(x_ref, *refs):
        out_ref = refs[-1]
        h = x_ref[:]
        for w in refs[:-1]:
            h = jnp.dot(h, w[:], preferred_element_type=jnp.float32
                        ).astype(jnp.bfloat16)
        out_ref[:] = h.astype(jnp.float32)

    n = x.shape[0]
    return pl.pallas_call(
        kern,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)] +
                 [pl.BlockSpec(w.shape, functools.partial(rm._zero_index, 2),
                               memory_space=pltpu.VMEM) for w in ws],
        out_specs=pl.BlockSpec((tile, 256), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, 256), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x, *ws)


# --------------------------------------------------------------------- #
# slope probe
# --------------------------------------------------------------------- #

def make_repeat(fn, pts, dirs, k):
    @jax.jit
    def run(p, d):
        def body(i, carry):
            pp, acc = carry
            out = fn(pp, d)
            return (p + out[0, 0] * 1e-24, acc + out[0, 0])

        _, acc = jax.lax.fori_loop(0, k, body, (p, jnp.float32(0.0)))
        return acc

    return run


def sync(x):
    return float(np.asarray(x))


def slope(fn, pts, dirs, k_hi=25, reps=3):
    r1 = make_repeat(fn, pts, dirs, 1)
    rk = make_repeat(fn, pts, dirs, k_hi)
    sync(r1(pts, dirs))  # compile
    sync(rk(pts, dirs))
    best = 1e30
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(r1(pts, dirs))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        sync(rk(pts, dirs))
        tk = time.perf_counter() - t0
        best = min(best, (tk - t1) / (k_hi - 1))
    return best


def main():
    net = NeRFNetConfig()
    params = init_nerf_params(jax.random.PRNGKey(0), net)
    n = 1 << 21  # 2M points
    key = jax.random.PRNGKey(1)
    pts = jax.random.uniform(key, (n, 3), jnp.float32, -0.5, 0.5)
    dirs = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True)

    results = {}

    # correctness gate for the subtile variant vs the shipped kernel
    ref_out = rm._fused_forward_widepe(params, pts[:16384], dirs[:16384], net)
    sub_out = fused_forward_sub(params, pts[:16384], dirs[:16384], net,
                                tile=8192, n_sub=2)
    err = float(jnp.max(jnp.abs(ref_out - sub_out)))
    results["subtile_max_abs_err"] = err
    print(f"subtile correctness: max abs err {err:.2e}", flush=True)

    variants = [
        ("ship_t4096", lambda p, d: rm._fused_forward_widepe(
            params, p, d, net, tile=4096)),
        ("ship_t8192", lambda p, d: rm._fused_forward_widepe(
            params, p, d, net, tile=8192)),
        ("ship_t16384", lambda p, d: rm._fused_forward_widepe(
            params, p, d, net, tile=16384)),
        ("ship_t8192_fastep", lambda p, d: rm._fused_forward_widepe(
            params, p, d, net, tile=8192, fast_epilogue=True)),
        ("sub2_t8192", lambda p, d: fused_forward_sub(
            params, p, d, net, tile=8192, n_sub=2)),
        ("sub2_t16384", lambda p, d: fused_forward_sub(
            params, p, d, net, tile=16384, n_sub=2)),
        ("sub4_t16384", lambda p, d: fused_forward_sub(
            params, p, d, net, tile=16384, n_sub=4)),
        ("sub2_t8192_fastep", lambda p, d: fused_forward_sub(
            params, p, d, net, tile=8192, n_sub=2, fast_epilogue=True)),
        ("sub2_t16384_fastep", lambda p, d: fused_forward_sub(
            params, p, d, net, tile=16384, n_sub=2, fast_epilogue=True)),
        ("sub4_t16384_fastep", lambda p, d: fused_forward_sub(
            params, p, d, net, tile=16384, n_sub=4, fast_epilogue=True)),
    ]

    for name, fn in variants:
        try:
            dt = slope(fn, pts, dirs)
            tf = n * FLOPS_PER_PT / dt / 1e12
            results[name] = {"s_per_call": dt, "tf_per_s": round(tf, 1)}
            print(f"{name}: {dt*1e3:.2f} ms/call  {tf:.1f} TF/s", flush=True)
        except Exception as e:  # noqa: BLE001
            results[name] = {"error": str(e)[:300]}
            print(f"{name}: FAILED {str(e)[:200]}", flush=True)

    # bare chain ceiling (8 matmuls, no epilogue/PE/heads)
    ws = [jax.random.normal(jax.random.fold_in(key, i), (256, 256),
                            jnp.bfloat16) * 0.05 for i in range(8)]
    x256 = jax.random.normal(key, (n, 256), jnp.bfloat16)

    def chain_fn(xx, d):
        return bare_chain(xx.astype(jnp.bfloat16), ws, tile=8192)

    try:
        dt = slope(chain_fn, x256.astype(jnp.float32), None)
        tf = n * 2 * 8 * 256 * 256 / dt / 1e12
        results["bare_chain"] = {"s_per_call": dt, "tf_per_s": round(tf, 1)}
        print(f"bare_chain: {dt*1e3:.2f} ms/call  {tf:.1f} TF/s", flush=True)
    except Exception as e:  # noqa: BLE001
        results["bare_chain"] = {"error": str(e)[:300]}
        print(f"bare_chain: FAILED {str(e)[:200]}", flush=True)

    with open("/tmp/probe_mlp_sched.json", "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
