"""Pallas TPU kernel: fused NeRF MLP over point tiles.

Why: profiled on v5e, the XLA path spends ~60ms per 2M-point coarse pass —
~5x the pure-matmul compute time — because every one of the 8+4 layers
round-trips a [N, 256] activation through HBM. This kernel runs the WHOLE
MLP for a tile of points with activations resident in VMEM: per tile, HBM
traffic is one [T, 90] read + one [T, 4] write + the (shared, ~1MB bf16)
weights.

Design notes:
  - weights are passed as whole-array VMEM operands (constant index map);
    all 12 layers total ~2.2MB f32 — far under the 16MB VMEM budget
  - the skip concat (reference run_nerf_helpers.py:105-106: layer 5 input is
    [x_pe, h]) is algebraically split into two matmuls
    h @ W[63:] + x_pe @ W[:63] — no in-kernel concatenation needed
  - the viewdir head's concat (feature, d_pe) splits the same way
  - matmuls run in bf16 with float32 accumulation (preferred_element_type)
  - backward: custom_vjp recomputes via the reference jnp path
    (models.nerf.nerf_apply), so gradients are exact w.r.t. the
    differentiable pipeline while the hot no-grad render path stays fused
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from neuralsim_tpu.config import NeRFNetConfig


def pallas_available() -> bool:
    try:
        from jax.experimental import pallas as pl  # noqa: F401
        from jax.experimental.pallas import tpu as pltpu  # noqa: F401

        return jax.default_backend() == "tpu"
    except Exception:
        return False


def _matmul_precision(compute_dtype):
    """Trace-time matmul precision scope for a given compute dtype.

    On TPU the DEFAULT precision for f32 dot operands is a single bf16 MXU
    pass; f32 compute mode exists as the exactness/parity path, so it must
    request true-f32 passes explicitly. Without this, the kernel and the
    XLA reference accumulate default-precision error differently through
    the 13 chained matmuls and drift past the 2e-3 parity tolerance —
    caught by the on-device gate (tests_tpu) the first time it ran on real
    hardware. bf16 mode is untouched (single-pass either way).
    """
    import contextlib

    if jnp.dtype(compute_dtype) == jnp.float32:
        return jax.default_matmul_precision("highest")
    return contextlib.nullcontext()


def _with_matmul_precision(kernel_fn):
    """Wrap a Pallas kernel body so every precision-unannotated jnp.dot it
    binds while TRACING picks up the f32-true precision when
    compute_dtype=float32 (jnp resolves precision=None against the config
    default at bind time, so the scope must be live during tracing)."""

    @functools.wraps(kernel_fn)
    def wrapped(*args, compute_dtype, **kwargs):
        with _matmul_precision(compute_dtype):
            return kernel_fn(*args, compute_dtype=compute_dtype, **kwargs)

    return wrapped


def _pe_matmul(x, kernel_ref, n_freqs: int, compute_dtype, row0: int = 0):
    """y = PE(x) @ W without materializing PE(x).

    PE row layout in W matches ops.encoding ([x, sin 2^0 x, cos 2^0 x, ...]),
    so the product decomposes into 2*n_freqs+1 skinny [T,3]@[3,out] matmuls
    accumulated in f32 — the encoding lives entirely in registers/VMEM.
    ``row0`` offsets into the kernel (used for the viewdir slice of the
    views layer).

    MEASURED (v5e, round 1): this decomposition is a LOSS — 21 K=3 matmuls
    starve the MXU and the full render drops to 53k rays/s vs 207k for the
    XLA path. Kept as a correct reference; a winning PE fusion needs the
    encoding built as one [T, 64]-lane tile (single wide matmul), which
    requires a lane-concat/reshape Mosaic currently makes expensive.
    """
    cd = compute_dtype
    acc = jnp.dot(x.astype(cd), kernel_ref[row0: row0 + 3].astype(cd),
                  preferred_element_type=jnp.float32)
    for k in range(n_freqs):
        xb = x * (2.0 ** k)
        r = row0 + 3 + 6 * k
        acc += jnp.dot(jnp.sin(xb).astype(cd),
                       kernel_ref[r: r + 3].astype(cd),
                       preferred_element_type=jnp.float32)
        acc += jnp.dot(jnp.cos(xb).astype(cd),
                       kernel_ref[r + 3: r + 6].astype(cd),
                       preferred_element_type=jnp.float32)
    return acc


@_with_matmul_precision
def _mlp_pe_kernel(pts_ref, dirs_ref, *refs, depth: int, skips,
                   n_freqs_x: int, n_freqs_d: int, compute_dtype):
    """Whole NeRF MLP with the positional encodings fused into the first
    matmul of each consumer: inputs are raw [T,3] points + dirs."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    idx = 0

    def nxt():
        nonlocal idx
        k, b = wrefs[idx], wrefs[idx + 1]
        idx += 2
        return k, b

    cd = compute_dtype
    x = pts_ref[:]
    d = dirs_ref[:]
    in_ch = 3 + 6 * n_freqs_x

    h = None
    for i in range(depth):
        k, b = nxt()
        if i == 0:
            acc = _pe_matmul(x, k, n_freqs_x, cd)
        elif (i - 1) in skips:
            acc = _pe_matmul(x, k, n_freqs_x, cd)
            acc += jnp.dot(h, k[in_ch:].astype(cd),
                           preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(h, k[:].astype(cd), preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + b[:].astype(jnp.float32), 0.0).astype(cd)

    fk, fb = nxt()
    ak, ab = nxt()
    vk, vb = nxt()
    rk, rb = nxt()

    alpha = jnp.dot(h, ak[:].astype(cd), preferred_element_type=jnp.float32)
    alpha += ab[:].astype(jnp.float32)
    feature = jnp.dot(h, fk[:].astype(cd), preferred_element_type=jnp.float32)
    feature = (feature + fb[:].astype(jnp.float32)).astype(cd)

    width = feature.shape[-1]
    hv = jnp.dot(feature, vk[:width].astype(cd),
                 preferred_element_type=jnp.float32)
    hv += _pe_matmul(d, vk, n_freqs_d, cd, row0=width)
    hv = jnp.maximum(hv + vb[:].astype(jnp.float32), 0.0).astype(cd)

    rgb = jnp.dot(hv, rk[:].astype(cd), preferred_element_type=jnp.float32)
    rgb += rb[:].astype(jnp.float32)

    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1).astype(out_ref.dtype)


@_with_matmul_precision
def _mlp_kernel(x_ref, d_ref, *refs, depth: int, skips, compute_dtype):
    """refs layout: pts kernels/biases (depth pairs), feature, alpha,
    views_0, rgb pairs, then out_ref last."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    idx = 0

    def nxt():
        nonlocal idx
        k, b = wrefs[idx], wrefs[idx + 1]
        idx += 2
        return k, b

    cd = compute_dtype
    x = x_ref[:].astype(cd)
    d = d_ref[:].astype(cd)

    h = None
    for i in range(depth):
        k, b = nxt()
        if i == 0:
            acc = jnp.dot(x, k[:].astype(cd), preferred_element_type=jnp.float32)
        elif (i - 1) in skips:
            # previous layer output was concat([x_pe, h]) in the reference;
            # split the matmul instead of concatenating
            in_ch = x.shape[-1]
            acc = jnp.dot(x, k[:in_ch].astype(cd),
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(h, k[in_ch:].astype(cd),
                           preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(h, k[:].astype(cd), preferred_element_type=jnp.float32)
        h = jnp.maximum(acc + b[:].astype(jnp.float32), 0.0).astype(cd)

    fk, fb = nxt()
    ak, ab = nxt()
    vk, vb = nxt()
    rk, rb = nxt()

    # if the last layer index is in skips the head consumes [x_pe, h];
    # reference nets never do this (skips=(4,), depth 8) but keep it correct
    alpha = jnp.dot(h, ak[:].astype(cd), preferred_element_type=jnp.float32)
    alpha += ab[:].astype(jnp.float32)
    feature = jnp.dot(h, fk[:].astype(cd), preferred_element_type=jnp.float32)
    feature = (feature + fb[:].astype(jnp.float32)).astype(cd)

    width = feature.shape[-1]
    hv = jnp.dot(feature, vk[:width].astype(cd),
                 preferred_element_type=jnp.float32)
    hv += jnp.dot(d, vk[width:].astype(cd), preferred_element_type=jnp.float32)
    hv = jnp.maximum(hv + vb[:].astype(jnp.float32), 0.0).astype(cd)

    rgb = jnp.dot(hv, rk[:].astype(cd), preferred_element_type=jnp.float32)
    rgb += rb[:].astype(jnp.float32)

    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1).astype(out_ref.dtype)


def _param_list(params: Dict, depth: int):
    seq = []
    for i in range(depth):
        seq += [params[f"pts_{i}_kernel"], params[f"pts_{i}_bias"]]
    seq += [params["feature_kernel"], params["feature_bias"],
            params["alpha_kernel"], params["alpha_bias"],
            params["views_0_kernel"], params["views_0_bias"],
            params["rgb_kernel"], params["rgb_bias"]]
    # biases as [1, W]: TPU tiling wants >=2D operands, and [1, W] broadcasts
    # against [T, W] activations inside the kernel
    return [w if w.ndim == 2 else w.reshape(1, -1) for w in seq]


def _zero_index(ndim, i):
    return (0,) * ndim


def _fused_forward(params: Dict, x_pe, d_pe, net: NeRFNetConfig,
                   compute_dtype=jnp.bfloat16, tile: int = 2048,
                   interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = x_pe.shape[0]
    depth = sum(1 for k in params if k.startswith("pts_") and k.endswith("kernel"))
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        x_pe = jnp.pad(x_pe, ((0, n_pad - n), (0, 0)))
        d_pe = jnp.pad(d_pe, ((0, n_pad - n), (0, 0)))

    # ship operands at compute precision: halves VMEM footprint and HBM
    # traffic; accumulation stays f32 inside the kernel
    x_pe = x_pe.astype(compute_dtype)
    d_pe = d_pe.astype(compute_dtype)
    weights = [w.astype(compute_dtype) for w in _param_list(params, depth)]
    grid = (n_pad // tile,)

    w_specs = [
        # bind ndim now: a bare `w.ndim` in the lambda would late-bind to the
        # comprehension's final element
        pl.BlockSpec(w.shape, functools.partial(_zero_index, w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kernel = functools.partial(
        _mlp_kernel, depth=depth, skips=tuple(net.skips),
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, x_pe.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d_pe.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(x_pe, d_pe, *weights)
    return out[:n]


def _fused_forward_pe(params: Dict, pts, dirs, net: NeRFNetConfig,
                      compute_dtype=jnp.bfloat16, tile: int | None = None,
                      interpret: bool = False):
    """PE-fused variant: raw [N,3] points/dirs in, [N,4] out — the encoding
    never touches HBM."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    if tile is None:
        # f32 live values are 2x bf16 AND the 2026-08 libtpu Mosaic
        # register allocator spills this kernel's f32 activations to
        # scoped vmem (186M of spill slots at tile 4096 — over the 128M
        # device budget; caught by tests_tpu after the backend upgrade).
        # Halving the tile keeps the spill set inside the budget.
        tile = 4096 if compute_dtype == jnp.bfloat16 else 2048
    n = pts.shape[0]
    depth = sum(1 for k in params if k.startswith("pts_") and k.endswith("kernel"))
    n_pad = -(-n // tile) * tile
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        dirs = jnp.pad(dirs, ((0, n_pad - n), (0, 0)))

    weights = [w.astype(compute_dtype) for w in _param_list(params, depth)]
    grid = (n_pad // tile,)
    w_specs = [
        pl.BlockSpec(w.shape, functools.partial(_zero_index, w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kernel = functools.partial(
        _mlp_pe_kernel, depth=depth, skips=tuple(net.skips),
        n_freqs_x=net.multires, n_freqs_d=net.multires_views,
        compute_dtype=compute_dtype,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts, dirs, *weights)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_nerf_mlp_pe(params, pts, dirs, net: NeRFNetConfig,
                      compute_dtype=jnp.bfloat16, tile: int | None = None):
    """Pallas-fused PE + MLP on raw points/dirs. Backward recomputes via the
    jnp reference (encoding + nerf_apply)."""
    return _fused_forward_pe(params, pts, dirs, net, compute_dtype, tile)


def _pe_fwd(params, pts, dirs, net, compute_dtype, tile):
    return _fused_forward_pe(params, pts, dirs, net, compute_dtype, tile), (
        params, pts, dirs,
    )


def _pe_bwd(net, compute_dtype, tile, res, g):
    from neuralsim_tpu.models.nerf import nerf_apply
    from neuralsim_tpu.ops.encoding import positional_encoding

    params, pts, dirs = res

    def ref(p, x, d):
        return nerf_apply(
            p, positional_encoding(x, net.multires),
            positional_encoding(d, net.multires_views), net,
            compute_dtype=jnp.float32,
        )

    _, vjp = jax.vjp(ref, params, pts, dirs)
    return vjp(g)


fused_nerf_mlp_pe.defvjp(_pe_fwd, _pe_bwd)


# --------------------------------------------------------------------- #
# Wide-lane PE kernel — the winning formulation (round-2)
# --------------------------------------------------------------------- #
#
# The round-1 PE fusion decomposed PE(x) @ W into 2L+1 skinny K=3 matmuls
# (measured loss: MXU starvation). This variant builds the WHOLE encoding
# as one [T, P]-lane tile with exactly two cheap ops:
#
#   X  = pts @ SEL            one [T,3]@[3,P] matmul (SEL = 0/1 coordinate
#                             selector, so lane j holds x[m_j])
#   pe = mask*X + (1-mask)*sin(X*freq + phase)    one fused VPU expression
#
# using sin(y + pi/2) == cos(y). Lane order matches the reference Embedder
# exactly ([x, sin 2^0 x, cos 2^0 x, ...], run_nerf_helpers.py:18-66); the
# pad lanes (63->64, 27->32) are zero and hit zero rows added to the
# first-layer / views weights, so results are bit-identical in structure
# to nerf_apply. The MLP then runs with activations VMEM-resident as in
# _mlp_kernel. HBM per sample: 12B pts + 12B dirs in, 16B raw out — vs the
# XLA path's PE materialization + per-layer [T, 256] round trips.


def _round_up(n: int, k: int) -> int:
    return -(-n // k) * k


@functools.lru_cache(maxsize=16)
def _wide_pe_consts(d: int, n_freqs: int, pad_to: int):
    """(SEL [d,P], freq [1,P], phase [1,P], raw_mask [1,P]) numpy constants
    such that mask*X + (1-mask)*sin(X*freq+phase) with X = x @ SEL equals
    positional_encoding(x, n_freqs) in lanes [0, d*(1+2L)) and 0 after."""
    import math

    import numpy as np

    P = pad_to
    sel = np.zeros((d, P), np.float32)
    freq = np.zeros((1, P), np.float32)
    phase = np.zeros((1, P), np.float32)
    mask = np.zeros((1, P), np.float32)
    for dim in range(d):
        sel[dim, dim] = 1.0
        mask[0, dim] = 1.0
    col = d
    for k in range(n_freqs):
        for trig in range(2):  # 0 = sin, 1 = cos
            for dim in range(d):
                sel[dim, col] = 1.0
                freq[0, col] = 2.0 ** k
                phase[0, col] = 0.0 if trig == 0 else math.pi / 2.0
                col += 1
    return sel, freq, phase, mask


def _pad_rows(w, rows: int):
    return jnp.concatenate(
        [w, jnp.zeros((rows - w.shape[0], w.shape[1]), w.dtype)], axis=0
    )


def _wide_param_list(params: Dict, depth: int, skips, in_ch: int,
                     p_x: int, p_d: int):
    """Weights with first-layer/skip/views kernels re-laid-out for the
    padded wide-PE lanes (zero rows where the pad lanes land)."""
    width = params["pts_1_kernel"].shape[1]
    seq = []
    for i in range(depth):
        k = params[f"pts_{i}_kernel"]
        if i == 0:
            k = _pad_rows(k, p_x)
        elif (i - 1) in skips:
            # [in_ch + W, W] -> [p_x + W, W]: pad the PE block only
            k = jnp.concatenate([_pad_rows(k[:in_ch], p_x), k[in_ch:]], 0)
        seq += [k, params[f"pts_{i}_bias"]]
    vk = params["views_0_kernel"]  # [W + in_ch_views, W//2]
    vk = jnp.concatenate([vk[:width], _pad_rows(vk[width:], p_d)], 0)
    seq += [params["feature_kernel"], params["feature_bias"],
            params["alpha_kernel"], params["alpha_bias"],
            vk, params["views_0_bias"],
            params["rgb_kernel"], params["rgb_bias"]]
    return [w if w.ndim == 2 else w.reshape(1, -1) for w in seq]


def _wide_pe(x, sel_ref, freq_ref, phase_ref, mask_ref, compute_dtype):
    """In-kernel wide-lane PE: [T, d] f32 -> [T, P] compute_dtype.
    The constant tables arrive as VMEM operands (pallas forbids captured
    array constants in the kernel body)."""
    X = jnp.dot(x, sel_ref[:], preferred_element_type=jnp.float32)
    mask = mask_ref[:]
    pe = mask * X + (1.0 - mask) * jnp.sin(X * freq_ref[:] + phase_ref[:])
    return pe.astype(compute_dtype)


@_with_matmul_precision
def _mlp_widepe_kernel(pts_ref, dirs_ref,
                       selx_ref, freqx_ref, phasex_ref, maskx_ref,
                       seld_ref, freqd_ref, phased_ref, maskd_ref,
                       *refs, depth: int, skips, p_x: int, p_d: int,
                       compute_dtype, fast_epilogue: bool = False):
    def epilogue(acc, b):
        # bias+relu at compute precision: halves the per-layer VPU pass
        # (which otherwise serializes against the MXU) at a ~1-ulp bf16
        # rounding difference vs the f32 epilogue
        if fast_epilogue:
            return jnp.maximum(acc.astype(compute_dtype)
                               + b[:].astype(compute_dtype), 0.0)
        return jnp.maximum(acc + b[:].astype(jnp.float32),
                           0.0).astype(compute_dtype)
    """Whole NeRF MLP with wide-lane fused positional encodings."""
    out_ref = refs[-1]
    wrefs = refs[:-1]
    idx = 0

    def nxt():
        nonlocal idx
        k, b = wrefs[idx], wrefs[idx + 1]
        idx += 2
        return k, b

    cd = compute_dtype
    pe_x = _wide_pe(pts_ref[:], selx_ref, freqx_ref, phasex_ref, maskx_ref,
                    cd)                                     # [T, p_x]
    pe_d = _wide_pe(dirs_ref[:], seld_ref, freqd_ref, phased_ref, maskd_ref,
                    cd)                                     # [T, p_d]

    h = None
    for i in range(depth):
        k, b = nxt()
        if i == 0:
            acc = jnp.dot(pe_x, k[:].astype(cd),
                          preferred_element_type=jnp.float32)
        elif (i - 1) in skips:
            acc = jnp.dot(pe_x, k[:p_x].astype(cd),
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(h, k[p_x:].astype(cd),
                           preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(h, k[:].astype(cd),
                          preferred_element_type=jnp.float32)
        h = epilogue(acc, b)

    fk, fb = nxt()
    ak, ab = nxt()
    vk, vb = nxt()
    rk, rb = nxt()

    alpha = jnp.dot(h, ak[:].astype(cd), preferred_element_type=jnp.float32)
    alpha += ab[:].astype(jnp.float32)
    feature = jnp.dot(h, fk[:].astype(cd), preferred_element_type=jnp.float32)
    feature = (feature + fb[:].astype(jnp.float32)).astype(cd)

    width = feature.shape[-1]
    hv = jnp.dot(feature, vk[:width].astype(cd),
                 preferred_element_type=jnp.float32)
    hv += jnp.dot(pe_d, vk[width:].astype(cd),
                  preferred_element_type=jnp.float32)
    hv = epilogue(hv, vb)

    rgb = jnp.dot(hv, rk[:].astype(cd), preferred_element_type=jnp.float32)
    rgb += rb[:].astype(jnp.float32)

    out_ref[:] = jnp.concatenate([rgb, alpha], axis=-1).astype(out_ref.dtype)


def _fused_forward_widepe(params: Dict, pts, dirs, net: NeRFNetConfig,
                          compute_dtype=jnp.bfloat16, tile: int = 4096,
                          interpret: bool = False,
                          fast_epilogue: bool = False):
    """Wide-lane-PE fused forward: raw [N,3] f32 points/dirs in, [N,4] out."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = pts.shape[0]
    depth = sum(1 for k in params if k.startswith("pts_") and k.endswith("kernel"))
    n_pad = _round_up(n, tile)
    if n_pad != n:
        pts = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
        dirs = jnp.pad(dirs, ((0, n_pad - n), (0, 0)))

    in_ch = 3 * (1 + 2 * net.multires)
    p_x = _round_up(in_ch, 64)
    p_d = _round_up(3 * (1 + 2 * net.multires_views), 32)
    pe_consts = [jnp.asarray(c)
                 for c in _wide_pe_consts(3, net.multires, p_x)
                 ] + [jnp.asarray(c)
                      for c in _wide_pe_consts(3, net.multires_views, p_d)]
    weights = [w.astype(compute_dtype)
               for w in _wide_param_list(params, depth, tuple(net.skips),
                                         in_ch, p_x, p_d)]
    grid = (n_pad // tile,)
    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(_zero_index, c.ndim),
                     memory_space=pltpu.VMEM)
        for c in pe_consts
    ]
    w_specs = [
        pl.BlockSpec(w.shape, functools.partial(_zero_index, w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kernel = functools.partial(
        _mlp_widepe_kernel, depth=depth, skips=tuple(net.skips),
        p_x=p_x, p_d=p_d, compute_dtype=compute_dtype,
        fast_epilogue=fast_epilogue,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_specs,
            *w_specs,
        ],
        out_specs=pl.BlockSpec((tile, 4), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, 4), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts, dirs, *pe_consts, *weights)
    return out[:n]


# --------------------------------------------------------------------- #
# Fused render-tile kernel: PE + MLP + alpha compositing in one kernel
# --------------------------------------------------------------------- #
#
# The [T,4] raw tensor never leaves VMEM: per grid step the kernel marches
# R whole rays (ray-major points, t = r*S + s), runs the wide-lane-PE MLP,
# and composites in-kernel. Mosaic has no cumsum/cumprod primitive, so the
# exclusive transmittance cumprod is exp(log(1-alpha) @ U) with U the
# strict-upper-triangular [S,S] constant — one tiny MXU matmul per tile
# (probed on hardware round 2: the [T,1]->[R,S] reshape and this matmul
# both lower; cumsum/cumprod themselves do not).


@functools.lru_cache(maxsize=8)
def _strict_upper(s: int):
    import numpy as np

    return np.triu(np.ones((s, s), np.float32), 1)


@_with_matmul_precision
def _render_tile_kernel(pts_ref, dirs_ref, z_ref, dnorm_ref,
                        selx_ref, freqx_ref, phasex_ref, maskx_ref,
                        seld_ref, freqd_ref, phased_ref, maskd_ref,
                        tri_ref, *refs,
                        depth: int, skips, p_x: int, p_d: int, r: int,
                        s: int, white_bkgd: bool, compute_dtype,
                        fast_epilogue: bool):
    (rgb_out, disp_out, acc_out, depth_out, w_out) = refs[-5:]
    wrefs = refs[:-5]
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
    pe_x = _wide_pe(pts_ref[:], selx_ref, freqx_ref, phasex_ref, maskx_ref,
                    cd)
    pe_d = _wide_pe(dirs_ref[:], seld_ref, freqd_ref, phased_ref, maskd_ref,
                    cd)

    h = None
    for i in range(depth):
        k, b = nxt()
        if i == 0:
            acc = jnp.dot(pe_x, k[:].astype(cd),
                          preferred_element_type=jnp.float32)
        elif (i - 1) in skips:
            acc = jnp.dot(pe_x, k[:p_x].astype(cd),
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(h, k[p_x:].astype(cd),
                           preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(h, k[:].astype(cd),
                          preferred_element_type=jnp.float32)
        h = epilogue(acc, b)

    fk, fb = nxt()
    ak, ab = nxt()
    vk, vb = nxt()
    rk, rb = nxt()

    sigma = jnp.dot(h, ak[:].astype(cd), preferred_element_type=jnp.float32)
    sigma += ab[:].astype(jnp.float32)                      # [T, 1]
    feature = jnp.dot(h, fk[:].astype(cd), preferred_element_type=jnp.float32)
    feature = (feature + fb[:].astype(jnp.float32)).astype(cd)

    width = feature.shape[-1]
    hv = jnp.dot(feature, vk[:width].astype(cd),
                 preferred_element_type=jnp.float32)
    hv += jnp.dot(pe_d, vk[width:].astype(cd),
                  preferred_element_type=jnp.float32)
    hv = epilogue(hv, vb)

    rgb_logits = jnp.dot(hv, rk[:].astype(cd),
                         preferred_element_type=jnp.float32)
    rgb_logits += rb[:].astype(jnp.float32)                 # [T, 3]

    # ---- compositing (f32, ops.volume.raw2outputs semantics) ---------- #
    z = z_ref[:]                                            # [R, S]
    dn = dnorm_ref[:]                                       # [R, 1]
    dists = jnp.concatenate(
        [z[:, 1:] - z[:, :-1], jnp.full((r, 1), 1e10, jnp.float32)], 1) * dn

    sigma_rs = sigma.reshape(r, s)
    alpha = 1.0 - jnp.exp(-jnp.maximum(sigma_rs, 0.0) * dists)
    # exclusive cumprod of (1 - alpha + 1e-10) via MXU triangular matmul
    lg = jnp.log(1.0 - alpha + 1e-10)
    trans = jnp.exp(jnp.dot(lg, tri_ref[:],
                            preferred_element_type=jnp.float32))
    w = alpha * trans                                       # [R, S]

    rgb = jax.nn.sigmoid(rgb_logits)                        # [T, 3]
    cols = [jnp.sum(w * rgb[:, c:c + 1].reshape(r, s), axis=1,
                    keepdims=True) for c in range(3)]
    rgb_map = jnp.concatenate(cols, axis=1)                 # [R, 3]
    depth_map = jnp.sum(w * z, axis=1, keepdims=True)
    acc_map = jnp.sum(w, axis=1, keepdims=True)
    disp = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10))
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map)

    rgb_out[:] = rgb_map
    disp_out[:] = disp
    acc_out[:] = acc_map
    depth_out[:] = depth_map
    w_out[:] = w


def fused_render_tile(params: Dict, rays_o, rays_d, viewdirs, z_vals,
                      net: NeRFNetConfig, white_bkgd: bool = False,
                      compute_dtype=jnp.bfloat16, target_tile: int = 4096,
                      fast_epilogue: bool = False, interpret: bool = False):
    """Fused march of whole rays: (rays, z_vals) -> composited maps.

    Returns (rgb_map [N,3], disp [N], acc [N], weights [N,S], depth [N]) —
    the raw2outputs tuple. Per-sample HBM traffic is the z value in and
    the per-ray maps out; PE, activations, raw rgb/sigma, and the
    compositing intermediates all stay in VMEM.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, s = z_vals.shape
    depth_l = sum(1 for k in params
                  if k.startswith("pts_") and k.endswith("kernel"))
    # rays per grid step: near target_tile points, multiple of 8 rays
    r = max(8, (max(1, target_tile // s) // 8) * 8)
    n_pad = _round_up(n, r)
    if n_pad != n:
        pad = n_pad - n

        def padf(x):
            return jnp.concatenate(
                [x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], 0)

        rays_o, rays_d, viewdirs, z_vals = (
            padf(rays_o), padf(rays_d), padf(viewdirs), padf(z_vals))

    pts = (rays_o[:, None, :]
           + rays_d[:, None, :] * z_vals[..., None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(
        viewdirs[:, None, :], (n_pad, s, 3)).reshape(-1, 3)
    dnorm = jnp.linalg.norm(rays_d, axis=-1, keepdims=True)

    in_ch = 3 * (1 + 2 * net.multires)
    p_x = _round_up(in_ch, 64)
    p_d = _round_up(3 * (1 + 2 * net.multires_views), 32)
    pe_consts = [jnp.asarray(c)
                 for c in _wide_pe_consts(3, net.multires, p_x)
                 ] + [jnp.asarray(c)
                      for c in _wide_pe_consts(3, net.multires_views, p_d)]
    tri = jnp.asarray(_strict_upper(s))
    weights = [w.astype(compute_dtype)
               for w in _wide_param_list(params, depth_l, tuple(net.skips),
                                         in_ch, p_x, p_d)]

    t = r * s
    grid = (n_pad // r,)
    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(_zero_index, c.ndim),
                     memory_space=pltpu.VMEM)
        for c in pe_consts + [tri]
    ]
    w_specs = [
        pl.BlockSpec(w.shape, functools.partial(_zero_index, w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kernel = functools.partial(
        _render_tile_kernel, depth=depth_l, skips=tuple(net.skips),
        p_x=p_x, p_d=p_d, r=r, s=s, white_bkgd=white_bkgd,
        compute_dtype=compute_dtype, fast_epilogue=fast_epilogue,
    )
    out_shapes = (
        jax.ShapeDtypeStruct((n_pad, 3), jnp.float32),   # rgb_map
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),   # disp
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),   # acc
        jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),   # depth
        jax.ShapeDtypeStruct((n_pad, s), jnp.float32),   # weights
    )
    out_specs = (
        pl.BlockSpec((r, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
    )
    rgb_map, disp, acc, depth_map, w = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((t, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, s), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            *const_specs,
            *w_specs,
        ],
        out_specs=out_specs,
        out_shape=out_shapes,
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(pts, dirs, z_vals, dnorm, *pe_consts, tri, *weights)
    return (rgb_map[:n], disp[:n, 0], acc[:n, 0], w[:n], depth_map[:n, 0])


# --------------------------------------------------------------------- #
# Transposed march kernel: channel-plane I/O, feature-major MLP
# --------------------------------------------------------------------- #
#
# Why (round-3 bisect, scripts/probe_render_bisect.py): feeding the widepe
# kernel costs ~30% of exact render time in HBM traffic that isn't the MLP.
# XLA materializes the [T,3] points/dirs operands and the [T,4] raw output
# in the TPU's (8,128)-tiled layout, whose 3/4-lane minor dim pads to 128
# — a ~40x blowup (4.3 GB per 8.4M-point chunk, written by XLA and re-read
# by the kernel / the compositing reshape).
#
# Layout constraint that shapes this design: Mosaic supports the
# [T,1]->[R,S] vector shape cast (sublanes->lanes; round-2 probe) but NOT
# the reverse [R,S]->[T,1] (lanes->sublanes: `tpu.reshape vector<64x64> ->
# vector<4096x1>` fails infer-vector-layout, round-3 probe). A point-major
# kernel over in-kernel-generated points would need exactly that reverse
# cast. So this kernel runs the whole MLP TRANSPOSED — activations are
# [features, t] with the point dim in LANES:
#
#   - inputs are six channel planes px/py/pz/vx/vy/vz shaped [n_tiles, t]
#     (XLA fuses point-gen o_c + d_c*z into packed 4B/sample writes; no
#     [T,3] tensor ever exists), delivered as [1, t] rows — no cast;
#   - wide-PE becomes three VPU FMAs: X[p,t] = sum_c onehot_c[p,1]*pc[1,t]
#     with freq/phase/mask as [p,1] columns (supported broadcasts only);
#   - every matmul is kT [out, in] @ h [in, t] — 2-D dots with the WEIGHTS
#     as the stationary LHS operand;
#   - outputs are four [n_tiles, t] planes (sigma, r, g, b) written as
#     [1, t] rows, reshaped to [N,S] by XLA for free (row-major relabel).
#
# Per-sample HBM traffic: 24B in + 16B out vs ~300-500B for the point-major
# path. Tiles are sample-count agnostic (t need not divide the per-ray S),
# so the fine pass gets full-size tiles too. Compositing stays in XLA
# (unlike fused_render_tile) so its VPU work overlaps the next tile's
# matmuls.


@_with_matmul_precision
def _march_channels_kernel(in_ref,
                           cx0, cx1, cx2, freqx_ref, phasex_ref, maskx_ref,
                           cd0, cd1, cd2, freqd_ref, phased_ref, maskd_ref,
                           *refs, depth: int, skips, p_x: int, p_d: int,
                           compute_dtype, fast_epilogue: bool):
    out_ref = refs[-1]
    wrefs = refs[:-1]
    idx = 0

    def nxt():
        nonlocal idx
        k, b = wrefs[idx], wrefs[idx + 1]
        idx += 2
        return k, b

    def epilogue(acc, b):
        # bias is a [out, 1] column broadcasting over the t lanes
        if fast_epilogue:
            return jnp.maximum(acc.astype(compute_dtype)
                               + b[:].astype(compute_dtype), 0.0)
        return jnp.maximum(acc + b[:].astype(jnp.float32),
                           0.0).astype(compute_dtype)

    cd = compute_dtype
    chans = in_ref[0]                                       # [6, t] f32
    # X[p, t] = pc_{coord(p)}[t]: the one-hot selector distributes over
    # coordinates, so the PE input assembles from three FMAs
    X = (cx0[:] * chans[0:1, :] + cx1[:] * chans[1:2, :]
         + cx2[:] * chans[2:3, :])                          # [p_x, t] f32
    maskx = maskx_ref[:]
    pe_x = (maskx * X + (1.0 - maskx)
            * jnp.sin(X * freqx_ref[:] + phasex_ref[:])).astype(cd)
    Xd = (cd0[:] * chans[3:4, :] + cd1[:] * chans[4:5, :]
          + cd2[:] * chans[5:6, :])                         # [p_d, t]
    maskd = maskd_ref[:]
    pe_d = (maskd * Xd + (1.0 - maskd)
            * jnp.sin(Xd * freqd_ref[:] + phased_ref[:])).astype(cd)

    h = None
    for i in range(depth):
        k, b = nxt()                      # k [W, in] (transposed), b [W, 1]
        if i == 0:
            acc = jnp.dot(k[:].astype(cd), pe_x,
                          preferred_element_type=jnp.float32)
        elif (i - 1) in skips:
            acc = jnp.dot(k[:, :p_x].astype(cd), pe_x,
                          preferred_element_type=jnp.float32)
            acc += jnp.dot(k[:, p_x:].astype(cd), h,
                           preferred_element_type=jnp.float32)
        else:
            acc = jnp.dot(k[:].astype(cd), h,
                          preferred_element_type=jnp.float32)
        h = epilogue(acc, b)

    fk, fb = nxt()
    ak, ab = nxt()
    vk, vb = nxt()
    rk, rb = nxt()

    sigma = jnp.dot(ak[:].astype(cd), h, preferred_element_type=jnp.float32)
    sigma += ab[:].astype(jnp.float32)                      # [1, t]
    feature = jnp.dot(fk[:].astype(cd), h, preferred_element_type=jnp.float32)
    feature = (feature + fb[:].astype(jnp.float32)).astype(cd)

    width = feature.shape[0]
    hv = jnp.dot(vk[:, :width].astype(cd), feature,
                 preferred_element_type=jnp.float32)
    hv += jnp.dot(vk[:, width:].astype(cd), pe_d,
                  preferred_element_type=jnp.float32)
    hv = epilogue(hv, vb)

    rgb = jnp.dot(rk[:].astype(cd), hv, preferred_element_type=jnp.float32)
    rgb += rb[:].astype(jnp.float32)                        # [3, t]

    out_ref[0] = jnp.concatenate([sigma, rgb], axis=0)      # [4, t]


@functools.lru_cache(maxsize=16)
def _wide_pe_consts_t(d: int, n_freqs: int, pad_to: int):
    """Transposed wide-PE constants for the feature-major kernel: three
    per-coordinate one-hot columns [P,1] (X = sum_c onehot_c * pc) plus
    freq/phase/mask as [P,1] columns."""
    import numpy as np

    sel, freq, phase, mask = _wide_pe_consts(d, n_freqs, pad_to)
    cols = [np.ascontiguousarray(sel.T[:, c:c + 1]) for c in range(d)]
    return (*cols, np.ascontiguousarray(freq.T),
            np.ascontiguousarray(phase.T), np.ascontiguousarray(mask.T))


def _wide_param_list_t(params: Dict, depth: int, skips, in_ch: int,
                       p_x: int, p_d: int):
    """Transposed (weight-stationary) layout of _wide_param_list: kernels
    become [out, in], biases [out, 1]."""
    return [w.T for w in _wide_param_list(params, depth, skips,
                                          in_ch, p_x, p_d)]


def _fused_march_channels(params: Dict, rays_o, rays_d, viewdirs, z_vals,
                          net: NeRFNetConfig, compute_dtype=jnp.bfloat16,
                          target_tile: int = 4096,
                          fast_epilogue: bool = False,
                          interpret: bool = False):
    """Transposed fused march: channel planes in, channel-separated raw out.

    Returns (sigma [N,S] f32 raw density, rgb [3,N,S] f32 logits) for
    ops.volume.raw2outputs_channels.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n, s = z_vals.shape
    depth_l = sum(1 for k in params
                  if k.startswith("pts_") and k.endswith("kernel"))
    t = _round_up(max(128, target_tile), 128)
    total = n * s
    n_tiles = -(-total // t)
    total_pad = n_tiles * t

    def plane(x):
        # [N, S] -> [n_tiles, t]: row-major relabel + zero tail, fused by
        # XLA into a packed 4B/sample write
        flat = x.reshape(-1)
        if total_pad != total:
            flat = jnp.concatenate(
                [flat, jnp.zeros((total_pad - total,), flat.dtype)])
        return flat.reshape(n_tiles, t)

    planes = [plane(rays_o[:, c:c + 1] + rays_d[:, c:c + 1] * z_vals)
              for c in range(3)]
    planes += [plane(jnp.broadcast_to(viewdirs[:, c:c + 1], (n, s)))
               for c in range(3)]
    chans = jnp.stack(planes, axis=1)                 # [n_tiles, 6, t]

    in_ch = 3 * (1 + 2 * net.multires)
    p_x = _round_up(in_ch, 64)
    p_d = _round_up(3 * (1 + 2 * net.multires_views), 32)
    pe_consts = [jnp.asarray(c)
                 for c in _wide_pe_consts_t(3, net.multires, p_x)
                 ] + [jnp.asarray(c)
                      for c in _wide_pe_consts_t(3, net.multires_views, p_d)]
    weights = [w.astype(compute_dtype)
               for w in _wide_param_list_t(params, depth_l, tuple(net.skips),
                                           in_ch, p_x, p_d)]

    grid = (n_tiles,)
    const_specs = [
        pl.BlockSpec(c.shape, functools.partial(_zero_index, c.ndim),
                     memory_space=pltpu.VMEM)
        for c in pe_consts
    ]
    w_specs = [
        pl.BlockSpec(w.shape, functools.partial(_zero_index, w.ndim),
                     memory_space=pltpu.VMEM)
        for w in weights
    ]
    kernel = functools.partial(
        _march_channels_kernel, depth=depth_l, skips=tuple(net.skips),
        p_x=p_x, p_d=p_d, compute_dtype=compute_dtype,
        fast_epilogue=fast_epilogue,
    )
    in_spec = pl.BlockSpec((1, 6, t), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 4, t), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    raw = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[in_spec] + const_specs + w_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles, 4, t), jnp.float32),
        interpret=interpret,
        compiler_params=None if interpret else pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(chans, *pe_consts, *weights)

    def unplane(x):                          # [n_tiles, t] -> [N, S]
        return x.reshape(-1)[:total].reshape(n, s)

    sigma = unplane(raw[:, 0, :])
    rgb3 = jnp.stack([unplane(raw[:, 1 + c, :]) for c in range(3)])
    return sigma, rgb3


def _march_channels_ref(params, rays_o, rays_d, viewdirs, z_vals,
                        net: NeRFNetConfig):
    """jnp reference of the march kernel (backward recompute path)."""
    from neuralsim_tpu.models.nerf import nerf_apply
    from neuralsim_tpu.ops.encoding import positional_encoding

    n, s = z_vals.shape
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    dirs = jnp.broadcast_to(viewdirs[:, None, :], (n, s, 3))
    raw = nerf_apply(
        params,
        positional_encoding(pts.reshape(-1, 3), net.multires),
        positional_encoding(dirs.reshape(-1, 3), net.multires_views),
        net, compute_dtype=jnp.float32,
    ).reshape(n, s, 4)
    return raw[..., 3], jnp.moveaxis(raw[..., :3], -1, 0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def fused_nerf_march(params, rays_o, rays_d, viewdirs, z_vals,
                     net: NeRFNetConfig, compute_dtype=jnp.bfloat16,
                     target_tile: int = 4096):
    """Ray-major march (pointgen + PE + MLP in VMEM), channel raw outputs.
    Backward recomputes via the jnp reference path."""
    return _fused_march_channels(params, rays_o, rays_d, viewdirs, z_vals,
                                 net, compute_dtype, target_tile)


def _march_fwd(params, rays_o, rays_d, viewdirs, z_vals, net,
               compute_dtype, target_tile):
    out = _fused_march_channels(params, rays_o, rays_d, viewdirs, z_vals,
                                net, compute_dtype, target_tile)
    return out, (params, rays_o, rays_d, viewdirs, z_vals)


def _march_bwd(net, compute_dtype, target_tile, res, g):
    params, rays_o, rays_d, viewdirs, z_vals = res
    _, vjp = jax.vjp(
        lambda p, o, d, v, z: _march_channels_ref(p, o, d, v, z, net),
        params, rays_o, rays_d, viewdirs, z_vals,
    )
    return vjp(g)


fused_nerf_march.defvjp(_march_fwd, _march_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_nerf_mlp_widepe(params, pts, dirs, net: NeRFNetConfig,
                          compute_dtype=jnp.bfloat16, tile: int = 4096):
    """Pallas wide-lane-PE + MLP on raw points/dirs: the production fused
    forward. Backward recomputes via the jnp reference path."""
    return _fused_forward_widepe(params, pts, dirs, net, compute_dtype, tile)


def _widepe_fwd(params, pts, dirs, net, compute_dtype, tile):
    return (_fused_forward_widepe(params, pts, dirs, net, compute_dtype,
                                  tile),
            (params, pts, dirs))


fused_nerf_mlp_widepe.defvjp(_widepe_fwd, _pe_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_nerf_mlp(params, x_pe, d_pe, net: NeRFNetConfig,
                   compute_dtype=jnp.bfloat16, tile: int = 2048):
    """Pallas-fused equivalent of models.nerf.nerf_apply for viewdir nets.

    Forward runs the fused kernel; backward falls back to autodiff of the
    jnp reference implementation (recompute — no stored activations).
    """
    return _fused_forward(params, x_pe, d_pe, net, compute_dtype, tile)


def _fwd(params, x_pe, d_pe, net, compute_dtype, tile):
    out = _fused_forward(params, x_pe, d_pe, net, compute_dtype, tile)
    return out, (params, x_pe, d_pe)


def _bwd(net, compute_dtype, tile, res, g):
    from neuralsim_tpu.models.nerf import nerf_apply

    params, x_pe, d_pe = res
    _, vjp = jax.vjp(
        lambda p, x, d: nerf_apply(p, x, d, net, compute_dtype=jnp.float32),
        params, x_pe, d_pe,
    )
    return vjp(g)


fused_nerf_mlp.defvjp(_fwd, _bwd)
