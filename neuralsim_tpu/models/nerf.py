"""The NeRF MLP as pure functions over a plain params pytree.

Architecture parity with the reference MLP
(``optimization/utils/run_nerf_helpers.py:70-122``): D=8 layers of width 256
with a skip concat of the encoded position after layer index 4 (concat order
``[input_pts, h]``), then a viewdir head — ``alpha_linear`` 256->1,
``feature_linear`` 256->256, one ``views_linear`` (256+27)->128,
``rgb_linear`` 128->3.

TPU-first choices:
  - params are a flat dict of (kernel[in,out], bias[out]) arrays — trivially
    convertible from the published torch ``.tar`` checkpoints
    (see neuralsim_tpu.data.convert_torch) and directly consumable by the
    Pallas kernels in neuralsim_tpu.kernels.
  - a ``compute_dtype`` knob casts activations+weights to bfloat16 for the
    MXU fast path while accumulating matmuls in float32
    (``preferred_element_type``).
  - no ``netchunk`` serial slicing (reference run_nerf_noscale.py:14-40):
    the caller feeds one large [N, C] batch; memory is controlled by the
    ray-level tiling in ops.render.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from neuralsim_tpu.config import NeRFNetConfig
from neuralsim_tpu.ops.encoding import positional_encoding

Params = Dict[str, jnp.ndarray]


def _dense_init(key, fan_in: int, fan_out: int):
    """Kaiming-uniform matching torch nn.Linear defaults (U(-1/sqrt(in), 1/sqrt(in)))."""
    kkey, bkey = jax.random.split(key)
    bound = 1.0 / jnp.sqrt(fan_in)
    kernel = jax.random.uniform(kkey, (fan_in, fan_out), jnp.float32, -bound, bound)
    bias = jax.random.uniform(bkey, (fan_out,), jnp.float32, -bound, bound)
    return kernel, bias


def init_nerf_params(key, net: NeRFNetConfig, fine: bool = False) -> Params:
    """Random init of one NeRF MLP (coarse or fine)."""
    depth = net.netdepth_fine if fine else net.netdepth
    width = net.netwidth_fine if fine else net.netwidth
    in_ch = net.input_ch
    in_ch_views = net.input_ch_views

    params: Params = {}
    keys = jax.random.split(key, depth + 4)
    fan_in = in_ch
    for i in range(depth):
        k, b = _dense_init(keys[i], fan_in, width)
        params[f"pts_{i}_kernel"] = k
        params[f"pts_{i}_bias"] = b
        fan_in = width + in_ch if i in net.skips else width

    if net.use_viewdirs:
        k, b = _dense_init(keys[depth], width, width)
        params["feature_kernel"], params["feature_bias"] = k, b
        k, b = _dense_init(keys[depth + 1], width, 1)
        params["alpha_kernel"], params["alpha_bias"] = k, b
        k, b = _dense_init(keys[depth + 2], width + in_ch_views, width // 2)
        params["views_0_kernel"], params["views_0_bias"] = k, b
        k, b = _dense_init(keys[depth + 3], width // 2, 3)
        params["rgb_kernel"], params["rgb_bias"] = k, b
    else:
        k, b = _dense_init(keys[depth], width, net.output_ch)
        params["output_kernel"], params["output_bias"] = k, b
    return params


def init_nerf_pipeline_params(key, net: NeRFNetConfig, n_importance: int) -> Dict[str, Params]:
    """Coarse (+ fine when n_importance>0) model pair, mirroring create_nerf
    (reference run_nerf_noscale.py:258-340)."""
    kc, kf = jax.random.split(key)
    models = {"coarse": init_nerf_params(kc, net, fine=False)}
    if n_importance > 0:
        models["fine"] = init_nerf_params(kf, net, fine=True)
    return models


def _dense(h, kernel, bias, compute_dtype):
    # f32 compute is the exactness/parity path: request true-f32 MXU passes
    # (TPU DEFAULT precision for f32 operands is one bf16 pass, which drifts
    # past parity tolerance over the 13-layer chain — kernels/raymarch.py
    # applies the same rule, so the Pallas and XLA paths stay matched)
    precision = (jax.lax.Precision.HIGHEST
                 if jnp.dtype(compute_dtype) == jnp.float32 else None)
    out = jnp.dot(
        h.astype(compute_dtype),
        kernel.astype(compute_dtype),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    return out + bias.astype(jnp.float32)


def nerf_apply(params: Params, x_pe, d_pe, net: NeRFNetConfig,
               compute_dtype=jnp.float32):
    """Forward the MLP on pre-encoded inputs.

    Args:
      x_pe: [N, input_ch] encoded positions.
      d_pe: [N, input_ch_views] encoded view directions (or None).

    Returns: [N, 4] (rgb logits, density).
    """
    depth = sum(1 for k in params if k.startswith("pts_") and k.endswith("kernel"))
    # keep inter-layer activations at compute precision: with bf16 this
    # halves the [N, 256] HBM traffic between layers (the XLA path's real
    # bottleneck — matmul accumulation stays f32 via preferred_element_type)
    h = x_pe.astype(compute_dtype)
    for i in range(depth):
        h = _dense(h, params[f"pts_{i}_kernel"], params[f"pts_{i}_bias"], compute_dtype)
        h = jax.nn.relu(h).astype(compute_dtype)
        if i in net.skips:
            h = jnp.concatenate([x_pe.astype(compute_dtype), h], axis=-1)

    if net.use_viewdirs:
        if d_pe is None:
            raise ValueError("use_viewdirs=True requires encoded directions")
        alpha = _dense(h, params["alpha_kernel"], params["alpha_bias"], compute_dtype)
        feature = _dense(h, params["feature_kernel"], params["feature_bias"],
                         compute_dtype).astype(compute_dtype)
        h = jnp.concatenate([feature, d_pe.astype(compute_dtype)], axis=-1)
        h = jax.nn.relu(
            _dense(h, params["views_0_kernel"], params["views_0_bias"], compute_dtype)
        ).astype(compute_dtype)
        rgb = _dense(h, params["rgb_kernel"], params["rgb_bias"], compute_dtype)
        return jnp.concatenate([rgb, alpha], axis=-1)

    return _dense(h, params["output_kernel"], params["output_bias"], compute_dtype)


def query_points(params: Params, pts, viewdirs: Optional[jnp.ndarray],
                 net: NeRFNetConfig, compute_dtype=jnp.float32,
                 use_pallas: bool = False, pe_projection: bool = True):
    """Encode and evaluate the field at sample points.

    Equivalent surface to the reference's run_network
    (run_nerf_noscale.py:26-40) without the netchunk loop.

    Args:
      pts: [N, S, 3] sample positions.
      viewdirs: [N, 3] unit view directions (broadcast per-sample) or None.

    Returns: raw [N, S, 4].
    """
    n, s, _ = pts.shape
    flat = pts.reshape(n * s, 3)

    if use_pallas and net.use_viewdirs and net.i_embed != -1:
        from neuralsim_tpu.kernels.raymarch import (
            fused_nerf_mlp_widepe,
            pallas_available,
        )

        if pallas_available():
            # wide-lane-PE fused kernel: encodings and all inter-layer
            # activations stay VMEM-resident (kernels/raymarch.py round-2);
            # off-TPU (pallas_available False) falls through to the jnp path
            dirs = jnp.broadcast_to(
                viewdirs[:, None, :], (n, s, 3)).reshape(n * s, 3)
            raw = fused_nerf_mlp_widepe(params, flat, dirs, net, compute_dtype)
            return raw.reshape(n, s, raw.shape[-1])

    x_pe = flat if net.i_embed == -1 else positional_encoding(
        flat, net.multires, projection=pe_projection)
    d_pe = None
    if net.use_viewdirs:
        dirs = jnp.broadcast_to(viewdirs[:, None, :], (n, s, 3)).reshape(n * s, 3)
        d_pe = dirs if net.i_embed == -1 else positional_encoding(
            dirs, net.multires_views, projection=pe_projection)

    raw = nerf_apply(params, x_pe, d_pe, net, compute_dtype=compute_dtype)
    return raw.reshape(n, s, raw.shape[-1])


def make_sigma_fn(params: Params, net: NeRFNetConfig,
                  compute_dtype=jnp.float32):
    """[N, 3] positions -> [N] raw density from one NeRF MLP.

    The alpha head consumes only the position trunk (reference
    run_nerf_helpers.py:82-97), so density is view-independent — the rgb
    head runs on a zero viewdir and is discarded. Used to build occupancy
    grids (ops.occupancy) from the coarse model."""

    def sigma_fn(pts):
        dirs = jnp.zeros((pts.shape[0], 3), pts.dtype)
        raw = query_points(params, pts[:, None, :],
                           dirs if net.use_viewdirs else None,
                           net, compute_dtype)
        return raw[:, 0, 3]

    return sigma_fn
