"""Volume-rendering primitives: stratified sampling, alpha compositing,
inverse-CDF importance sampling.

Behavioral parity targets (all in ``optimization/utils/``):
  - stratified z-vals + jitter:    run_nerf_noscale.py:439-461
  - raw2outputs compositing:       run_nerf_noscale.py:343-387
  - sample_pdf inverse CDF:        run_nerf_helpers.py:199-243

Differences by design:
  - explicit PRNG keys instead of global torch RNG (the reference's
    ``pytest=`` seeded-noise hooks collapse into "pass a fixed key")
  - disparity is NaN-free: the reference divides by sum(weights) which can be
    0 for rays that hit nothing; we clamp the denominator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(key, n_rays: int, n_samples: int, near, far,
                      perturb: bool, lindisp: bool = False):
    """Coarse sample depths [n_rays, n_samples] between near and far.

    near/far may be scalars or [n_rays] / [n_rays,1] arrays.
    """
    t_vals = jnp.linspace(0.0, 1.0, n_samples)
    near = jnp.broadcast_to(jnp.reshape(jnp.asarray(near, jnp.float32), (-1, 1)), (n_rays, 1))
    far = jnp.broadcast_to(jnp.reshape(jnp.asarray(far, jnp.float32), (-1, 1)), (n_rays, 1))
    if lindisp:
        z_vals = 1.0 / (1.0 / near * (1.0 - t_vals) + 1.0 / far * t_vals)
    else:
        z_vals = near * (1.0 - t_vals) + far * t_vals
    z_vals = jnp.broadcast_to(z_vals, (n_rays, n_samples))
    if perturb:
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], -1)
        lower = jnp.concatenate([z_vals[..., :1], mids], -1)
        t_rand = jax.random.uniform(key, z_vals.shape)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def raw2outputs(raw, z_vals, rays_d, key=None, raw_noise_std: float = 0.0,
                white_bkgd: bool = False):
    """Alpha-composite raw network outputs along each ray.

    Args:
      raw: [N, S, 4] — rgb logits + density.
      z_vals: [N, S] sample depths.
      rays_d: [N, 3] (unnormalized) ray directions.
      key: PRNG key for density regularization noise (when raw_noise_std>0).

    Returns:
      rgb_map [N,3], disp_map [N], acc_map [N], weights [N,S], depth_map [N].
    """
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = jnp.concatenate(
        [dists, jnp.full_like(dists[..., :1], 1e10)], axis=-1
    )
    dists = dists * jnp.linalg.norm(rays_d[..., None, :], axis=-1)

    rgb = jax.nn.sigmoid(raw[..., :3])
    sigma = raw[..., 3]
    if raw_noise_std > 0.0:
        if key is None:
            raise ValueError("raw_noise_std > 0 requires a PRNG key")
        sigma = sigma + jax.random.normal(key, sigma.shape) * raw_noise_std

    alpha = 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
    # exclusive cumprod of transmittance
    trans = jnp.cumprod(
        jnp.concatenate(
            [jnp.ones_like(alpha[..., :1]), 1.0 - alpha + 1e-10], axis=-1
        ),
        axis=-1,
    )[..., :-1]
    weights = alpha * trans

    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10, depth_map / jnp.maximum(acc_map, 1e-10)
    )

    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])

    return rgb_map, disp_map, acc_map, weights, depth_map


def sample_pdf(key, bins, weights, n_samples: int, det: bool):
    """Inverse-transform sample n_samples depths from the piecewise-constant
    PDF given by ``weights`` over ``bins``.

    Args:
      bins: [N, B] bin edges (z_vals midpoints).
      weights: [N, B-1] unnormalized PDF.
      det: deterministic linspace samples (test mode) vs uniform draws.

    Returns: [N, n_samples] sampled depths.
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [N, B]

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples)
        u = jnp.broadcast_to(u, cdf.shape[:-1] + (n_samples,))
    else:
        u = jax.random.uniform(key, cdf.shape[:-1] + (n_samples,))

    # searchsorted-right as a vectorized comparison count: with B ~ 64 bins
    # the [N, M, B] compare+reduce is one fused VPU pass, ~50x faster on TPU
    # than a vmapped jnp.searchsorted (439ms -> <10ms at 32k rays x 128)
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_below = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_above = jnp.take_along_axis(cdf, above, axis=-1)
    bins_below = jnp.take_along_axis(bins, below, axis=-1)
    bins_above = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_above - cdf_below
    denom = jnp.where(denom < 1e-5, 1.0, denom)
    t = (u - cdf_below) / denom
    return bins_below + t * (bins_above - bins_below)
