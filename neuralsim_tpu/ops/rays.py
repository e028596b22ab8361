"""Camera-ray generation.

Pinhole model identical in behavior to the reference
(``optimization/utils/run_nerf_helpers.py:156-195``) but fully vectorized jnp
with no host<->device `.cuda()` boundary and differentiable w.r.t. the
camera-to-world matrix (needed for dL/dpsi, which flows through ray origins
and directions).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def get_rays(H: int, W: int, K, c2w):
    """Rays through every pixel.

    Args:
      H, W: image size (static python ints).
      K: [3,3] intrinsics.
      c2w: [3,4] or [4,4] camera-to-world (OpenGL convention: x right,
        y up, camera looks down -z).

    Returns:
      rays_o, rays_d: each [H, W, 3]. Directions are *not* normalized
      (matches reference; z_vals are metric along -z through the norm factor
      applied in raw2outputs).
    """
    K = jnp.asarray(K)
    c2w = jnp.asarray(c2w)
    i = jnp.arange(W, dtype=jnp.float32)[None, :]  # pixel x
    j = jnp.arange(H, dtype=jnp.float32)[:, None]  # pixel y
    dirs = jnp.stack(
        [
            jnp.broadcast_to((i - K[0, 2]) / K[0, 0], (H, W)),
            jnp.broadcast_to(-(j - K[1, 2]) / K[1, 1], (H, W)),
            -jnp.ones((H, W), dtype=jnp.float32),
        ],
        axis=-1,
    )
    # rotate camera-frame dirs into the world frame: d_world = R @ d_cam.
    # HIGHEST precision: this 3-wide contraction is tiny but feeds pose
    # gradients; the TPU default (bf16 accumulate) costs ~2e-3 relative error.
    rays_d = jnp.einsum(
        "hwc,rc->hwr", dirs, c2w[:3, :3], precision=jax.lax.Precision.HIGHEST
    )
    rays_o = jnp.broadcast_to(c2w[:3, -1], rays_d.shape)
    return rays_o, rays_d


def ndc_rays(H: int, W: int, focal: float, near: float, rays_o, rays_d):
    """Shift to near plane and project to NDC (LLFF forward-facing scenes;
    reference run_nerf_helpers.py:178-195 — disabled for LINEMOD)."""
    t = -(near + rays_o[..., 2]) / rays_d[..., 2]
    rays_o = rays_o + t[..., None] * rays_d

    o0 = -1.0 / (W / (2.0 * focal)) * rays_o[..., 0] / rays_o[..., 2]
    o1 = -1.0 / (H / (2.0 * focal)) * rays_o[..., 1] / rays_o[..., 2]
    o2 = 1.0 + 2.0 * near / rays_o[..., 2]

    d0 = -1.0 / (W / (2.0 * focal)) * (
        rays_d[..., 0] / rays_d[..., 2] - rays_o[..., 0] / rays_o[..., 2]
    )
    d1 = -1.0 / (H / (2.0 * focal)) * (
        rays_d[..., 1] / rays_d[..., 2] - rays_o[..., 1] / rays_o[..., 2]
    )
    d2 = -2.0 * near / rays_o[..., 2]

    return jnp.stack([o0, o1, o2], -1), jnp.stack([d0, d1, d2], -1)
