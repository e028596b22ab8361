"""On-device numerics of the Pallas render kernels vs the jnp reference.

Interpret-mode tests (tests/test_pallas_kernel.py) prove the kernel MATH;
these prove the MOSAIC LOWERING on the real backend — bf16 epilogues,
vector layouts, the transposed-march channel-plane I/O — the exact
surface a libtpu/Mosaic drift would silently break (VERDICT r2 weak #7).

Shapes are kept small (one to two tiles) so each program compiles in
~1 min through the remote-compile relay and caches persistently.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
from neuralsim_tpu.models.nerf import init_nerf_params

NET = NeRFNetConfig()


@pytest.fixture(scope="module")
def scene():
    import sys

    sys.path.insert(0, "/root/repo")
    from bench import box_scene_params

    params = box_scene_params(NET, jax.random.PRNGKey(0))
    rng = np.random.RandomState(0)
    n, s = 512, 48
    ro = jnp.asarray(rng.randn(n, 3).astype(np.float32)) * 0.1
    rd = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    z = jnp.sort(jnp.asarray(
        0.3 + 1.6 * rng.rand(n, s).astype(np.float32)), axis=-1)
    return params, ro, rd, vd, z


def test_march_kernel_f32_matches_reference(scene):
    from neuralsim_tpu.kernels.raymarch import (
        _fused_march_channels,
        _march_channels_ref,
    )

    params, ro, rd, vd, z = scene
    want_s, want_rgb = jax.jit(
        lambda: _march_channels_ref(params, ro, rd, vd, z, NET))()
    got_s, got_rgb = jax.jit(
        lambda: _fused_march_channels(params, ro, rd, vd, z, NET,
                                      compute_dtype=jnp.float32))()
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=2e-3, atol=2e-3)


def test_march_kernel_bf16_close_to_reference(scene):
    """The production dtype: bf16 matmuls, f32 accumulation/epilogue."""
    from neuralsim_tpu.kernels.raymarch import (
        _fused_march_channels,
        _march_channels_ref,
    )

    params, ro, rd, vd, z = scene
    want_s, want_rgb = jax.jit(
        lambda: _march_channels_ref(params, ro, rd, vd, z, NET))()
    got_s, got_rgb = jax.jit(
        lambda: _fused_march_channels(params, ro, rd, vd, z, NET,
                                      compute_dtype=jnp.bfloat16))()
    # bf16 mantissa is 8 bits; raw sigma magnitudes reach ~40 on this
    # scene, so absolute tolerance scales with that
    np.testing.assert_allclose(np.asarray(got_s), np.asarray(want_s),
                               rtol=0.05, atol=0.5)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=0.05, atol=0.5)


def test_widepe_kernel_matches_reference(scene):
    from neuralsim_tpu.kernels.raymarch import fused_nerf_mlp_widepe
    from neuralsim_tpu.models.nerf import nerf_apply
    from neuralsim_tpu.ops.encoding import positional_encoding

    params, ro, rd, vd, z = scene
    pts = (ro[:, None, :] + rd[:, None, :] * z[..., None]).reshape(-1, 3)
    dirs = jnp.broadcast_to(
        vd[:, None, :], (vd.shape[0], z.shape[1], 3)).reshape(-1, 3)
    want = jax.jit(lambda: nerf_apply(
        params, positional_encoding(pts, NET.multires),
        positional_encoding(dirs, NET.multires_views), NET,
        compute_dtype=jnp.float32))()
    got = jax.jit(lambda: fused_nerf_mlp_widepe(
        params, pts, dirs, NET, compute_dtype=jnp.float32))()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-3, atol=2e-3)


def test_production_render_psnr_guard(scene):
    """End-to-end default path (transposed march + culled production) on
    device: production within the 40dB guard of exact on a small frame."""
    from neuralsim_tpu.models.nerf import make_sigma_fn
    from neuralsim_tpu.ops.occupancy import (
        build_scene_grid,
        calibrate_hit_budget,
        scene_half_extent,
    )
    from neuralsim_tpu.ops.render import render_poses
    from neuralsim_tpu.sampler.poses import pose_spherical
    import dataclasses

    params = scene[0]
    models = {"coarse": params, "fine": params}
    rc = RenderConfig(ray_chunk=16384,
                      compute_dtype="bfloat16").test_mode()
    H = W = 128
    K = np.array([[426.6667, 0.0, 62.5], [0.0, 426.9503, 64.2],
                  [0.0, 0.0, 1.0]], np.float32)
    poses = pose_spherical(jnp.asarray([30.0]), jnp.asarray([-30.0]), 1.01)
    sigma_fn = make_sigma_fn(params, NET)
    # the exact grid-construction path production uses (driver/pipeline)
    grid = build_scene_grid(sigma_fn, scene_half_extent(1.01, rc.far,
                                                        H, W, K),
                            resolution=64)
    budget = calibrate_hit_budget(grid, poses, H, W, K, rc)
    rc_prod = dataclasses.replace(rc, hit_budget=budget,
                                  tighten_bounds=True,
                                  n_importance_culled=64)
    exact = np.asarray(jax.jit(
        lambda p: render_poses(models, p, H, W, K, None, NET, rc)
        ["rgb_map"])(poses))
    prod = np.asarray(jax.jit(
        lambda p: render_poses(models, p, H, W, K, None, NET, rc_prod,
                               grid=grid)["rgb_map"])(poses))
    assert np.isfinite(exact).all() and np.isfinite(prod).all()
    mse = float(np.mean((exact - prod) ** 2))
    psnr = -10.0 * np.log10(max(mse, 1e-12))
    assert psnr > 40.0, f"production diverges from exact on-device: {psnr:.1f}"


def test_strips_psi_gradient_on_device(scene):
    """The production psi-gradient formulation (render_grad_psi_strips) is
    the round-2 bisect's ONLY RET_CHECK-green shape on the v5e backend
    (scan-free single tile, params closed over). A backend drift that
    re-introduces the lsrav2/live_range_finder abort, or numerically
    breaks the differentiated render, must trip this gate — finite AND
    non-zero grad on a real-density scene (a random-init NeRF has zero
    compositing weights everywhere and would pass vacuously)."""
    from neuralsim_tpu.config import SamplerConfig
    from neuralsim_tpu.hypergrad.render_grad import render_grad_psi_strips
    from neuralsim_tpu.sampler.poses import draw_pose_noise

    params = scene[0]
    models = {"coarse": params, "fine": params}
    rc = RenderConfig(n_samples=16, n_importance=16,
                      ray_chunk=4096).test_mode()
    sc = SamplerConfig()
    H = W = 24
    K = np.array([[80.0, 0.0, 12.0], [0.0, 80.0, 12.0], [0.0, 0.0, 1.0]],
                 np.float32)
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(2), sc, num_k=2)
    grad_E = jax.random.normal(jax.random.PRNGKey(3), (2, H, W, 3)) * 1e-2
    g = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, rc, sc, strip=H * W))
    assert g.shape == (8,)
    assert np.isfinite(g).all()
    assert float(np.abs(g).max()) > 0.0
