"""Round-4 production levers (VERDICT r3 #1):

  - rc.reuse_coarse — the fine composite merges the coarse network's raw
    field values instead of re-evaluating those positions under the fine
    net (the reference re-marches all 64+128 samples,
    run_nerf_noscale.py:470-486)
  - n_importance_culled=0 — single-pass grid-guided production: routed
    rays march once, uniformly inside their tightened z-interval, with no
    coarse/fine split (the occupancy grid replaces the coarse network as
    the importance mechanism)
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
from neuralsim_tpu.ops.render import render_image, render_rays

from tests.test_occupancy import NET, RC, _box_density_params

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate


@pytest.fixture(scope="module")
def box_scene():
    from neuralsim_tpu.models.nerf import make_sigma_fn
    from neuralsim_tpu.ops.occupancy import build_occupancy_grid

    params = _box_density_params(jax.random.PRNGKey(0), half=0.15)
    models = {"coarse": params, "fine": params}
    grid = build_occupancy_grid(
        make_sigma_fn(params, NET),
        bbox_min=(-0.8, -0.8, -0.8), bbox_max=(0.8, 0.8, 0.8),
        resolution=48, threshold=1e-2, dilate=2, subsamples=2, chunk=65536,
    )
    return models, grid


def _rays(n=64):
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, (n, 3)) * 0.15 + jnp.array([0.0, 0.0, -1.0])
    ro = jnp.zeros((n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


_CAM = dict(
    H=32, W=32,
    K=np.array([[40.0, 0, 16.0], [0, 40.0, 16.0], [0, 0, 1.0]], np.float32),
    c2w=jnp.array([[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 1.2],
                   [0, 0, 0, 1.0]]),
)


def _img(models, rc, grid=None):
    return np.asarray(render_image(
        models, _CAM["c2w"], _CAM["H"], _CAM["W"], _CAM["K"], None, NET, rc,
        grid=grid)["rgb_map"])


def _psnr(a, b):
    mse = float(np.mean((a - b) ** 2))
    return -10.0 * np.log10(max(mse, 1e-12))


def test_reuse_identical_nets_matches_exact():
    """With fine == coarse params (and no perturb/noise) the reuse path is
    mathematically the exact fine pass: the raws it merges at the coarse z
    positions equal what re-evaluation would produce."""
    models = init_nerf_pipeline_params(jax.random.PRNGKey(1), NET, 16)
    models = {"coarse": models["coarse"], "fine": models["coarse"]}
    ro, rd, vd = _rays()
    exact = render_rays(models, ro, rd, vd, None, NET, RC)
    reuse = render_rays(models, ro, rd, vd, None, NET,
                        dataclasses.replace(RC, reuse_coarse=True))
    np.testing.assert_allclose(np.asarray(reuse["rgb_map"]),
                               np.asarray(exact["rgb_map"]),
                               rtol=2e-5, atol=2e-6)
    np.testing.assert_allclose(np.asarray(reuse["depth_map"]),
                               np.asarray(exact["depth_map"]),
                               rtol=2e-5, atol=2e-6)
    # coarse outputs are untouched by the lever
    np.testing.assert_allclose(np.asarray(reuse["rgb0"]),
                               np.asarray(exact["rgb0"]), rtol=1e-6)


def test_reuse_distinct_nets_finite_and_differentiable():
    models = init_nerf_pipeline_params(jax.random.PRNGKey(1), NET, 16)
    ro, rd, vd = _rays(32)
    rc = dataclasses.replace(RC, reuse_coarse=True)

    out = render_rays(models, ro, rd, vd, None, NET, rc)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    assert out["rgb_map"].shape == (32, 3)
    assert "z_std" in out

    def loss(o):
        return jnp.sum(render_rays(models, o, rd, vd, None, NET,
                                   rc)["rgb_map"] ** 2)

    g = jax.grad(loss)(ro)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_reuse_quality_on_box_scene(box_scene):
    """reuse_coarse must cost ~nothing relative to its non-reuse twin: with
    identical coarse/fine params the merged composite is bit-equal to the
    re-evaluating fine pass (the tightened baseline itself sits at ~36dB on
    this deliberately near-discontinuous scene — sample-placement artifact
    guarded elsewhere at >28dB; the >40dB production guard is enforced on
    the real fitted scene by bench.py and the driver's first-epoch guard)."""
    models, grid = box_scene
    exact = _img(models, RC)
    rc_t = dataclasses.replace(RC, hit_budget=0.5, tighten_bounds=True)
    rc_r = dataclasses.replace(rc_t, reuse_coarse=True)
    twin = _img(models, rc_t, grid=grid)
    got = _img(models, rc_r, grid=grid)
    assert _psnr(got, twin) > 60.0, "reuse diverged from its non-reuse twin"
    assert _psnr(got, exact) > 28.0


def test_single_pass_production_quality(box_scene):
    """n_importance_culled=0: routed rays march ONCE uniformly inside the
    tightened interval — no sample_pdf, no fine net. The grid replaces the
    coarse network as the importance mechanism. At 64 uniform samples in
    the tightened interval the mode clears the >40dB production guard even
    on this near-discontinuous scene; 32 degrades gracefully."""
    models, grid = box_scene
    exact = _img(models, RC)
    rc64 = dataclasses.replace(RC, hit_budget=0.5, tighten_bounds=True,
                               n_samples_culled=64, n_importance_culled=0)
    assert _psnr(_img(models, rc64, grid=grid), exact) > 40.0
    rc32 = dataclasses.replace(rc64, n_samples_culled=32)
    assert _psnr(_img(models, rc32, grid=grid), exact) > 30.0


def test_single_pass_differentiable(box_scene):
    models, grid = box_scene
    rc_sp = dataclasses.replace(RC, hit_budget=0.5, tighten_bounds=True,
                                n_samples_culled=16, n_importance_culled=0,
                                ray_chunk=256)
    from neuralsim_tpu.ops.render import render_poses
    from neuralsim_tpu.sampler.poses import pose_spherical

    H = W = 16
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1.0]], np.float32)

    def loss(phi):
        poses = pose_spherical(jnp.array([90.0]), phi[None], 1.2)
        out = render_poses(models, poses, H, W, K, None, NET, rc_sp,
                           grid=grid)
        return jnp.sum(out["rgb_map"])

    g = jax.jit(jax.grad(loss))(jnp.asarray(20.0))
    assert np.isfinite(float(g))


def test_reuse_plus_reduced_importance(box_scene):
    """The stacked production config the bench ladder probes: cull +
    tighten + reduced importance count + coarse-raw reuse. The reuse lever
    must remain lossless relative to its non-reuse twin inside the stack,
    and the stack stays within graceful degradation of the exact render."""
    models, grid = box_scene
    exact = _img(models, RC)
    rc = dataclasses.replace(RC, hit_budget=0.5, tighten_bounds=True,
                             n_samples_culled=16, n_importance_culled=8,
                             reuse_coarse=True)
    twin = dataclasses.replace(rc, reuse_coarse=False)
    got = _img(models, rc, grid=grid)
    assert _psnr(got, _img(models, twin, grid=grid)) > 60.0
    assert _psnr(got, exact) > 28.0
