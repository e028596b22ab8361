"""psi render-gradient modes: the strip-decomposed host-loop gradient (the
scan-free shape the current v5e backend requires) is EXACTLY the whole-image
reverse-mode gradient, for both psi parameterizations."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig, SamplerConfig
from neuralsim_tpu.hypergrad.render_grad import (
    render_grad_psi_fwd,
    render_grad_psi_rev,
    render_grad_psi_strips,
)
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
from neuralsim_tpu.sampler.poses import (

    draw_pose_noise,
    draw_pose_noise_gaussian,
)

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate

NET = NeRFNetConfig(netdepth=2, netwidth=16, netdepth_fine=2, netwidth_fine=16,
                    skips=(0,), multires=2, multires_views=1)
RC = RenderConfig(n_samples=4, n_importance=4, ray_chunk=4096, near=0.5,
                  far=2.0).test_mode()
SC = SamplerConfig()
H = W = 12
K = np.array([[15.0, 0, 6.0], [0, 15.0, 6.0], [0, 0, 1.0]], np.float32)


@pytest.fixture(scope="module")
def scene():
    models = init_nerf_pipeline_params(jax.random.PRNGKey(0), NET,
                                       RC.n_importance)
    grad_E = jax.random.normal(jax.random.PRNGKey(1), (3, H, W, 3)) * 1e-2
    return models, grad_E


def test_strips_match_rev_categorical(scene):
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(2), SC, num_k=3)

    g_rev = np.asarray(render_grad_psi_rev(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC))
    # strip smaller than one image -> multiple strips per image, padded tail
    g_strips = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=50))
    np.testing.assert_allclose(g_strips, g_rev, rtol=1e-4, atol=1e-7)

    # one-strip-per-image path too
    g_strips1 = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=H * W))
    np.testing.assert_allclose(g_strips1, g_rev, rtol=1e-4, atol=1e-7)


def test_strips_match_fwd_gaussian(scene):
    models, grad_E = scene
    psi = jnp.array([157.5, 20.0], jnp.float32)
    noise = draw_pose_noise_gaussian(jax.random.PRNGKey(3), SC, num_k=3)

    g_fwd = np.asarray(render_grad_psi_fwd(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC,
        psi_mode="gaussian"))
    g_strips = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC,
        psi_mode="gaussian", strip=64))
    assert g_strips.shape == (2,)
    np.testing.assert_allclose(g_strips, g_fwd, rtol=1e-4, atol=1e-7)


def test_strip_jit_cache_reused(scene):
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32)
    noise = draw_pose_noise(jax.random.PRNGKey(4), SC, num_k=3)
    cache = {}
    render_grad_psi_strips(models, psi, noise, grad_E, H, W, K, NET, RC, SC,
                           strip=64, jit_cache=cache)
    # one program per strip offset (144 px at strip 64 -> 64+64+16), shared
    # across all images and reused across calls
    assert len(cache) == 3
    render_grad_psi_strips(models, psi, noise, grad_E, H, W, K, NET, RC, SC,
                           strip=64, jit_cache=cache)
    assert len(cache) == 3


def test_strip_cache_invalidates_on_model_swap(scene):
    """Regression (ADVICE r2): cache entries embed the model weights as
    compile-time constants. Swapping the model pytree (old one GC'd — the
    id()-reuse hazard) must recompile, not serve stale-weight programs."""
    import gc

    _, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32)
    noise = draw_pose_noise(jax.random.PRNGKey(5), SC, num_k=3)
    cache = {}

    models_a = init_nerf_pipeline_params(jax.random.PRNGKey(10), NET,
                                         RC.n_importance)
    g_a = np.asarray(render_grad_psi_strips(
        models_a, psi, noise, grad_E, H, W, K, NET, RC, SC,
        strip=H * W, jit_cache=cache))
    del models_a
    gc.collect()

    models_b = init_nerf_pipeline_params(jax.random.PRNGKey(11), NET,
                                         RC.n_importance)
    g_b_shared = np.asarray(render_grad_psi_strips(
        models_b, psi, noise, grad_E, H, W, K, NET, RC, SC,
        strip=H * W, jit_cache=cache))
    g_b_fresh = np.asarray(render_grad_psi_strips(
        models_b, psi, noise, grad_E, H, W, K, NET, RC, SC,
        strip=H * W, jit_cache={}))
    np.testing.assert_allclose(g_b_shared, g_b_fresh, rtol=1e-6)
    # and the models genuinely differ, so a stale program would show
    assert not np.allclose(g_a, g_b_fresh)


def test_strips_accept_numpy_leaves(scene):
    """Model pytrees with NUMPY leaves (straight from load_params_npz)
    must work: numpy arrays aren't weakref-able, so the cache falls back
    to a strong reference (round-3 review finding)."""
    models, grad_E = scene
    models_np = jax.tree_util.tree_map(np.asarray, models)
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(6), SC, num_k=3)
    cache = {}
    g_np = np.asarray(render_grad_psi_strips(
        models_np, psi, noise, grad_E, H, W, K, NET, RC, SC,
        strip=H * W, jit_cache=cache))
    g_jnp = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=H * W))
    np.testing.assert_allclose(g_np, g_jnp, rtol=1e-5, atol=1e-8)
    # the strong-ref fallback still reuses programs across calls
    n = len(cache)
    render_grad_psi_strips(models_np, psi, noise, grad_E, H, W, K, NET, RC,
                           SC, strip=H * W, jit_cache=cache)
    assert len(cache) == n


def test_strips_image_batch_matches_serial(scene):
    """image_batch > 1 (round-4 dispatch-count lever, VERDICT r3 #2) is
    EXACTLY the serial one-image-per-program gradient — including a padded
    image tail (3 images at batch 2) and a padded strip tail."""
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(7), SC, num_k=3)

    g_serial = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64))
    for ib in (2, 3, 8):
        g_b = np.asarray(render_grad_psi_strips(
            models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
            image_batch=ib))
        np.testing.assert_allclose(g_b, g_serial, rtol=1e-5, atol=1e-8,
                                   err_msg=f"image_batch={ib}")


def test_strips_mesh_sharding_invariance(scene):
    """Mesh-sharded strips gradient (shard_map over the data axis) equals
    the serial host-loop gradient — the VERDICT r3 #2 done-condition."""
    from neuralsim_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=8, model=1)

    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[2].set(0.5)
    noise = draw_pose_noise(jax.random.PRNGKey(8), SC, num_k=3)

    g_serial = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64))
    # 3 images pad to the 8-wide data axis (zero grad_E on padded rows)
    g_mesh = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        mesh=mesh))
    np.testing.assert_allclose(g_mesh, g_serial, rtol=1e-5, atol=1e-8)

    # gaussian psi parameterization through the mesh path too
    psi_g = jnp.array([157.5, 20.0], jnp.float32)
    noise_g = draw_pose_noise_gaussian(jax.random.PRNGKey(9), SC, num_k=3)
    g_serial_g = np.asarray(render_grad_psi_strips(
        models, psi_g, noise_g, grad_E, H, W, K, NET, RC, SC,
        psi_mode="gaussian", strip=H * W))
    g_mesh_g = np.asarray(render_grad_psi_strips(
        models, psi_g, noise_g, grad_E, H, W, K, NET, RC, SC,
        psi_mode="gaussian", strip=H * W, mesh=mesh))
    np.testing.assert_allclose(g_mesh_g, g_serial_g, rtol=1e-5, atol=1e-8)


def test_strips_batched_remat_matches_no_remat(scene):
    """Single-tile remat in the batched strip program (the round-4
    dispatch-count lever for the 400^2 grad pass) changes memory, not
    values."""
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(12), SC, num_k=3)
    g_plain = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        image_batch=3))
    g_remat = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET,
        dataclasses.replace(RC, remat=True), SC, strip=64, image_batch=3))
    np.testing.assert_allclose(g_remat, g_plain, rtol=1e-5, atol=1e-9)
