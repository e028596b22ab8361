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


def _live_models(key):
    """Random init with the density head biased positive: a raw init can
    emit sigma <= 0 along every fixture ray, in which case relu kills the
    whole render and EVERY psi gradient is exactly zero — comparisons
    would vacuously pass as 0 == 0 (found round 4: the seed-0 fine net
    did exactly that)."""
    models = init_nerf_pipeline_params(key, NET, RC.n_importance)
    return {m: {**p, "alpha_bias": p["alpha_bias"] + 1.0}
            for m, p in models.items()}


@pytest.fixture(scope="module")
def scene():
    models = _live_models(jax.random.PRNGKey(0))
    grad_E = jax.random.normal(jax.random.PRNGKey(1), (3, H, W, 3)) * 1e-2
    return models, grad_E


def test_strips_match_rev_categorical(scene):
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(2), SC, num_k=3)

    g_rev = np.asarray(render_grad_psi_rev(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC))
    assert np.linalg.norm(g_rev) > 0  # non-vacuity: 0 == 0 proves nothing
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
    assert np.linalg.norm(g_fwd) > 0  # non-vacuity
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

    models_a = _live_models(jax.random.PRNGKey(10))
    g_a = np.asarray(render_grad_psi_strips(
        models_a, psi, noise, grad_E, H, W, K, NET, RC, SC,
        strip=H * W, jit_cache=cache))
    del models_a
    gc.collect()

    models_b = _live_models(jax.random.PRNGKey(11))
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


def test_strips_bf16_compute_dtype_close_to_f32(scene):
    """compute_dtype="bfloat16" (legal since the 2026-08 libtpu fix — the
    old backend RET_CHECKed on differentiated bf16 graphs) yields the same
    gradient DIRECTION as the f32 oracle; serial and batched paths both
    honor the override and cache-key on it."""
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(13), SC, num_k=3)

    g_f32 = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64))
    cache = {}
    g_bf16 = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        jit_cache=cache, compute_dtype="bfloat16"))
    g_bf16_b = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        jit_cache=cache, image_batch=3, compute_dtype="bfloat16"))

    def cos(a, b):
        return float(np.dot(a, b) / (np.linalg.norm(a) * np.linalg.norm(b)))

    assert cos(g_bf16, g_f32) > 0.99
    # batched bf16 equals serial bf16 exactly up to reduction order
    np.testing.assert_allclose(g_bf16_b, g_bf16, rtol=1e-2,
                               atol=1e-4 * np.abs(g_bf16).max())
    # distinct cache entries: dtype is part of the jit key
    kinds = {k[0] for k in cache}
    assert kinds == {"strip_grad", "strip_grad_batch"}


def test_strips_dynamic_start_matches_static(scene):
    """dynamic_start=True (traced strip offset -> ONE program per strip
    LENGTH instead of one per offset; legal since the 2026-08 libtpu
    scalar-address fix) is numerically identical to the static-offset
    programs, for both the serial and batched paths — and actually
    collapses the program count."""
    models, grad_E = scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(14), SC, num_k=3)

    g_static = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64))
    assert np.linalg.norm(g_static) > 0  # non-vacuity

    cache = {}
    g_dyn = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        jit_cache=cache, dynamic_start=True))
    np.testing.assert_allclose(g_dyn, g_static, rtol=1e-5, atol=1e-9)
    # 144 px at strip 64 -> offsets {0, 64} share one 64-long program,
    # the 16-long tail gets its own: exactly 2 entries, not 3
    assert len(cache) == 2
    assert all(k[1] is None for k in cache)

    g_dyn_b = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        jit_cache=cache, image_batch=3, dynamic_start=True))
    np.testing.assert_allclose(g_dyn_b, g_static, rtol=1e-5, atol=1e-9)
    assert len(cache) == 4  # +2 batched length-programs, offset-free too


@pytest.fixture(scope="module")
def culled_scene():
    """Compactly-supported EXACT box density (bench.box_scene_params):
    outside the box the MLP emits sigma <= 0, so rays missing the occupancy
    AABB have IDENTICALLY zero psi-gradient — the culled strips gradient
    must equal the dense one to float precision, not just approximately."""
    from bench import box_scene_params
    from neuralsim_tpu.models.nerf import make_sigma_fn
    from neuralsim_tpu.ops.occupancy import build_scene_grid, scene_half_extent

    # half=0.12 -> ~27% of the 12x12 frame's rays hit the AABB (slab test
    # over z in [near, far]), so hit_budget=0.5 exercises the SELECTION
    # branch with margin; a bigger box overflows the budget and the tests
    # would all (vacuously) take the full-coverage fallback
    params = box_scene_params(NET, jax.random.PRNGKey(0), half=0.12)
    models = {"coarse": params, "fine": params}
    grid = build_scene_grid(
        make_sigma_fn(params, NET),
        scene_half_extent(SC.radius, RC.far, H, W, K))
    grad_E = jax.random.normal(jax.random.PRNGKey(20), (3, H, W, 3)) * 1e-2
    return models, grid, grad_E


def test_strips_culled_matches_dense(culled_scene, caplog):
    """grid + hit_budget < 1: gather-rendered top-scoring rays only ==
    the dense all-pixels gradient (serial AND batched), with one compiled
    program per strip length (the traced index vector subsumes offsets)."""
    import logging

    models, grid, grad_E = culled_scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(21), SC, num_k=3)

    g_dense = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=32))
    assert np.linalg.norm(g_dense) > 0  # non-vacuity

    cache = {}
    with caplog.at_level(logging.WARNING,
                         logger="neuralsim_tpu.hypergrad.render_grad"):
        g_culled = np.asarray(render_grad_psi_strips(
            models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=32,
            jit_cache=cache, grid=grid, hit_budget=0.5))
    # the SELECTION branch must have run (no overflow fallback), else the
    # equality below is vacuous — it would compare full coverage to itself
    assert not any("falling back" in r.message for r in caplog.records)
    np.testing.assert_allclose(g_culled, g_dense, rtol=1e-4, atol=2e-8)
    kinds = sorted(k[0] for k in cache)
    assert kinds == ["strip_grad_gather", "strip_sel"]

    g_culled_b = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=32,
        jit_cache=cache, image_batch=3, grid=grid, hit_budget=0.5))
    np.testing.assert_allclose(g_culled_b, g_dense, rtol=1e-4, atol=2e-8)
    assert sum(k[0] == "strip_grad_gather_batch" for k in cache) == 1


def test_strips_culled_overflow_falls_back(culled_scene, caplog):
    """A budget below the true hit count falls back to gather-rendering
    every pixel (logged) — never a silently truncated gradient."""
    import logging

    models, grid, grad_E = culled_scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(22), SC, num_k=3)

    g_dense = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=8))
    with caplog.at_level(logging.WARNING,
                         logger="neuralsim_tpu.hypergrad.render_grad"):
        g_tiny = np.asarray(render_grad_psi_strips(
            models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=8,
            grid=grid, hit_budget=0.01))
    assert any("falling back" in r.message for r in caplog.records)
    np.testing.assert_allclose(g_tiny, g_dense, rtol=1e-4, atol=2e-8)


def test_strips_culled_overflow_is_per_image(caplog):
    """When SOME images exceed the selection budget, only those images fall
    back to all-pixels gather rendering; the rest keep their selection —
    verified by equality with the dense gradient AND by dispatch counts
    (overflow image: full-coverage chunks; others: budget chunks)."""
    import logging

    from bench import box_scene_params
    from neuralsim_tpu.models.nerf import make_sigma_fn
    from neuralsim_tpu.ops.occupancy import build_scene_grid, scene_half_extent

    # off-center box -> azimuth-dependent per-image hit counts: seed 22
    # draws 3 poses with hits [17, 41, 31] of 144 rays (measured); a
    # 32-ray budget (hit_budget=0.22, strip 8) overflows ONLY image 1
    params = box_scene_params(NET, jax.random.PRNGKey(0), half=0.10,
                              center=(0.25, 0.0, 0.0))
    models = {"coarse": params, "fine": params}
    grid = build_scene_grid(
        make_sigma_fn(params, NET),
        scene_half_extent(SC.radius, RC.far, H, W, K))
    grad_E = jax.random.normal(jax.random.PRNGKey(26), (3, H, W, 3)) * 1e-2
    psi = jnp.zeros((8,), jnp.float32)
    noise = draw_pose_noise(jax.random.PRNGKey(2), SC, num_k=3)

    g_dense = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=8))
    assert np.linalg.norm(g_dense) > 0

    cache = {}
    with caplog.at_level(logging.WARNING,
                         logger="neuralsim_tpu.hypergrad.render_grad"):
        g_mixed = np.asarray(render_grad_psi_strips(
            models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=8,
            jit_cache=cache, grid=grid, hit_budget=0.22))
    msgs = [r.message for r in caplog.records if "falling back" in r.message]
    assert msgs and "1/3 images" in msgs[0]
    np.testing.assert_allclose(g_mixed, g_dense, rtol=1e-4, atol=2e-8)

    # dispatch accounting on a second call through counting wrappers:
    # 2 within-budget images x (32/8) chunks + 1 overflow image x (144/8)
    # chunks — NOT 3 x 18 (the old whole-call cliff)
    counts = {"gather": 0, "sel": 0}

    def wrap(fn, k):
        def counted(*a, **kw):
            counts[k] += 1
            return fn(*a, **kw)
        return counted

    for ckey, (leaf_, fn) in list(cache.items()):
        kind = {"strip_grad_gather": "gather", "strip_sel": "sel"}.get(ckey[0])
        if kind:
            cache[ckey] = (leaf_, wrap(fn, kind))
    g_again = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=8,
        jit_cache=cache, grid=grid, hit_budget=0.22))
    np.testing.assert_allclose(g_again, g_dense, rtol=1e-4, atol=2e-8)
    assert counts == {"gather": 2 * 4 + 1 * 18, "sel": 1}

    # batched path takes the same per-image split
    g_batched = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=8,
        image_batch=2, grid=grid, hit_budget=0.22))
    np.testing.assert_allclose(g_batched, g_dense, rtol=1e-4, atol=2e-8)


def test_strips_culled_full_budget_skips_selection(culled_scene):
    """hit_budget that rounds up to every pixel routes straight to the
    full-coverage gather path: no selection program, same gradient."""
    models, grid, grad_E = culled_scene
    psi = jnp.zeros((8,), jnp.float32).at[4].set(1.0)
    noise = draw_pose_noise(jax.random.PRNGKey(23), SC, num_k=3)

    g_dense = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64))
    cache = {}
    g_full = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=64,
        jit_cache=cache, grid=grid, hit_budget=0.99))
    np.testing.assert_allclose(g_full, g_dense, rtol=1e-4, atol=2e-8)
    assert not any(k[0] == "strip_sel" for k in cache)


def test_strips_culled_mesh_matches_dense(culled_scene):
    """Culled strips gradient through the mesh shard_map path (gather
    indices sharded with the images over the data axis)."""
    from neuralsim_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device virtual mesh")
    mesh = make_mesh(data=8, model=1)

    models, grid, grad_E = culled_scene
    psi = jnp.zeros((8,), jnp.float32).at[2].set(0.5)
    noise = draw_pose_noise(jax.random.PRNGKey(24), SC, num_k=3)

    g_dense = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=32))
    g_mesh = np.asarray(render_grad_psi_strips(
        models, psi, noise, grad_E, H, W, K, NET, RC, SC, strip=32,
        mesh=mesh, grid=grid, hit_budget=0.5))
    # atol 1e-8: the 8-shard psum reorders the float reduction
    np.testing.assert_allclose(g_mesh, g_dense, rtol=1e-4, atol=2e-8)


def test_strips_culled_gaussian_psi(culled_scene):
    """Culled selection composes with the gaussian psi parameterization."""
    models, grid, grad_E = culled_scene
    psi_g = jnp.array([157.5, 20.0], jnp.float32)
    noise_g = draw_pose_noise_gaussian(jax.random.PRNGKey(25), SC, num_k=3)

    g_dense = np.asarray(render_grad_psi_strips(
        models, psi_g, noise_g, grad_E, H, W, K, NET, RC, SC,
        psi_mode="gaussian", strip=48))
    g_culled = np.asarray(render_grad_psi_strips(
        models, psi_g, noise_g, grad_E, H, W, K, NET, RC, SC,
        psi_mode="gaussian", strip=48, grid=grid, hit_budget=0.5))
    np.testing.assert_allclose(g_culled, g_dense, rtol=1e-4, atol=2e-8)
