"""Golden tests for the renderer core against independent numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
from neuralsim_tpu.models.nerf import init_nerf_params, init_nerf_pipeline_params, nerf_apply, query_points
from neuralsim_tpu.ops.encoding import encoding_dim, positional_encoding
from neuralsim_tpu.ops.rays import get_rays
from neuralsim_tpu.ops.render import render_image, render_ray_batch, render_rays
from neuralsim_tpu.ops.volume import raw2outputs, sample_pdf, stratified_z_vals

from . import np_ref

NET = NeRFNetConfig()


def test_positional_encoding_matches_oracle(rng):
    x = rng.randn(17, 3).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.array(x), 10))
    want = np_ref.pe(x, 10)
    assert got.shape == (17, 63)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_encoding_dims():
    assert encoding_dim(3, 10) == 63 == NET.input_ch
    assert encoding_dim(3, 4) == 27 == NET.input_ch_views


def test_get_rays_matches_oracle(rng):
    K = np.array([[333.3, 0, 48.9], [0, 333.6, 50.2], [0, 0, 1.0]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[:3, :3] = rng.randn(3, 3).astype(np.float32)
    c2w[:3, 3] = [0.1, -0.2, 1.01]
    H = W = 7
    ro, rd = get_rays(H, W, K, c2w)
    assert ro.shape == (H, W, 3) and rd.shape == (H, W, 3)
    for (py, px) in [(0, 0), (3, 5), (6, 6)]:
        o, d = np_ref.rays_for_pixel(px, py, K, c2w)
        np.testing.assert_allclose(np.asarray(ro)[py, px], o, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(rd)[py, px], d, rtol=1e-4, atol=1e-5)


def test_stratified_z_vals_deterministic():
    z = stratified_z_vals(None, 5, 8, 2.0, 6.0, perturb=False)
    np.testing.assert_allclose(
        np.asarray(z[0]), np.linspace(2.0, 6.0, 8), rtol=1e-6
    )
    # lindisp spacing
    z = stratified_z_vals(None, 2, 4, 1.0, 2.0, perturb=False, lindisp=True)
    want = 1.0 / np.linspace(1.0, 0.5, 4)
    np.testing.assert_allclose(np.asarray(z[1]), want, rtol=1e-6)


def test_stratified_jitter_within_bins():
    key = jax.random.PRNGKey(3)
    z = np.asarray(stratified_z_vals(key, 64, 16, 2.0, 6.0, perturb=True))
    base = np.linspace(2.0, 6.0, 16)
    mids = 0.5 * (base[1:] + base[:-1])
    lower = np.concatenate([[base[0]], mids])
    upper = np.concatenate([mids, [base[-1]]])
    assert (z >= lower - 1e-6).all() and (z <= upper + 1e-6).all()
    assert np.abs(z - base).max() > 1e-3  # actually jittered


def test_raw2outputs_matches_oracle(rng):
    n, s = 11, 9
    raw = rng.randn(n, s, 4).astype(np.float32)
    z = np.sort(rng.uniform(1.0, 3.0, (n, s)).astype(np.float32), -1)
    rd = rng.randn(n, 3).astype(np.float32)
    rgb, disp, acc, w, depth = raw2outputs(jnp.array(raw), jnp.array(z), jnp.array(rd))
    for i in range(n):
        want_rgb, want_acc, want_w, want_depth = np_ref.composite(raw[i], z[i], rd[i])
        np.testing.assert_allclose(np.asarray(rgb)[i], want_rgb, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(acc)[i], want_acc, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(w)[i], want_w, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(depth)[i], want_depth, rtol=1e-4, atol=1e-5)


def test_raw2outputs_white_bkgd(rng):
    raw = np.zeros((2, 4, 4), np.float32)
    raw[..., 3] = -5.0  # no density -> empty ray
    z = np.broadcast_to(np.linspace(1, 2, 4, dtype=np.float32), (2, 4)).copy()
    rd = np.tile(np.array([[0.0, 0.0, -1.0]], np.float32), (2, 1))
    rgb, _, acc, _, _ = raw2outputs(
        jnp.array(raw), jnp.array(z), jnp.array(rd), white_bkgd=True
    )
    np.testing.assert_allclose(np.asarray(rgb), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), 0.0, atol=1e-6)


def test_sample_pdf_deterministic_matches_oracle(rng):
    n, b, m = 6, 13, 21
    bins = np.sort(rng.uniform(1, 3, (n, b)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (n, b - 1)).astype(np.float32)
    got = np.asarray(
        sample_pdf(jax.random.PRNGKey(0), jnp.array(bins), jnp.array(weights), m, det=True)
    )
    u = np.linspace(0.0, 1.0, m)
    for i in range(n):
        want = np_ref.invert_cdf(bins[i], weights[i], u)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def test_sample_pdf_concentrates_on_peak():
    # all weight in one bin -> all samples inside that bin
    bins = jnp.linspace(0.0, 10.0, 11)[None, :]
    weights = jnp.zeros((1, 10)).at[0, 4].set(1.0)
    s = np.asarray(sample_pdf(jax.random.PRNGKey(1), bins, weights, 64, det=False))
    inside = ((s >= 4.0) & (s <= 5.0)).mean()
    assert inside > 0.95


def test_mlp_matches_oracle(rng):
    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    np_params = {k: np.asarray(v) for k, v in params.items()}
    x = rng.randn(5, 63).astype(np.float32)
    d = rng.randn(5, 27).astype(np.float32)
    got = np.asarray(nerf_apply(params, jnp.array(x), jnp.array(d), NET))
    want = np_ref.mlp_forward(np_params, x, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_query_points_shapes():
    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    pts = jnp.ones((4, 6, 3))
    vd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (4, 1))
    raw = query_points(params, pts, vd, NET)
    assert raw.shape == (4, 6, 4)


def _tiny_setup(n_importance=8):
    net = NeRFNetConfig(netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                        skips=(0,), multires=4, multires_views=2)
    rc = RenderConfig(n_samples=8, n_importance=n_importance, perturb=False,
                      near=0.5, far=2.0, ray_chunk=16)
    models = init_nerf_pipeline_params(jax.random.PRNGKey(7), net, rc.n_importance)
    return net, rc, models


def test_render_rays_coarse_fine_keys():
    net, rc, models = _tiny_setup()
    ro = jnp.zeros((5, 3))
    rd = jnp.tile(jnp.array([[0.0, 0.0, -1.0]]), (5, 1))
    vd = rd
    out = render_rays(models, ro, rd, vd, jax.random.PRNGKey(0), net, rc)
    assert set(out) >= {"rgb_map", "disp_map", "acc_map", "rgb0", "z_std"}
    assert out["rgb_map"].shape == (5, 3)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()
    assert np.isfinite(np.asarray(out["disp_map"])).all()


def test_render_ray_batch_tiling_invariance():
    """Chunk size must not change results (reference render() docstring
    guarantee for `chunk`)."""
    net, rc, models = _tiny_setup()
    n = 53  # deliberately not a multiple of any chunk
    key = jax.random.PRNGKey(2)
    rd = jax.random.normal(key, (n, 3))
    ro = jnp.zeros((n, 3))
    big = render_ray_batch(models, ro, rd, None, net,
                           rc.__class__(**{**rc.__dict__, "ray_chunk": 64}))
    small = render_ray_batch(models, ro, rd, None, net,
                             rc.__class__(**{**rc.__dict__, "ray_chunk": 8}))
    np.testing.assert_allclose(
        np.asarray(big["rgb_map"]), np.asarray(small["rgb_map"]), rtol=1e-4, atol=1e-5
    )


def test_render_image_shape_and_jit():
    net, rc, models = _tiny_setup()
    K = np.array([[30.0, 0, 8.0], [0, 30.0, 8.0], [0, 0, 1]], np.float32)
    c2w = np.eye(4, dtype=np.float32)
    c2w[2, 3] = 1.5
    f = jax.jit(
        lambda m, p: render_image(m, p, 16, 16, K, None, net, rc.test_mode())
    )
    out = f(models, jnp.array(c2w))
    assert out["rgb_map"].shape == (16, 16, 3)
    assert out["disp_map"].shape == (16, 16)
    assert np.isfinite(np.asarray(out["rgb_map"])).all()


def test_render_differentiable_wrt_pose():
    """dL/dpose flows through get_rays -> render (the psi gradient path)."""
    net, rc, models = _tiny_setup(n_importance=4)
    K = np.array([[30.0, 0, 4.0], [0, 30.0, 4.0], [0, 0, 1]], np.float32)

    def loss(tz):
        c2w = jnp.eye(4).at[2, 3].set(tz)
        out = render_image(models, c2w, 8, 8, K, None, net, rc.test_mode())
        return jnp.sum(out["rgb_map"])

    g = jax.grad(loss)(1.5)
    assert np.isfinite(float(g))
    # finite-difference check
    eps = 1e-3
    fd = (loss(1.5 + eps) - loss(1.5 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(g), float(fd), rtol=0.05, atol=1e-3)
