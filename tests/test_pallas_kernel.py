"""Fused Pallas MLP kernel vs the jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig
from neuralsim_tpu.kernels.raymarch import (
    _fused_forward,
    _fused_forward_pe,
    fused_nerf_mlp,
)
from neuralsim_tpu.models.nerf import init_nerf_params, nerf_apply
from neuralsim_tpu.ops.encoding import positional_encoding

NET = NeRFNetConfig()


def test_pe_fused_matches_reference_interpret(rng):
    import jax.numpy as jnp

    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    n = 200
    pts = jnp.array(rng.randn(n, 3).astype(np.float32))
    dirs = jnp.array(rng.randn(n, 3).astype(np.float32))
    want = np.asarray(nerf_apply(
        params, positional_encoding(pts, NET.multires),
        positional_encoding(dirs, NET.multires_views), NET,
    ))
    got = np.asarray(_fused_forward_pe(params, pts, dirs, NET,
                                       compute_dtype=jnp.float32, tile=128,
                                       interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_matches_reference_interpret(rng):
    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    n = 300  # not a multiple of the tile -> exercises padding
    x = jnp.array(rng.randn(n, 63).astype(np.float32))
    d = jnp.array(rng.randn(n, 27).astype(np.float32))

    want = np.asarray(nerf_apply(params, x, d, NET))
    got = np.asarray(_fused_forward(params, x, d, NET,
                                    compute_dtype=jnp.float32, tile=128,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_skip_split_correct(rng):
    """Skip layer split-matmul must equal the concat formulation exactly."""
    net = NeRFNetConfig(netdepth=4, netwidth=32, skips=(1,), multires=2,
                        multires_views=1)
    params = init_nerf_params(jax.random.PRNGKey(1), net)
    x = jnp.array(rng.randn(64, net.input_ch).astype(np.float32))
    d = jnp.array(rng.randn(64, net.input_ch_views).astype(np.float32))
    want = np.asarray(nerf_apply(params, x, d, net))
    got = np.asarray(_fused_forward(params, x, d, net,
                                    compute_dtype=jnp.float32, tile=64,
                                    interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_custom_vjp_gradient_matches(rng):
    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    x = jnp.array(rng.randn(32, 63).astype(np.float32))
    d = jnp.array(rng.randn(32, 27).astype(np.float32))
    g_out = jnp.array(rng.randn(32, 4).astype(np.float32))

    # bwd of the fused op recomputes via the jnp reference; compare against
    # direct autodiff of the reference
    def loss_ref(p):
        return jnp.sum(nerf_apply(p, x, d, NET) * g_out)

    want = jax.grad(loss_ref)(params)

    # use the interpret-mode fwd via monkeypatched _fused_forward? simpler:
    # call the custom_vjp's bwd indirectly by differentiating the reference
    # formulation the bwd uses — equality is structural. Here we only check
    # the vjp wiring shape-compatibility through jax.vjp on CPU interpret.
    from neuralsim_tpu.kernels import raymarch

    orig = raymarch._fused_forward
    raymarch._fused_forward = lambda p, xx, dd, net, cd, tile=2048: orig(
        p, xx, dd, net, jnp.float32, 128, interpret=True
    )
    try:
        got = jax.grad(
            lambda p: jnp.sum(fused_nerf_mlp(p, x, d, NET, jnp.float32) * g_out)
        )(params)
    finally:
        raymarch._fused_forward = orig

    for k in want:
        np.testing.assert_allclose(
            np.asarray(got[k]), np.asarray(want[k]), rtol=1e-3, atol=1e-4
        )


def test_widepe_fused_matches_reference_interpret(rng):
    """Wide-lane PE fusion (one selector matmul + one fused sin) must equal
    the jnp path exactly: same PE channel order, zero pad lanes hitting zero
    weight rows."""
    from neuralsim_tpu.kernels.raymarch import _fused_forward_widepe

    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    n = 200  # not a tile multiple -> exercises padding
    pts = jnp.array(rng.randn(n, 3).astype(np.float32))
    dirs = jnp.array(rng.randn(n, 3).astype(np.float32))
    want = np.asarray(nerf_apply(
        params, positional_encoding(pts, NET.multires),
        positional_encoding(dirs, NET.multires_views), NET,
    ))
    got = np.asarray(_fused_forward_widepe(params, pts, dirs, NET,
                                           compute_dtype=jnp.float32,
                                           tile=128, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_widepe_skip_layer_padding(rng):
    """Skip-layer wide-PE split (padded PE block + hidden block) on a small
    net with an early skip."""
    from neuralsim_tpu.kernels.raymarch import _fused_forward_widepe

    net = NeRFNetConfig(netdepth=4, netwidth=32, skips=(1,), multires=2,
                        multires_views=1)
    params = init_nerf_params(jax.random.PRNGKey(1), net)
    pts = jnp.array(rng.randn(64, 3).astype(np.float32))
    dirs = jnp.array(rng.randn(64, 3).astype(np.float32))
    want = np.asarray(nerf_apply(
        params, positional_encoding(pts, net.multires),
        positional_encoding(dirs, net.multires_views), net,
    ))
    got = np.asarray(_fused_forward_widepe(params, pts, dirs, net,
                                           compute_dtype=jnp.float32,
                                           tile=64, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_widepe_backward_matches_jnp(rng):
    """custom_vjp backward of the widepe kernel equals autodiff of the jnp
    reference (recompute path)."""
    from neuralsim_tpu.kernels.raymarch import fused_nerf_mlp_widepe

    net = NeRFNetConfig(netdepth=2, netwidth=16, skips=(0,), multires=2,
                        multires_views=1)
    params = init_nerf_params(jax.random.PRNGKey(2), net)
    pts = jnp.array(rng.randn(32, 3).astype(np.float32))
    dirs = jnp.array(rng.randn(32, 3).astype(np.float32))

    def loss_ref(p, x, d):
        raw = nerf_apply(p, positional_encoding(x, net.multires),
                         positional_encoding(d, net.multires_views), net,
                         compute_dtype=jnp.float32)
        return jnp.sum(raw ** 2)

    # interpret-mode forward so this runs on CPU; backward is jnp either way
    import neuralsim_tpu.kernels.raymarch as rm
    import functools as ft
    orig = rm._fused_forward_widepe
    rm._fused_forward_widepe = ft.partial(orig, interpret=True)
    try:
        def loss_fused(p, x, d):
            return jnp.sum(fused_nerf_mlp_widepe(p, x, d, net,
                                                 jnp.float32, 32) ** 2)

        g_ref = jax.grad(loss_ref, argnums=(1, 2))(params, pts, dirs)
        g_fused = jax.grad(loss_fused, argnums=(1, 2))(params, pts, dirs)
    finally:
        rm._fused_forward_widepe = orig
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


@pytest.mark.parametrize("s", [16, 48, 144])
def test_march_channels_matches_reference(rng, s):
    """Ray-major march kernel (in-kernel point-gen + PE + MLP, channel
    outputs) equals the jnp reference at every sample count the renderer
    uses (culled coarse 16, fine 144) — including ray padding."""
    from neuralsim_tpu.kernels.raymarch import (
        _fused_march_channels,
        _march_channels_ref,
    )

    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    n = 20  # not a multiple of 8 -> exercises ray padding
    rays_o = jnp.asarray(rng.randn(n, 3).astype(np.float32)) * 0.1
    rays_d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    from neuralsim_tpu.ops.volume import stratified_z_vals

    z = stratified_z_vals(None, n, s, 0.5, 2.0, perturb=False)
    want_sigma, want_rgb = _march_channels_ref(params, rays_o, rays_d, vd,
                                               z, NET)
    got_sigma, got_rgb = _fused_march_channels(
        params, rays_o, rays_d, vd, z, NET, compute_dtype=jnp.float32,
        target_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_sigma), np.asarray(want_sigma),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_rgb), np.asarray(want_rgb),
                               rtol=2e-4, atol=2e-4)


def test_raw2outputs_channels_matches_raw2outputs(rng):
    """Channel-separated compositing equals raw2outputs on the same raw
    values (incl. noise and white background)."""
    from neuralsim_tpu.ops.volume import raw2outputs, raw2outputs_channels

    n, s = 24, 32
    raw = jnp.asarray(rng.randn(n, s, 4).astype(np.float32))
    z = jnp.sort(jnp.asarray(rng.rand(n, s).astype(np.float32)), axis=-1)
    rays_d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    sigma = raw[..., 3]
    rgb3 = jnp.moveaxis(raw[..., :3], -1, 0)

    for kwargs in ({}, {"white_bkgd": True},
                   {"raw_noise_std": 0.7, "key": jax.random.PRNGKey(3)}):
        want = raw2outputs(raw, z, rays_d, **kwargs)
        got = raw2outputs_channels(sigma, rgb3, z, rays_d, **kwargs)
        for a, b in zip(got, want):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-6, atol=1e-6)


def test_march_vjp_matches_reference(rng):
    """custom_vjp backward of the march kernel equals autodiff of the jnp
    reference, incl. ray-origin/direction/z grads (the pose-gradient path)."""
    from neuralsim_tpu.kernels import raymarch as rm

    net = NeRFNetConfig(netdepth=2, netwidth=16, skips=(0,), multires=2,
                        multires_views=1)
    params = init_nerf_params(jax.random.PRNGKey(2), net)
    n, s = 8, 12
    rays_o = jnp.asarray(rng.randn(n, 3).astype(np.float32)) * 0.1
    rays_d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = jnp.sort(jnp.asarray(rng.rand(n, s).astype(np.float32)), axis=-1)

    def loss_ref(p, o, d, v, zz):
        sg, rgb = rm._march_channels_ref(p, o, d, v, zz, net)
        return jnp.sum(sg ** 2) + jnp.sum(rgb ** 2)

    import functools as ft
    orig = rm._fused_march_channels
    rm._fused_march_channels = ft.partial(orig, interpret=True)
    try:
        def loss_fused(p, o, d, v, zz):
            sg, rgb = rm.fused_nerf_march(p, o, d, v, zz, net, jnp.float32,
                                          64)
            return jnp.sum(sg ** 2) + jnp.sum(rgb ** 2)

        g_ref = jax.grad(loss_ref, argnums=(1, 2, 3, 4))(
            params, rays_o, rays_d, vd, z)
        g_fused = jax.grad(loss_fused, argnums=(1, 2, 3, 4))(
            params, rays_o, rays_d, vd, z)
    finally:
        rm._fused_march_channels = orig
    for a, b in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_fused_render_tile_matches_reference(rng):
    """Whole-ray fused kernel (PE + MLP + compositing in-kernel) equals
    query_points + raw2outputs exactly in f32 — including the triangular-
    matmul transmittance (Mosaic has no cumprod) and the padding path."""
    from neuralsim_tpu.kernels.raymarch import fused_render_tile
    from neuralsim_tpu.models.nerf import query_points
    from neuralsim_tpu.ops.volume import raw2outputs, stratified_z_vals

    params = init_nerf_params(jax.random.PRNGKey(0), NET)
    n, s = 20, 16  # n not a multiple of 8 -> exercises ray padding
    rays_o = jnp.asarray(rng.randn(n, 3).astype(np.float32)) * 0.1
    rays_d = jnp.asarray(rng.randn(n, 3).astype(np.float32))
    vd = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    z = stratified_z_vals(None, n, s, 0.5, 2.0, perturb=False)

    pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
    raw = query_points(params, pts, vd, NET, jnp.float32)
    want = raw2outputs(raw, z, rays_d)
    got = fused_render_tile(params, rays_o, rays_d, vd, z, NET,
                            compute_dtype=jnp.float32, target_tile=128,
                            interpret=True)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)

    # white_bkgd branch
    want_w = raw2outputs(raw, z, rays_d, white_bkgd=True)
    got_w = fused_render_tile(params, rays_o, rays_d, vd, z, NET,
                              white_bkgd=True, compute_dtype=jnp.float32,
                              target_tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got_w[0]), np.asarray(want_w[0]),
                               rtol=1e-5, atol=1e-6)
