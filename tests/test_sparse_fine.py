"""Sparse fine pass: selected rays match the exact render; background rays
fall back to coarse outputs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
from neuralsim_tpu.ops.render import render_rays

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate

NET = NeRFNetConfig(netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                    skips=(0,), multires=4, multires_views=2)
RC = RenderConfig(n_samples=16, n_importance=16, perturb=False,
                  near=0.5, far=2.0)


def _rays(n=64):
    key = jax.random.PRNGKey(0)
    rd = jax.random.normal(key, (n, 3)) * 0.15 + jnp.array([0.0, 0.0, -1.0])
    ro = jnp.zeros((n, 3))
    vd = rd / jnp.linalg.norm(rd, axis=-1, keepdims=True)
    return ro, rd, vd


def test_fraction_one_unchanged():
    models = init_nerf_pipeline_params(jax.random.PRNGKey(1), NET, 16)
    ro, rd, vd = _rays()
    full = render_rays(models, ro, rd, vd, None, NET, RC)
    frac1 = render_rays(models, ro, rd, vd, None, NET,
                        dataclasses.replace(RC, fine_fraction=1.0))
    np.testing.assert_allclose(np.asarray(full["rgb_map"]),
                               np.asarray(frac1["rgb_map"]), rtol=1e-6)


def test_selected_rays_exact_others_coarse():
    models = init_nerf_pipeline_params(jax.random.PRNGKey(1), NET, 16)
    ro, rd, vd = _rays(64)
    full = render_rays(models, ro, rd, vd, None, NET, RC)
    sparse = render_rays(models, ro, rd, vd, None, NET,
                         dataclasses.replace(RC, fine_fraction=0.25))

    # every ray must match either the exact fine output (if routed) or the
    # coarse output (if not) — selection ties make the exact index set
    # implementation-defined, so don't assume which rays were picked
    sp = np.asarray(sparse["rgb_map"])
    fine = np.asarray(full["rgb_map"])
    coarse = np.asarray(full["rgb0"])
    d_fine = np.abs(sp - fine).max(-1)
    d_coarse = np.abs(sp - coarse).max(-1)
    matches_fine = d_fine < 1e-4
    matches_coarse = d_coarse < 1e-4
    assert (matches_fine | matches_coarse).all()
    # exactly k = 64 * 0.25 rays got the fine network (where fine != coarse)
    distinct = np.abs(fine - coarse).max(-1) > 1e-4
    assert (matches_fine & distinct).sum() <= 16
    assert matches_fine.sum() >= 16 - (~distinct).sum()


def test_sparse_still_differentiable():
    models = init_nerf_pipeline_params(jax.random.PRNGKey(1), NET, 16)
    ro, rd, vd = _rays(32)
    rc = dataclasses.replace(RC, fine_fraction=0.5)

    def loss(o):
        out = render_rays(models, o, rd, vd, None, NET, rc)
        return jnp.sum(out["rgb_map"] ** 2)

    g = jax.grad(loss)(ro)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0
