"""Sharding/mesh tests on the virtual 8-device CPU mesh: results must be
invariant to sharding, and the sharded train step must actually partition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig, TrainConfig
from neuralsim_tpu.models.nerf import init_nerf_pipeline_params
from neuralsim_tpu.ops.render import render_ray_batch
from neuralsim_tpu.parallel.mesh import make_mesh, replicate, shard_rays
from neuralsim_tpu.train_nerf import init_train_state, train_step

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate

NET = NeRFNetConfig(netdepth=2, netwidth=32, netdepth_fine=2, netwidth_fine=32,
                    skips=(0,), multires=4, multires_views=2)
RC = RenderConfig(n_samples=8, n_importance=8, ray_chunk=128, near=0.5,
                  far=2.0, perturb=False)
TC = TrainConfig(n_rand=256)


def test_mesh_shapes():
    mesh = make_mesh()
    assert mesh.devices.shape == (8, 1)
    mesh = make_mesh(data=4, model=2)
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_sharded_render_matches_unsharded():
    mesh = make_mesh()
    models = init_nerf_pipeline_params(jax.random.PRNGKey(0), NET, RC.n_importance)
    n = 1024
    rd = jax.random.normal(jax.random.PRNGKey(1), (n, 3)) * 0.1 + jnp.array(
        [0.0, 0.0, -1.0]
    )
    ro = jnp.zeros((n, 3))

    base = render_ray_batch(models, ro, rd, None, NET, RC)["rgb_map"]

    models_r = replicate(models, mesh)
    ro_s, rd_s = shard_rays(ro, mesh), shard_rays(rd, mesh)
    fn = jax.jit(lambda m, o, d: render_ray_batch(m, o, d, None, NET, RC)["rgb_map"])
    sharded = fn(models_r, ro_s, rd_s)

    np.testing.assert_allclose(np.asarray(base), np.asarray(sharded),
                               rtol=1e-4, atol=1e-5)


def test_sharded_train_step_partitions_and_matches():
    mesh = make_mesh()
    state = init_train_state(jax.random.PRNGKey(0), NET, RC, TC)
    n = 256
    key = jax.random.PRNGKey(2)
    rd = jax.random.normal(key, (n, 3)) * 0.1 + jnp.array([0.0, 0.0, -1.0])
    ro = jnp.zeros((n, 3))
    tgt = jnp.full((n, 3), 0.5)

    step = jax.jit(lambda s, o, d, t, k: train_step(s, o, d, t, k, NET, RC, TC))
    s_base, m_base = step(state, ro, rd, tgt, key)

    ray_sh = NamedSharding(mesh, P("data"))
    state_r = replicate(state, mesh)
    args = [jax.device_put(x, ray_sh) for x in (ro, rd, tgt)]
    s_shard, m_shard = step(state_r, *args, key)

    np.testing.assert_allclose(float(m_base["loss"]), float(m_shard["loss"]),
                               rtol=1e-4)
    lb = jax.tree_util.tree_leaves(s_base.params)
    ls = jax.tree_util.tree_leaves(s_shard.params)
    for a, b in zip(lb, ls):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)
    # inputs really were distributed
    assert len(args[0].sharding.device_set) == 8


def test_psi_grad_matches_across_sharding():
    """dL/dpsi must be identical whether rays are sharded or not (psum path)."""
    from neuralsim_tpu.config import SamplerConfig
    from neuralsim_tpu.hypergrad.render_grad import psi_outer_loss
    from neuralsim_tpu.sampler.poses import draw_pose_noise
    from neuralsim_tpu.bilevel.psi_init import psi_init

    mesh = make_mesh()
    sc = SamplerConfig(n_samples_k=2)
    models = init_nerf_pipeline_params(jax.random.PRNGKey(0), NET, RC.n_importance)
    psi = psi_init("uniform")
    noise = draw_pose_noise(jax.random.PRNGKey(3), sc, num_k=2)
    K = np.array([[20.0, 0, 8.0], [0, 20.0, 8.0], [0, 0, 1.0]], np.float32)
    grad_E = jax.random.normal(jax.random.PRNGKey(4), (2, 16, 16, 3)) * 1e-2

    f = lambda m, p: jax.grad(
        lambda pp: psi_outer_loss(m, pp, noise, grad_E, 16, 16, K, NET, RC, sc)
    )(p)
    base = np.asarray(jax.jit(f)(models, psi))
    sharded = np.asarray(jax.jit(f)(replicate(models, mesh),
                                    jax.device_put(psi, NamedSharding(mesh, P()))))
    np.testing.assert_allclose(base, sharded, rtol=1e-3, atol=1e-6)
