"""Numerical parity against the REFERENCE implementation itself.

These tests import the reference's torch code (read-only, CPU, with stubs
for CUDA/cv2) and use it as the oracle for our renderer — the strongest
parity check available in this environment (the published pretrained
checkpoints are not shipped, so golden-render tests use randomly
initialized weights converted through the same path the real .tar files
take).
"""

import sys
from unittest import mock

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # whole-pipeline compiles dominate

REF = "/root/reference/optimization"


@pytest.fixture(scope="module")
def ref():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    for name in ("cv2", "matplotlib", "matplotlib.pyplot", "scipy",
                 "scipy.optimize"):
        sys.modules.setdefault(name, mock.MagicMock())
    import torch

    torch.Tensor.cuda = lambda self, *a, **k: self  # CPU-only
    import utils.run_nerf_helpers as helpers
    import utils.run_nerf_noscale as noscale

    return helpers, noscale


@pytest.fixture(scope="module")
def converted(ref):
    """A reference torch NeRF pair + our converted params."""
    import torch

    helpers, _ = ref
    torch.manual_seed(0)
    coarse = helpers.NeRF(D=8, W=256, input_ch=63, input_ch_views=27,
                          output_ch=5, skips=[4], use_viewdirs=True)
    fine = helpers.NeRF(D=8, W=256, input_ch=63, input_ch_views=27,
                        output_ch=5, skips=[4], use_viewdirs=True)
    from neuralsim_tpu.data.convert_torch import convert_torch_checkpoint

    models = convert_torch_checkpoint({
        "network_fn_state_dict": coarse.state_dict(),
        "network_fine_state_dict": fine.state_dict(),
    })
    import jax.numpy as jnp

    models = {m: {k: jnp.asarray(v) for k, v in p.items()} for m, p in models.items()}
    return coarse, fine, models


def test_positional_encoding_parity(ref, rng):
    import torch

    helpers, _ = ref
    embed_fn, out_dim = helpers.get_embedder(10, 0)
    x = rng.randn(50, 3).astype(np.float32)
    want = embed_fn(torch.tensor(x)).numpy()
    import jax.numpy as jnp

    from neuralsim_tpu.ops.encoding import positional_encoding

    got = np.asarray(positional_encoding(jnp.array(x), 10))
    assert out_dim == got.shape[-1] == 63
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_get_rays_parity(ref):
    import torch

    helpers, _ = ref
    K = np.array([[333.33, 0, 48.86], [0, 333.55, 50.16], [0, 0, 1]], np.float32)
    c2w = np.array(
        [[-0.9, 0.1, -0.42, -0.43], [0.43, 0.33, -0.84, -0.85],
         [0.05, -0.94, -0.34, -0.35], [0, 0, 0, 1]], np.float32,
    )
    ro_t, rd_t = helpers.get_rays(10, 12, torch.tensor(K), torch.tensor(c2w))
    from neuralsim_tpu.ops.rays import get_rays

    ro, rd = get_rays(10, 12, K, c2w)
    np.testing.assert_allclose(np.asarray(ro), ro_t.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rd), rd_t.numpy(), rtol=1e-4, atol=1e-5)


def test_sample_pdf_parity(ref, rng):
    import torch

    helpers, _ = ref
    bins = np.sort(rng.uniform(0.5, 2.0, (16, 63)).astype(np.float32), -1)
    weights = rng.uniform(0, 1, (16, 62)).astype(np.float32)
    want = helpers.sample_pdf(
        torch.tensor(bins), torch.tensor(weights), 128, det=True
    ).numpy()
    import jax
    import jax.numpy as jnp

    from neuralsim_tpu.ops.volume import sample_pdf

    got = np.asarray(sample_pdf(
        jax.random.PRNGKey(0), jnp.array(bins), jnp.array(weights), 128, det=True
    ))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_raw2outputs_parity(ref, rng):
    import torch

    _, noscale = ref
    raw = rng.randn(8, 20, 4).astype(np.float32)
    z = np.sort(rng.uniform(0.5, 2.0, (8, 20)).astype(np.float32), -1)
    rd = rng.randn(8, 3).astype(np.float32)
    w_rgb, w_disp, w_acc, w_w, w_depth = noscale.raw2outputs(
        torch.tensor(raw), torch.tensor(z), torch.tensor(rd)
    )
    import jax.numpy as jnp

    from neuralsim_tpu.ops.volume import raw2outputs

    rgb, disp, acc, w, depth = raw2outputs(jnp.array(raw), jnp.array(z), jnp.array(rd))
    np.testing.assert_allclose(np.asarray(rgb), w_rgb.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), w_acc.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), w_w.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), w_depth.numpy(), rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(disp), w_disp.numpy(), rtol=1e-3, atol=1e-4)


def test_mlp_forward_parity_with_converted_weights(converted, rng):
    import torch

    coarse, _, models = converted
    x = rng.randn(40, 63).astype(np.float32)
    d = rng.randn(40, 27).astype(np.float32)
    with torch.no_grad():
        want = coarse(torch.tensor(np.concatenate([x, d], -1))).numpy()
    import jax.numpy as jnp

    from neuralsim_tpu.config import NeRFNetConfig
    from neuralsim_tpu.models.nerf import nerf_apply

    got = np.asarray(nerf_apply(models["coarse"], jnp.array(x), jnp.array(d),
                                NeRFNetConfig()))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_full_hierarchical_render_parity(ref, converted, rng):
    """End-to-end chunk parity: reference render_rays (coarse+fine, det mode)
    vs our render_rays on identical rays and converted weights — the
    SURVEY M1 anchor, modulo the unavailable published checkpoints."""
    import torch

    helpers, noscale = ref
    coarse, fine, models = converted

    n = 32
    rays_o = rng.uniform(-0.2, 0.2, (n, 3)).astype(np.float32)
    rays_d = (rng.randn(n, 3) * 0.2 + np.array([0, 0, -1.0])).astype(np.float32)
    near = np.full((n, 1), 0.5, np.float32)
    far = np.full((n, 1), 2.0, np.float32)
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)

    ray_batch = torch.tensor(
        np.concatenate([rays_o, rays_d, near, far, viewdirs], -1)
    )
    embed_fn, _ = helpers.get_embedder(10, 0)
    embeddirs_fn, _ = helpers.get_embedder(4, 0)

    def query(inputs, vd, network_fn):
        return noscale.run_network(
            inputs, vd, network_fn, embed_fn=embed_fn,
            embeddirs_fn=embeddirs_fn, netchunk=1 << 16,
        )

    with torch.no_grad():
        want = noscale.render_rays(
            ray_batch, network_fn=coarse, network_query_fn=query,
            N_samples=64, perturb=0.0, N_importance=128, network_fine=fine,
            white_bkgd=False, raw_noise_std=0.0,
        )

    import jax.numpy as jnp

    from neuralsim_tpu.config import NeRFNetConfig, RenderConfig
    from neuralsim_tpu.ops.render import render_rays

    rc = RenderConfig(n_samples=64, n_importance=128, perturb=False,
                      near=0.5, far=2.0)
    got = render_rays(models, jnp.array(rays_o), jnp.array(rays_d),
                      jnp.array(viewdirs), None, NeRFNetConfig(), rc)

    np.testing.assert_allclose(
        np.asarray(got["rgb_map"]), want["rgb_map"].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["rgb0"]), want["rgb0"].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["acc_map"]), want["acc_map"].numpy(), rtol=1e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(got["z_std"]), want["z_std"].numpy(), rtol=1e-3, atol=1e-4
    )


def test_pose_sampler_replay_parity(ref, rng):
    """Reference sample_pose replaying a sample_log vs our poses_from_noise
    on the same noise: c2w matrices must match."""
    import torch

    sys.modules.setdefault("cv2", mock.MagicMock())
    import utils.load_LINEMOD_noscale as ln

    import jax.numpy as jnp

    from neuralsim_tpu.config import SamplerConfig
    from neuralsim_tpu.sampler.poses import PoseNoise, poses_from_noise

    k = 5
    probs = np.array([0.05, 0.1, 0.2, 0.05, 0.3, 0.1, 0.15, 0.05], np.float32)
    gumbel = rng.gumbel(size=(k, 8)).astype(np.float32)
    uniform = rng.uniform(0, 1, k).astype(np.float32)
    thetas = rng.uniform(85, 95, k).astype(np.float32)

    sample_log = {
        "gumbel_noises": [g.tolist() for g in gumbel],
        "uniform_noises": [float(u) for u in uniform],
        "thetas": [float(t) for t in thetas],
    }
    want = ln.sample_pose(
        torch.tensor(probs), k, 0.1, sample_log
    ).detach().numpy()

    sc = SamplerConfig(gumbel_temperature=0.1)
    noise = PoseNoise(jnp.array(gumbel), jnp.array(uniform), jnp.array(thetas))
    got = np.asarray(poses_from_noise(jnp.array(probs), noise, sc))

    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
