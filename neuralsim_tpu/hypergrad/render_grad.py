"""dL_val/dpsi through pose sampling + rendering.

The reference computes this with a render-twice replay protocol and a
per-chunk double-VJP loop on the host (``render_path_grad``,
``optimization/utils/run_nerf_noscale.py:126-210``): for each pixel strip it
renders with the graph alive, then chains two ``torch.autograd.grad`` calls
(rgb->rays, rays->psi). Here the whole map psi -> poses -> rays -> rgb ->
<rgb, grad_E> is ONE differentiable jitted program, with two modes:

  - ``render_grad_psi_fwd``: forward-mode. psi has 8 dims, so the full
    Jacobian costs 8 JVP passes and stores NO residuals — this is the
    TPU-native default (reverse-mode through 50 images x 256 samples of MLP
    activations needs ~GBs of remat machinery; forward-mode needs none).
  - ``render_grad_psi_rev``: reverse-mode with per-tile rematerialization
    (rc.remat), kept for parity testing and for high-dimensional psi
    variants (e.g. Gaussian psi fields) where reverse-mode wins.

grad_E is the detector-side weight d(dL_train/dtheta)/dI . inverse_hvp from
neuralsim_tpu.hypergrad.influence — identical contract to the reference's
``grad_E`` (``neural_sim_main.py:855-911``).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from neuralsim_tpu.config import NeRFNetConfig, RenderConfig, SamplerConfig
from neuralsim_tpu.ops.render import render_poses
from neuralsim_tpu.sampler.poses import PoseNoise, poses_from_noise, psi_to_probs


def psi_outer_loss(models, psi, noise: PoseNoise, grad_E,
                   H: int, W: int, K, net: NeRFNetConfig, rc: RenderConfig,
                   sc: SamplerConfig):
    """L(psi) = mean_i <render(pose_i(psi)), grad_E_i>.

    grad_E plays the role of the cotangent on rendered rgb; grad_E:
    [P, H, W, 3], P <= K poses (the reference caps the pose loop at
    len(grad_E), run_nerf_noscale.py:142) — pass noise sliced to the same P.

    Two DELIBERATE deviations from the reference's dL/dpsi
    (``neural_sim_main.py:142-143, 191``), see PARITY.md:
      1. the gradient flows through softmax(psi/0.25) all the way to psi,
         whereas the reference makes the post-softmax probs the autograd
         leaf and applies dL/dprobs as if it were dL/dpsi (leaf trick —
         arguably a bug; chain-ruling through the softmax is the correct
         total derivative);
      2. normalization is mean-over-images, whereas the reference averages
         over per-chunk gradients (an extra factor of ceil(H*W/chunk)).
    Users porting reference ``opt_lr`` values should expect a different
    (better-conditioned) gradient scale.
    """
    probs = psi_to_probs(psi, sc)
    poses = poses_from_noise(probs, noise, sc)
    out = render_poses(models, poses, H, W, K, None, net, rc)
    # sum over pixels of each image's <rgb, grad_E>, then mean over images
    return jnp.mean(jnp.sum(out["rgb_map"] * grad_E, axis=(1, 2, 3)))


def render_grad_psi_fwd(models, psi, noise: PoseNoise, grad_E,
                        H: int, W: int, K, net: NeRFNetConfig,
                        rc: RenderConfig, sc: SamplerConfig):
    """Forward-mode dL/dpsi: one JVP per psi component, no stored residuals."""
    # f32 + explicit sin/cos under differentiation: gradient fidelity, and
    # the JVP/VJP of the bf16-cast + PE-projection forward graph trips an
    # XLA v5e backend RET_CHECK (lsrav2/live_range_finder.cc:29)
    rc = dataclasses.replace(rc, remat=False, pe_projection=False,
                             compute_dtype="float32")

    def loss(p):
        return psi_outer_loss(models, p, noise, grad_E, H, W, K, net, rc, sc)

    basis = jnp.eye(psi.shape[0], dtype=psi.dtype)
    # serial over the 8 tangent directions: 1x forward memory, 8x time —
    # vmap would batch all 8 renders and multiply peak memory instead
    tangents = jax.lax.map(lambda v: jax.jvp(loss, (psi,), (v,))[1], basis)
    return tangents


def render_grad_psi_rev(models, psi, noise: PoseNoise, grad_E,
                        H: int, W: int, K, net: NeRFNetConfig,
                        rc: RenderConfig, sc: SamplerConfig):
    """Reverse-mode dL/dpsi with per-tile remat (memory-bounded backward)."""
    rc = dataclasses.replace(rc, remat=True, pe_projection=False,
                             compute_dtype="float32")

    def loss(p):
        return psi_outer_loss(models, p, noise, grad_E, H, W, K, net, rc, sc)

    return jax.grad(loss)(psi)
