"""Differentiable camera-pose sampling from the psi categorical distribution.

Capabilities mirrored from the reference
(``optimization/utils/load_LINEMOD_noscale.py:202-328``):

  - 8 azimuth bins with centers [0,45,...,315] + 22.5 degrees
  - phi = gumbel-softmax soft bin center, then uniform-within-bin
    reparameterization ``phi = s - width/2 + width * U(0,1)``
  - theta ~ U(85, 95) degrees, radius fixed at 1.01
  - spherical c2w: flip @ rot_theta @ rot_phi @ trans_r
  - a Gaussian-psi variant (sample_poses_gaussian)

TPU-native design: poses are built by plain ``jnp.array`` construction, which
is differentiable for free — the reference needs masked in-place writes on a
requires_grad template (``rot_phi_diff``, load_LINEMOD_noscale.py:25-59) to
trick torch autograd. The no-grad/replay split collapses into
``draw_pose_noise`` (an explicit PRNG draw) + ``poses_from_noise`` (a pure
differentiable function of (probs, noise)); calling the latter twice with the
same noise IS the reference's sample_log replay protocol, and under one
``jax.grad`` no second call is needed.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from neuralsim_tpu.config import SamplerConfig
from neuralsim_tpu.sampler.gumbel import gumbel_noise, gumbel_softmax_expectation


class PoseNoise(NamedTuple):
    """The reference's ``sample_log`` as a typed, device-resident pytree."""

    gumbel: jnp.ndarray   # [K, n_bins]
    uniform: jnp.ndarray  # [K]
    theta: jnp.ndarray    # [K] degrees


def _rot_phi(phi):
    """Rotation about x by phi (radians) as a 4x4, batched-friendly."""
    c, s = jnp.cos(phi), jnp.sin(phi)
    z, o = jnp.zeros_like(phi), jnp.ones_like(phi)
    return jnp.stack(
        [
            jnp.stack([o, z, z, z], -1),
            jnp.stack([z, c, -s, z], -1),
            jnp.stack([z, s, c, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


def _rot_theta(th):
    """Rotation about y by theta (radians); sign convention of the reference."""
    c, s = jnp.cos(th), jnp.sin(th)
    z, o = jnp.zeros_like(th), jnp.ones_like(th)
    return jnp.stack(
        [
            jnp.stack([c, z, -s, z], -1),
            jnp.stack([z, o, z, z], -1),
            jnp.stack([s, z, c, z], -1),
            jnp.stack([z, z, z, o], -1),
        ],
        -2,
    )


_FLIP = jnp.array(
    [[-1.0, 0, 0, 0], [0, 0, 1.0, 0], [0, 1.0, 0, 0], [0, 0, 0, 1.0]]
)


def pose_spherical(theta_deg, phi_deg, radius):
    """Spherical camera-to-world c2w = flip @ R_theta @ R_phi @ T_r.

    Scalars or batched [K] inputs; returns [..., 4, 4]. Differentiable in all
    three arguments.
    """
    theta = jnp.asarray(theta_deg) * (jnp.pi / 180.0)
    phi = jnp.asarray(phi_deg) * (jnp.pi / 180.0)
    radius = jnp.broadcast_to(jnp.asarray(radius, jnp.float32), theta.shape)

    trans = jnp.zeros(theta.shape + (4, 4)).at[..., 0, 0].set(1.0)
    trans = trans.at[..., 1, 1].set(1.0).at[..., 2, 2].set(1.0)
    trans = trans.at[..., 3, 3].set(1.0).at[..., 2, 3].set(radius)

    # HIGHEST precision: 4x4 pose products feed dpose/dpsi; bf16-accumulated
    # TPU default matmuls would inject ~1e-3 noise into the hypergradient.
    hi = jax.lax.Precision.HIGHEST
    c2w = jnp.matmul(_rot_phi(phi), trans, precision=hi)
    c2w = jnp.matmul(_rot_theta(theta), c2w, precision=hi)
    return jnp.matmul(_FLIP, c2w, precision=hi)


def psi_to_probs(psi, sc: SamplerConfig):
    """psi logits -> categorical probs at the fixed softmax temperature
    (reference neural_sim_main.py:85-86, temperature 0.25 — distinct from the
    gumbel temperature). The reference's float16 cast of probs (:88) is a
    precision bug, not a capability; we keep float32."""
    return jax.nn.softmax(psi / sc.softmax_temperature)


def explore_mix_psi(psi, sc: SamplerConfig, eps: float):
    """Exploration floor: logits whose softmax IS the eps-mixed sampling
    distribution (1-eps)*softmax(psi/T) + eps/n_bins.

    Passing the returned logits anywhere raw psi is consumed makes every
    sampling/render/gradient path draw from the mixed distribution with
    NO change to that machinery (softmax(T*log(p)/T) == p for normalized
    p); chain back to raw psi with an 8-dim vjp of this function. The
    floor removes the wrong-bin collapse trap observed in the round-5
    convergence runs: once softmax(psi) concentrates off-target, the
    soft weights of target-bin poses vanish (grad_l2 ~ 1e-3) and the
    outer loop can never recover — with the floor every bin keeps
    >= eps/n_bins sampling mass, so recovery signal survives. eps also
    lower-bounds probs, so the log-clamp guard below never engages.
    No reference analog (the reference samples softmax(psi) directly);
    default off (BilevelConfig.explore_eps = 0)."""
    p = psi_to_probs(psi, sc)
    p_mix = (1.0 - eps) * p + eps / p.shape[-1]
    return sc.softmax_temperature * jnp.log(p_mix)


def bin_centers(sc: SamplerConfig):
    return jnp.arange(sc.n_bins) * sc.bin_width_deg + sc.bin_offset_deg


def draw_pose_noise(key, sc: SamplerConfig, num_k: int | None = None) -> PoseNoise:
    """Draw all stochastic inputs for K pose samples."""
    k = num_k if num_k is not None else sc.n_samples_k
    kg, ku, kt = jax.random.split(key, 3)
    return PoseNoise(
        gumbel=gumbel_noise(kg, (k, sc.n_bins)),
        uniform=jax.random.uniform(ku, (k,)),
        theta=jax.random.uniform(
            kt, (k,), minval=sc.theta_low_deg, maxval=sc.theta_high_deg
        ),
    )


def poses_from_noise(probs, noise: PoseNoise, sc: SamplerConfig):
    """Pure differentiable map (probs, noise) -> c2w poses [K, 4, 4].

    phi soft-sample = gumbel-softmax expectation of bin centers, then
    uniform-within-bin reparameterization; azimuth passed to pose_spherical
    shifted by -180 (reference convention, load_LINEMOD_noscale.py:244).
    """
    # clamp before the log: a saturated psi underflows losing bins to
    # probs == 0 in f32, and log(0) = -inf makes the WHOLE psi gradient NaN
    # through the gumbel softmax (caught by the round-3 hardware drive:
    # one aggressive update saturated psi and every later epoch's grad was
    # NaN). The clamp is value-identical for probs >= 1e-30 and gives the
    # underflowed bins a finite logit (-69) whose soft-sample weight is
    # still exactly 0 in f32.
    logits = jnp.log(jnp.maximum(probs, 1e-30))
    centers = bin_centers(sc)
    phi_soft = gumbel_softmax_expectation(
        logits[None, :], centers, noise.gumbel, sc.gumbel_temperature
    )  # [K]
    phi = phi_soft - sc.bin_width_deg / 2.0 + sc.bin_width_deg * noise.uniform
    return pose_spherical(noise.theta, phi - 180.0, sc.radius)


def sample_poses(key, probs, sc: SamplerConfig, num_k: int | None = None):
    """Draw noise and build poses in one call.

    Returns (poses [K,4,4], noise) — the noise pytree doubles as the
    reference's ``sample_log`` for replay-parity tests.
    """
    noise = draw_pose_noise(key, sc, num_k)
    return poses_from_noise(probs, noise, sc), noise


class GaussianPoseNoise(NamedTuple):
    """Stochastic inputs for the Gaussian-psi variant: standard-normal
    azimuth draws (reparameterization noise) + uniform theta."""

    eps: jnp.ndarray      # [K] ~ N(0, 1)
    theta: jnp.ndarray    # [K] degrees


def draw_pose_noise_gaussian(key, sc: SamplerConfig,
                             num_k: int | None = None) -> GaussianPoseNoise:
    k = num_k if num_k is not None else sc.n_samples_k
    ke, kt = jax.random.split(key)
    return GaussianPoseNoise(
        eps=jax.random.normal(ke, (k,)),
        theta=jax.random.uniform(
            kt, (k,), minval=sc.theta_low_deg, maxval=sc.theta_high_deg
        ),
    )


def poses_from_noise_gaussian(psi, noise: GaussianPoseNoise,
                              sc: SamplerConfig):
    """Differentiable map (psi=(mean, std), noise) -> c2w poses [K, 4, 4].

    The Gaussian twin of poses_from_noise: phi = mean + |std|*eps is the
    reparameterization of the reference's np.random.normal draw
    (sample_pose_nograd_gaussian, load_LINEMOD_noscale.py:304-328), wrapped
    to [0, 360) like the reference's mod-360 branches; |std| keeps the
    scale positive under gradient updates. Gradients flow to BOTH mean and
    std (the reference never optimizes its gaussian psi — its mode is
    sample-only; this completes it)."""
    phi = psi[0] + jnp.abs(psi[1]) * noise.eps
    phi = jnp.mod(phi, 360.0)
    return pose_spherical(noise.theta, phi - 180.0, sc.radius)


def sample_poses_gaussian(key, phi_mean, phi_std, sc: SamplerConfig,
                          num_k: int | None = None):
    """Gaussian-psi variant (reference sample_pose_nograd_gaussian,
    load_LINEMOD_noscale.py:304-328): phi ~ N(mean, std), wrapped to [0,360)."""
    k = num_k if num_k is not None else sc.n_samples_k
    kp, kt = jax.random.split(key)
    phis = phi_mean + phi_std * jax.random.normal(kp, (k,))
    phis = jnp.mod(phis, 360.0)
    thetas = jax.random.uniform(
        kt, (k,), minval=sc.theta_low_deg, maxval=sc.theta_high_deg
    )
    return pose_spherical(thetas, phis - 180.0, sc.radius), phis
