"""Pose-distribution sampler tests: statistics, replay parity, gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.config import SamplerConfig
from neuralsim_tpu.sampler.gumbel import gumbel_noise, gumbel_softmax_expectation
from neuralsim_tpu.sampler.poses import (
    PoseNoise,
    bin_centers,
    draw_pose_noise,
    pose_spherical,
    poses_from_noise,
    psi_to_probs,
    sample_poses,
    sample_poses_gaussian,
)

SC = SamplerConfig()


def test_gumbel_noise_distribution():
    g = np.asarray(gumbel_noise(jax.random.PRNGKey(0), (20000,)))
    # Gumbel(0,1): mean = Euler-Mascheroni, var = pi^2/6
    assert abs(g.mean() - 0.5772) < 0.03
    assert abs(g.var() - np.pi**2 / 6) < 0.08


def test_gumbel_softmax_low_temp_picks_argmax():
    logits = jnp.log(jnp.array([0.05, 0.05, 0.8, 0.1]))
    values = jnp.array([10.0, 20.0, 30.0, 40.0])
    # zero noise, tiny temperature -> hard argmax value
    out = gumbel_softmax_expectation(logits, values, jnp.zeros(4), 1e-3)
    np.testing.assert_allclose(float(out), 30.0, rtol=1e-5)


def test_gumbel_softmax_sampling_statistics():
    """Empirical bin frequencies track the categorical probs (reference
    gumble.py __main__ demo behavior)."""
    probs = jnp.array([0.0, 0.3, 0.0, 0.0, 0.0, 0.0, 0.7, 0.0]) + 1e-6
    logits = jnp.log(probs)
    centers = bin_centers(SC)
    noise = gumbel_noise(jax.random.PRNGKey(1), (4000, 8))
    samples = jax.vmap(
        lambda n: gumbel_softmax_expectation(logits, centers, n, 0.1)
    )(noise)
    bins = np.floor_divide(np.asarray(samples) - 0.01, 45.0).astype(int) % 8
    freq = np.bincount(bins, minlength=8) / len(bins)
    # soft samples at T=0.1 leak some mass to in-between bins; the two true
    # modes must still dominate in the right ratio
    assert abs(freq[1] - 0.3) < 0.1
    assert abs(freq[6] - 0.7) < 0.1
    assert freq[1] + freq[6] > 0.85
    assert freq[6] > 1.7 * freq[1]


def test_pose_spherical_geometry():
    c2w = np.asarray(pose_spherical(jnp.array(0.0), jnp.array(0.0), 1.01))
    # camera at radius along a unit direction
    np.testing.assert_allclose(np.linalg.norm(c2w[:3, 3]), 1.01, rtol=1e-5)
    # rotation block orthonormal with |det| = 1
    R = c2w[:3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(abs(np.linalg.det(R)), 1.0, rtol=1e-5)
    # theta sweep keeps radius; batched input works
    c2ws = np.asarray(pose_spherical(jnp.linspace(0, 360, 12), jnp.full(12, -30.0), 1.01))
    assert c2ws.shape == (12, 4, 4)
    np.testing.assert_allclose(np.linalg.norm(c2ws[:, :3, 3], axis=-1), 1.01, rtol=1e-5)


def test_pose_spherical_camera_looks_at_origin():
    """The -z camera axis must point back at the world origin (look-at)."""
    for th, ph in [(0.0, 0.0), (90.0, -30.0), (200.0, 45.0)]:
        c2w = np.asarray(pose_spherical(jnp.array(th), jnp.array(ph), 1.01))
        fwd = -c2w[:3, 2]  # camera forward in world frame
        to_origin = -c2w[:3, 3] / np.linalg.norm(c2w[:3, 3])
        np.testing.assert_allclose(fwd / np.linalg.norm(fwd), to_origin, atol=1e-5)


def test_replay_parity():
    """poses_from_noise is deterministic given noise — the reference's
    sample_log replay protocol (load_LINEMOD_noscale.py:222-244) as a no-op."""
    probs = psi_to_probs(jnp.array([0.02] * 7 + [0.86]), SC)
    poses, noise = sample_poses(jax.random.PRNGKey(3), probs, SC, num_k=5)
    replayed = poses_from_noise(probs, noise, SC)
    np.testing.assert_array_equal(np.asarray(poses), np.asarray(replayed))


def test_sampled_poses_valid():
    probs = jnp.full((8,), 0.125)
    poses, noise = sample_poses(jax.random.PRNGKey(4), probs, SC, num_k=64)
    assert poses.shape == (64, 4, 4)
    r = np.linalg.norm(np.asarray(poses)[:, :3, 3], axis=-1)
    np.testing.assert_allclose(r, 1.01, rtol=1e-4)
    th = np.asarray(noise.theta)
    assert (th >= 85.0).all() and (th <= 95.0).all()


def test_grad_dpose_dpsi_finite_difference():
    """d(poses)/d(psi) via jax.grad matches central differences."""
    sc = SC
    psi = jnp.array([0.1, -0.2, 0.3, 0.0, 0.05, -0.1, 0.2, 0.0])
    noise = draw_pose_noise(jax.random.PRNGKey(5), sc, num_k=8)

    w = jnp.array([1.0, -0.5, 2.0])

    def f(p):
        poses = poses_from_noise(psi_to_probs(p, sc), noise, sc)
        # camera centers move on the sphere as phi(psi) changes
        return jnp.sum(poses[:, :3, 3] * w)

    g = np.asarray(jax.grad(f)(psi))
    assert np.abs(g).max() > 1e-4  # gradient actually flows
    eps = 1e-2
    for idx in [0, 3, 7]:
        e = np.zeros(8, np.float32)
        e[idx] = eps
        fd = (f(psi + e) - f(psi - e)) / (2 * eps)
        np.testing.assert_allclose(g[idx], float(fd), rtol=5e-2, atol=5e-4)


def test_gaussian_variant():
    poses, phis = sample_poses_gaussian(jax.random.PRNGKey(6), 180.0, 30.0, SC, num_k=32)
    assert poses.shape == (32, 4, 4)
    p = np.asarray(phis)
    assert (p >= 0).all() and (p < 360).all()


def test_psi_to_probs_presets():
    """Bilevel init presets produce valid distributions."""
    from neuralsim_tpu.bilevel.psi_init import psi_init

    for mode in ["uniform", "two_13", "two_27", "three_123", "three_147", "5", "1"]:
        psi = psi_init(mode)
        assert psi.shape == (8,)
        probs = psi_to_probs(psi, SC)
        np.testing.assert_allclose(float(jnp.sum(probs)), 1.0, rtol=1e-5)


def test_gaussian_psi_reparam_gradients():
    """poses_from_noise_gaussian: reference-semantics wrap (phi in [0,360)),
    structure identical to pose_spherical, and reparameterized gradients to
    BOTH mean and std match finite differences."""
    from neuralsim_tpu.sampler.poses import (
        draw_pose_noise_gaussian,
        pose_spherical,
        poses_from_noise_gaussian,
    )

    noise = draw_pose_noise_gaussian(jax.random.PRNGKey(7), SC, num_k=16)
    psi = jnp.array([157.5, 30.0], jnp.float32)
    poses = poses_from_noise_gaussian(psi, noise, SC)
    assert poses.shape == (16, 4, 4)

    phis = np.mod(157.5 + 30.0 * np.asarray(noise.eps), 360.0)
    expected = pose_spherical(noise.theta, jnp.asarray(phis) - 180.0, SC.radius)
    np.testing.assert_allclose(np.asarray(poses), np.asarray(expected),
                               rtol=1e-5, atol=1e-5)

    w = jax.random.normal(jax.random.PRNGKey(8), (16, 3))

    def f(p):
        ps = poses_from_noise_gaussian(p, noise, SC)
        return jnp.sum(ps[:, :3, 3] * w)

    g = np.asarray(jax.grad(f)(psi))
    assert np.isfinite(g).all() and np.abs(g).max() > 1e-4
    eps = 1e-2
    for idx in (0, 1):
        e = np.zeros(2, np.float32)
        e[idx] = eps
        fd = (f(psi + e) - f(psi - e)) / (2 * eps)
        np.testing.assert_allclose(g[idx], float(fd), rtol=5e-2, atol=5e-4)


def test_saturated_psi_keeps_finite_gradient():
    """Regression (round-3 hardware drive): a saturated psi underflows
    some probs to exactly 0 in f32; log(0) = -inf used to poison the whole
    dL/dpsi with NaN through the gumbel softmax. The clamped logits keep
    the gradient finite (and zero for the dead bins)."""
    import jax

    from neuralsim_tpu.config import SamplerConfig
    from neuralsim_tpu.sampler.poses import (
        draw_pose_noise,
        poses_from_noise,
        psi_to_probs,
    )

    sc = SamplerConfig()
    psi = jnp.zeros(8).at[4].set(26.0).at[7].set(-26.0)
    assert float(psi_to_probs(psi, sc).min()) == 0.0  # genuinely saturated
    noise = draw_pose_noise(jax.random.PRNGKey(0), sc, num_k=3)

    def loss(p):
        poses = poses_from_noise(psi_to_probs(p, sc), noise, sc)
        return jnp.sum(poses[:, :3, 3] ** 2)

    g = np.asarray(jax.grad(loss)(psi))
    assert np.isfinite(g).all(), g


def test_explore_mix_psi_is_the_mixed_distribution():
    """softmax(explore_mix_psi(psi)/T) == (1-eps)*softmax(psi/T) + eps/8,
    and the chained gradient through the mix map matches directly
    differentiating the mixed objective (the driver's psi_eff + vjp
    pattern, bilevel/driver.py run_epoch)."""
    import jax

    from neuralsim_tpu.config import SamplerConfig
    from neuralsim_tpu.sampler.poses import (
        draw_pose_noise,
        explore_mix_psi,
        poses_from_noise,
        psi_to_probs,
    )

    sc = SamplerConfig()
    eps = 0.125
    psi = jnp.array([1.2, -0.4, 0.3, 0.0, 2.0, -1.0, 0.6, -0.2], jnp.float32)
    p_mix_direct = (1 - eps) * psi_to_probs(psi, sc) + eps / 8.0
    p_mix_via_logits = psi_to_probs(explore_mix_psi(psi, sc, eps), sc)
    np.testing.assert_allclose(np.asarray(p_mix_via_logits),
                               np.asarray(p_mix_direct), rtol=1e-6)

    noise = draw_pose_noise(jax.random.PRNGKey(3), sc, num_k=4)

    def loss_of_logits(q):
        poses = poses_from_noise(psi_to_probs(q, sc), noise, sc)
        return jnp.sum(poses[:, :3, 3] ** 2)

    # driver pattern: grad at psi_eff, chained back by the mix vjp
    g_eff = jax.grad(loss_of_logits)(explore_mix_psi(psi, sc, eps))
    _, vjp = jax.vjp(lambda q: explore_mix_psi(q, sc, eps), psi)
    g_chained = vjp(g_eff)[0]
    # oracle: differentiate the composed map directly
    g_direct = jax.grad(
        lambda q: loss_of_logits(explore_mix_psi(q, sc, eps)))(psi)
    np.testing.assert_allclose(np.asarray(g_chained), np.asarray(g_direct),
                               rtol=1e-5, atol=1e-7)

    # the floor holds even for a saturated psi: min sampling mass >= eps/8
    psi_sat = jnp.zeros(8).at[0].set(40.0)
    p_sat = psi_to_probs(explore_mix_psi(psi_sat, sc, eps), sc)
    assert float(p_sat.min()) >= eps / 8.0 * 0.999
