"""Influence-function engine vs closed forms on quadratic losses."""

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.hypergrad.influence import (
    grad_loss,
    hvp,
    inverse_hvp,
    mixed_grad_wrt_images,
    tree_dot,
)


def quad_loss(params, batch):
    """L = 0.5 theta^T A theta + b.theta with A from the batch."""
    A, b = batch
    th = params["theta"]
    return 0.5 * th @ A @ th + b @ th


def _setup(rng, d=6):
    M = rng.randn(d, d)
    A = (M @ M.T + d * np.eye(d)).astype(np.float32)  # SPD
    b = rng.randn(d).astype(np.float32)
    theta = rng.randn(d).astype(np.float32)
    params = {"theta": jnp.array(theta)}
    batch = (jnp.array(A), jnp.array(b))
    return A, b, theta, params, batch


def test_grad_loss_accumulates(rng):
    A, b, theta, params, batch = _setup(rng)
    g = grad_loss(quad_loss, params, [batch, batch])
    want = 2 * (A @ theta + b)
    np.testing.assert_allclose(np.asarray(g["theta"]), want, rtol=1e-4)


def test_grad_loss_scan_matches_list(rng):
    A, b, theta, params, batch = _setup(rng)
    stacked = (jnp.stack([batch[0]] * 3), jnp.stack([batch[1]] * 3))
    g_scan = grad_loss(quad_loss, params, stacked)
    g_list = grad_loss(quad_loss, params, [batch] * 3)
    np.testing.assert_allclose(
        np.asarray(g_scan["theta"]), np.asarray(g_list["theta"]), rtol=1e-5
    )


def test_hvp_equals_Av(rng):
    A, b, theta, params, batch = _setup(rng)
    v = {"theta": jnp.array(rng.randn(6).astype(np.float32))}
    out = hvp(quad_loss, params, batch, v)
    np.testing.assert_allclose(
        np.asarray(out["theta"]), A @ np.asarray(v["theta"]), rtol=1e-4
    )


def test_inverse_hvp_modes(rng):
    A, b, theta, params, batch = _setup(rng)
    v_np = rng.randn(6).astype(np.float32)
    v = {"theta": jnp.array(v_np)}

    out = inverse_hvp(quad_loss, params, batch, v, "identity")
    np.testing.assert_allclose(np.asarray(out["theta"]), v_np)

    out = inverse_hvp(quad_loss, params, batch, v, "ones")
    np.testing.assert_allclose(np.asarray(out["theta"]), 1.0)

    out = inverse_hvp(quad_loss, params, batch, v, "onestep", damping=1e-2)
    np.testing.assert_allclose(
        np.asarray(out["theta"]), A @ v_np + 1e-2 * v_np, rtol=1e-4
    )

    out = inverse_hvp(quad_loss, params, batch, v, "neumann")
    np.testing.assert_allclose(
        np.asarray(out["theta"]), 2 * v_np - A @ v_np, rtol=1e-4
    )


def test_cg_solves_linear_system(rng):
    A, b, theta, params, batch = _setup(rng)
    v_np = rng.randn(6).astype(np.float32)
    v = {"theta": jnp.array(v_np)}
    damping = 1e-2
    out = inverse_hvp(quad_loss, params, batch, v, "cg", damping=damping,
                      cg_iters=30)
    want = np.linalg.solve(A + damping * np.eye(6), v_np)
    np.testing.assert_allclose(np.asarray(out["theta"]), want, rtol=1e-3, atol=1e-4)


def test_lissa_converges_to_damped_inverse(rng):
    A, b, theta, params, batch = _setup(rng)
    v_np = rng.randn(6).astype(np.float32)
    v = {"theta": jnp.array(v_np)}
    damping = 1e-2
    scale = float(np.linalg.norm(A + damping * np.eye(6), 2)) * 1.5
    out = inverse_hvp(quad_loss, params, batch, v, "lissa", damping=damping,
                      lissa_iters=400, lissa_scale=scale)
    want = np.linalg.solve(A + damping * np.eye(6), v_np)
    np.testing.assert_allclose(np.asarray(out["theta"]), want,
                               rtol=1e-3, atol=1e-4)


def test_lissa_stacked_batches(rng):
    """Stochastic mode: per-step minibatches whose mean Hessian is A."""
    A, b, theta, params, batch = _setup(rng)
    v_np = rng.randn(6).astype(np.float32)
    v = {"theta": jnp.array(v_np)}
    damping, iters = 1e-2, 200
    scale = float(np.linalg.norm(A + damping * np.eye(6), 2)) * 2.0
    # alternate A*(1 +/- eps): same solution once averaged over the recursion
    eps = 0.05
    factors = np.where(np.arange(iters) % 2 == 0, 1 + eps, 1 - eps)
    As = jnp.array(factors[:, None, None] * A[None], jnp.float32)
    bs = jnp.broadcast_to(jnp.array(b), (iters, 6))
    out = inverse_hvp(quad_loss, params, (As, bs), v, "lissa",
                      damping=damping, lissa_iters=iters, lissa_scale=scale,
                      lissa_stacked=True)
    want = np.linalg.solve(A + damping * np.eye(6), v_np)
    np.testing.assert_allclose(np.asarray(out["theta"]), want,
                               rtol=2e-2, atol=1e-3)


def test_lissa_stacked_shape_guard(rng):
    A, b, theta, params, batch = _setup(rng)
    v = {"theta": jnp.array(rng.randn(6).astype(np.float32))}
    try:
        inverse_hvp(quad_loss, params, batch, v, "lissa",
                    lissa_iters=7, lissa_stacked=True)
    except ValueError as e:
        assert "lead with [7]" in str(e)
    else:
        raise AssertionError("stacked LiSSA accepted un-stacked batch")


def test_mixed_grad_wrt_images_closed_form(rng):
    """L(theta, I) = theta . (W I_flat): d/dI <dL/dtheta, v> = W^T v."""
    d, hw = 4, 9
    W = rng.randn(d, hw).astype(np.float32)
    v_np = rng.randn(d).astype(np.float32)
    params = {"theta": jnp.array(rng.randn(d).astype(np.float32))}
    v = {"theta": jnp.array(v_np)}

    def loss_img(p, img):
        return p["theta"] @ (jnp.array(W) @ img.reshape(-1))

    images = jnp.array(rng.randn(1, 3, 3).astype(np.float32))
    out = mixed_grad_wrt_images(loss_img, params, images, v)
    want = (W.T @ v_np).reshape(1, 3, 3)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-4, atol=1e-5)


def test_tree_dot():
    a = {"x": jnp.array([1.0, 2.0]), "y": jnp.array([[3.0]])}
    b = {"x": jnp.array([4.0, 5.0]), "y": jnp.array([[2.0]])}
    assert float(tree_dot(a, b)) == 1 * 4 + 2 * 5 + 3 * 2


def test_hvp_mean_over_batches(rng):
    import jax
    from neuralsim_tpu.hypergrad.influence import hvp_mean

    d = 5
    A1 = np.eye(d, dtype=np.float32) * 2
    A2 = np.eye(d, dtype=np.float32) * 4
    b = np.zeros(d, np.float32)
    params = {"theta": jnp.array(rng.randn(d).astype(np.float32))}
    v = {"theta": jnp.array(rng.randn(d).astype(np.float32))}
    batches = (jnp.stack([jnp.array(A1), jnp.array(A2)]),
               jnp.stack([jnp.array(b)] * 2))
    out = hvp_mean(quad_loss, params, batches, v)
    # mean of 2v and 4v = 3v
    np.testing.assert_allclose(np.asarray(out["theta"]),
                               3 * np.asarray(v["theta"]), rtol=1e-5)


def test_influence_ift_sign_matches_true_gradient(rng):
    """The implicit-function-theorem sign: the true dL_val/dI equals the
    NEGATED influence product mixed.(H^-1 v) — the reference omits the minus
    (neural_sim_main.py:855-911), so BilevelConfig.influence_sign defaults
    to -1.0. Exact on a quadratic inner problem with a closed-form argmin.

    inner: L_tr(theta, I) = 0.5||theta - A I||^2  -> theta*(I) = A I, H = Id
    val:   L_val(theta)   = 0.5||theta - t||^2
    true:  dL_val/dI = A^T (theta* - t)
    """
    A = jnp.asarray(rng.randn(4, 3), jnp.float32)
    t = jnp.asarray(rng.randn(4), jnp.float32)
    img = jnp.asarray(rng.randn(3), jnp.float32)
    theta_star = A @ img

    loss_tr = lambda p, i: 0.5 * jnp.sum((p - A @ i) ** 2)
    loss_val = lambda p: 0.5 * jnp.sum((p - t) ** 2)

    v = jax.grad(loss_val)(theta_star)
    ihvp = inverse_hvp(loss_tr, theta_star, img, v, method="cg",
                       damping=0.0, cg_iters=8)
    # reference-convention (positive) influence grad_E
    grad_e_ref = mixed_grad_wrt_images(loss_tr, theta_star, img[None], ihvp)[0]
    true = jax.grad(lambda i: loss_val(A @ i))(img)
    np.testing.assert_allclose(np.asarray(-grad_e_ref), np.asarray(true),
                               rtol=1e-4, atol=1e-6)


def test_cg_normal_indefinite_hessian(rng):
    """cg_normal recovers A^{-1} v (sign-correct) on an INDEFINITE
    Hessian, the regime where plain cg breaks down and fixed-scale lissa
    diverges (round-5 scripts/diag_hypergrad_solvers.py finding)."""
    d = 6
    Q, _ = np.linalg.qr(rng.randn(d, d))
    eigs = np.array([4.0, 2.5, 1.5, -0.8, -2.0, -3.5], np.float32)
    A = (Q @ np.diag(eigs) @ Q.T).astype(np.float32)
    b = np.zeros(d, np.float32)
    params = {"theta": jnp.zeros(d, jnp.float32)}
    batch = (jnp.array(A), jnp.array(b))
    v_np = rng.randn(d).astype(np.float32)
    v = {"theta": jnp.array(v_np)}

    damping = 1e-2
    out = inverse_hvp(quad_loss, params, batch, v, "cg_normal",
                      damping=damping, cg_iters=50)
    A_d = A + damping * np.eye(d, dtype=np.float32)
    want = np.linalg.solve(A_d @ A_d + damping**2 * np.eye(d), A_d @ v_np)
    got = np.asarray(out["theta"])
    assert np.all(np.isfinite(got))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    # sign-correct: aligned with the true damped inverse
    truth = np.linalg.solve(A_d, v_np)
    cos = got @ truth / (np.linalg.norm(got) * np.linalg.norm(truth))
    assert cos > 0.99


def test_lissa_auto_scale_guards_divergence(rng):
    """With lissa_scale below ||H|| the fixed-scale recursion diverges;
    lissa_scale<=0 (auto, power-iteration) converges on the same system."""
    d = 6
    M = rng.randn(d, d)
    A = (M @ M.T + 50.0 * np.eye(d)).astype(np.float32)  # SPD, ||A|| >> 25
    b = np.zeros(d, np.float32)
    params = {"theta": jnp.zeros(d, jnp.float32)}
    batch = (jnp.array(A), jnp.array(b))
    v_np = rng.randn(d).astype(np.float32)
    v = {"theta": jnp.array(v_np)}
    damping = 1e-2

    fixed = inverse_hvp(quad_loss, params, batch, v, "lissa",
                        damping=damping, lissa_iters=80, lissa_scale=25.0)
    fixed_np = np.asarray(fixed["theta"])
    want = np.linalg.solve(A + damping * np.eye(d), v_np)
    fixed_err = np.linalg.norm(fixed_np - want) / np.linalg.norm(want)
    assert (not np.all(np.isfinite(fixed_np))) or fixed_err > 10.0

    auto = inverse_hvp(quad_loss, params, batch, v, "lissa",
                       damping=damping, lissa_iters=2000, lissa_scale=-1.0)
    auto_np = np.asarray(auto["theta"])
    assert np.all(np.isfinite(auto_np))
    np.testing.assert_allclose(auto_np, want, rtol=2e-2, atol=1e-4)
