"""Influence-function hypergradient engine, generic over a loss function.

Capability parity with the reference's detector-side machinery
(``optimization/neural_sim_main.py:855-1069``), re-expressed as jax
transform compositions instead of hand-chained ``torch.autograd.grad``
calls over optimizer param groups:

  reference                         here
  ---------------------------------------------------------------------
  get_test_grad_loss_no_reg_val     grad_loss over val batches (:939-977)
  hessian_vector_product            hvp = jvp-of-grad          (:1019-1069)
  minibatch_hessian_vector_val      inverse_hvp("onestep")     (:995-1018)
  cg_max_iter=-1 identity           inverse_hvp("identity")    (:927-928)
  cg_max_iter=-2 ones               inverse_hvp("ones")        (:929-930)
  cg_max_iter=-3 Neumann 2v-Hv      inverse_hvp("neumann")     (:988-991)
  dead CG branch (:993, undefined)  inverse_hvp("cg") — a REAL CG solver
  dead lissa branch (:984, undef.)  inverse_hvp("lissa") — a REAL LiSSA loop
  (no reference analog)             inverse_hvp("cg_normal") — SPD
                                    normal-equations CG, the sign-correct
                                    solve for indefinite H
  compute_grad_E mixed partial      mixed_grad_wrt_images      (:855-911)

All functions take ``loss_fn(params, batch) -> scalar`` and pytree params;
they are pure and jittable, so the whole hypergradient chain can live in one
compiled program with the inner-training step.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp


def tree_dot(a, b):
    leaves = jax.tree_util.tree_map(lambda x, y: jnp.vdot(x, y), a, b)
    return jax.tree_util.tree_reduce(jnp.add, leaves)


def flat_dot(a, b):
    return tree_dot(a, b)


def tree_axpy(alpha, x, y):
    return jax.tree_util.tree_map(lambda xi, yi: alpha * xi + yi, x, y)


def grad_loss(loss_fn: Callable, params, batches) -> "jax.Array":
    """Accumulated dL/dparams over a sequence of batches (the reference
    accumulates .grad over the whole val loader, :948-975).

    ``batches`` is a pytree whose leaves have a leading batch-of-batches dim,
    scanned on-device; or a python LIST of batches (host loop — tuples are
    treated as pytrees, not sequences)."""
    g_fn = jax.grad(loss_fn)
    if isinstance(batches, list):
        total = None
        for b in batches:
            g = g_fn(params, b)
            total = g if total is None else jax.tree_util.tree_map(jnp.add, total, g)
        return total

    def body(acc, batch):
        g = g_fn(params, batch)
        return jax.tree_util.tree_map(jnp.add, acc, g), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    total, _ = jax.lax.scan(body, zero, batches)
    return total


def hvp(loss_fn: Callable, params, batch, v):
    """(d2L/dtheta2) v via forward-over-reverse: jvp of grad — one extra
    forward+backward instead of the reference's double reverse-mode chain."""
    g_fn = lambda p: jax.grad(loss_fn)(p, batch)
    return jax.jvp(g_fn, (params,), (v,))[1]


def hvp_mean(loss_fn: Callable, params, batches, v):
    """Hv averaged over a stack of batches (leading axis on every leaf) —
    the reference's stoc_hessian=False loop (neural_sim_main.py:998-1016
    without the one-batch break), scanned on-device."""

    def body(acc, batch):
        out = hvp(loss_fn, params, batch, v)
        return jax.tree_util.tree_map(jnp.add, acc, out), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, v)
    total, _ = jax.lax.scan(body, zero, batches)
    n = jax.tree_util.tree_leaves(batches)[0].shape[0]
    return jax.tree_util.tree_map(lambda x: x / n, total)


def inverse_hvp(loss_fn: Callable, params, batch, v, method: str = "onestep",
                damping: float = 1e-2, cg_iters: int = 10,
                lissa_iters: int = 30, lissa_scale: float = 25.0,
                lissa_stacked: bool = False):
    """Approximate H^{-1} v (or the reference's stand-ins for it).

    methods:
      identity : v                          (reference cg_max_iter=-1)
      ones     : ones_like(v)               (reference cg_max_iter=-2)
      onestep  : (H + damping I) v          (reference live default — NOTE
                 this is NOT an inverse; reproduced as a compatibility mode)
      neumann  : 2v - Hv                    (reference cg_max_iter=-3,
                 first-order Neumann series for H^{-1}v when ||H|| < 1)
      cg       : conjugate-gradient solve of (H + damping I) x = v — the
                 solver the reference's dead branch intended (:993). CG
                 assumes SPD; at underfit inner-train states the detector
                 Hessian is indefinite and CG can break down (alpha through
                 a ~0 or negative curvature p'Ap). Prefer cg_normal there.
      cg_normal: CG on the NORMAL equations (A'A + mu I) x = A'v with
                 A = H + damping I (symmetric, so A'A = A^2, A'v = Av) —
                 an SPD system for ANY symmetric A, converging to the
                 Tikhonov-regularised pseudo-inverse A^+ v. Sign-correct
                 where plain cg/lissa diverge on indefinite H (measured:
                 scripts/diag_hypergrad_solvers.py); costs 2 HVPs/iter.
      lissa    : LiSSA truncated-Neumann recursion (Agarwal et al. 2017,
                 the estimator the reference's dead ``get_inverse_hvp_lissa``
                 branch named, :984): x_j = v + (I - (H + damping I)/scale)
                 x_{j-1}, x_0 = v; returns x_J / scale -> (H + damping I)^{-1}
                 v as J -> inf whenever H + damping I is PSD AND
                 scale > ||H + damping I|| (eigenvalues of I - A/scale must
                 lie in (-1, 1); a negative eigenvalue of A diverges at any
                 scale — use cg_normal for indefinite H). Each step is a
                 single HVP — a fixed-length lax.scan here. ``lissa_scale
                 <= 0`` selects AUTO scaling: the spectral norm of A is
                 estimated by power iteration (8 HVPs) and scale is set to
                 2x the estimate, guarding the divergence the fixed default
                 hits when ||H|| is underestimated.
                 With ``lissa_stacked=True``, ``batch`` leaves must carry a
                 leading ``lissa_iters`` axis and each recursion step
                 consumes its own minibatch (the stochastic estimator of the
                 paper); otherwise the single batch is replayed every step.
    """
    if method == "identity":
        return v
    if method == "ones":
        return jax.tree_util.tree_map(jnp.ones_like, v)
    if method == "onestep":
        hv = hvp(loss_fn, params, batch, v)
        return tree_axpy(damping, v, hv)
    if method == "neumann":
        hv = hvp(loss_fn, params, batch, v)
        return jax.tree_util.tree_map(lambda a, b: 2.0 * a - b, v, hv)
    if method == "cg":
        return _cg_solve(
            lambda x: tree_axpy(damping, x, hvp(loss_fn, params, batch, x)),
            v, cg_iters,
        )
    if method == "cg_normal":
        a_mv = lambda x: tree_axpy(damping, x, hvp(loss_fn, params, batch, x))
        # (A^2 + mu I) x = A v;  mu = damping^2 keeps the Tikhonov floor at
        # the same order as A's own eigenvalue shift so near-null directions
        # of A stay bounded instead of exploding through 1/lambda^2.
        mu = damping * damping
        return _cg_solve(lambda x: tree_axpy(mu, x, a_mv(a_mv(x))),
                         a_mv(v), cg_iters)
    if method == "lissa":
        return _lissa_solve(loss_fn, params, batch, v, damping,
                            lissa_iters, lissa_scale, lissa_stacked)
    raise ValueError(f"unknown inverse-HVP method: {method}")


def _lissa_solve(loss_fn, params, batch, v, damping, iters, scale, stacked):
    """Truncated stochastic Neumann series for (H + damping I)^{-1} v.

    ``batch`` is a single minibatch (replayed every recursion step) or, with
    ``stacked``, a stack whose leaves carry a leading ``iters`` axis (one
    minibatch per step — LiSSA's stochastic estimator). Fixed-length
    lax.scan, jittable.
    """
    if stacked:
        lead = {tuple(l.shape[:1]) for l in jax.tree_util.tree_leaves(batch)}
        if lead != {(iters,)}:
            raise ValueError(
                f"lissa_stacked batch leaves must lead with [{iters}]; "
                f"got leading dims {sorted(lead)}")

    if scale <= 0:
        # Auto scale: power-iterate A = H + damping I on the first batch to
        # estimate its spectral norm, then take 2x so eig(A)/scale <= 0.5
        # and the Neumann factor |1 - lam/scale| stays < 1 for PSD A. The
        # estimate is a traced scalar — one compiled program still serves
        # every call.
        pw_batch = (jax.tree_util.tree_map(lambda l: l[0], batch)
                    if stacked else batch)
        a_mv = lambda x: tree_axpy(damping, x, hvp(loss_fn, params, pw_batch, x))

        def pw_body(u, _):
            au = a_mv(u)
            nrm = jnp.sqrt(jnp.maximum(tree_dot(au, au).real, 1e-30))
            return jax.tree_util.tree_map(lambda z: z / nrm, au), nrm

        u0_nrm = jnp.sqrt(jnp.maximum(tree_dot(v, v).real, 1e-30))
        u0 = jax.tree_util.tree_map(lambda z: z / u0_nrm, v)
        _, nrms = jax.lax.scan(pw_body, u0, None, length=8)
        scale = 2.0 * jnp.maximum(nrms[-1], 1.0)

    def body(x, step_batch):
        b = step_batch if stacked else batch
        hx = tree_axpy(damping, x, hvp(loss_fn, params, b, x))
        x = jax.tree_util.tree_map(
            lambda vi, xi, hi: vi + xi - hi / scale, v, x, hx)
        return x, None

    xs = batch if stacked else None
    x, _ = jax.lax.scan(body, v, xs, length=iters)
    return jax.tree_util.tree_map(lambda xi: xi / scale, x)


def _cg_solve(matvec, b, iters: int):
    """Plain CG for SPD matvec; fixed iteration count (jit-friendly)."""

    def body(carry, _):
        x, r, p, rs = carry
        ap = matvec(p)
        alpha = rs / jnp.maximum(tree_dot(p, ap), 1e-20)
        x = tree_axpy(alpha, p, x)
        r = tree_axpy(-alpha, ap, r)
        rs_new = tree_dot(r, r)
        beta = rs_new / jnp.maximum(rs, 1e-20)
        p = tree_axpy(beta, p, r)
        return (x, r, p, rs_new), rs_new

    x0 = jax.tree_util.tree_map(jnp.zeros_like, b)
    init = (x0, b, b, tree_dot(b, b))
    (x, _, _, _), _ = jax.lax.scan(body, init, None, length=iters)
    return x


def mixed_grad_wrt_images(loss_fn_img: Callable, params, images, v):
    """grad_E: d/dI <dL_train/dtheta, v> for a batch of images.

    The reference loops images on the host with create_graph double-grads
    (:855-911); here the scalar g(I) = <grad_theta L(theta, I), v> is
    differentiated w.r.t. I directly — one vjp-of-grad per image, vmapped.

    Args:
      loss_fn_img: (params, image) -> scalar train loss for one image.
      images: [P, H, W, C].
      v: inverse-HVP pytree (same structure as params).

    Returns: grad_E [P, H, W, C].
    """

    def g_of_image(image):
        inner = lambda img: tree_dot(jax.grad(loss_fn_img)(params, img), v)
        return jax.grad(inner)(image)

    return jax.lax.map(g_of_image, images)
