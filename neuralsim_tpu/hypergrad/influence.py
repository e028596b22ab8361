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
                 solver the reference's dead branch intended (:993)
      lissa    : LiSSA truncated-Neumann recursion (Agarwal et al. 2017,
                 the estimator the reference's dead ``get_inverse_hvp_lissa``
                 branch named, :984): x_j = v + (I - (H + damping I)/scale)
                 x_{j-1}, x_0 = v; returns x_J / scale -> (H + damping I)^{-1}
                 v as J -> inf whenever scale > ||H + damping I||. Unlike CG
                 it needs no SPD assumption beyond that spectral bound, and
                 each step is a single HVP — a fixed-length lax.scan here.
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
