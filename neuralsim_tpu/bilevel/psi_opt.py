"""Outer-loop psi optimizers: SGD / momentum / Adam on the 8-dim psi vector.

Capability parity with the reference's standalone numpy optimizers
(``optimization/neural_sim_main.py:1085-1134``) and the warmup/decay schedule
(``adjust_learning_rate``, :1137-1141) — re-designed as a pure functional
(state, grad) -> (state, params) update so the whole outer step can live
inside jit. Semantics notes:

  - the reference's SGD/Momentum/Adam all *descend* (params -= lr*grad);
  - Adam uses the reference's bias-corrected-lr formulation with eps=1e-7.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PsiOptState(NamedTuple):
    method: str          # static: "sgd" | "momentum" | "adam"
    lr: jnp.ndarray      # current learning rate (mutable via schedule)
    momentum: float
    beta1: float
    beta2: float
    step: jnp.ndarray    # adam t
    m: jnp.ndarray
    v: jnp.ndarray


def psi_optimizer_init(method: str, lr: float, dim: int = 8,
                       momentum: float = 0.9, beta1: float = 0.9,
                       beta2: float = 0.999) -> PsiOptState:
    method = {"sgd": "sgd", "momentum": "momentum", "adam": "adam",
              "Adam": "adam"}[method]
    zeros = jnp.zeros((dim,), jnp.float32)
    return PsiOptState(
        method=method,
        lr=jnp.asarray(lr, jnp.float32),
        momentum=momentum,
        beta1=beta1,
        beta2=beta2,
        step=jnp.zeros((), jnp.int32),
        m=zeros,
        v=zeros,
    )


def psi_optimizer_update(state: PsiOptState, psi, grad):
    """One descent step; returns (new_state, new_psi)."""
    if state.method == "sgd":
        return state, psi - state.lr * grad

    if state.method == "momentum":
        vel = state.momentum * state.m - state.lr * grad
        return state._replace(m=vel), psi + vel

    # adam
    t = state.step + 1
    m = state.m + (1.0 - state.beta1) * (grad - state.m)
    v = state.v + (1.0 - state.beta2) * (grad**2 - state.v)
    tf = t.astype(jnp.float32)
    lr_t = state.lr * jnp.sqrt(1.0 - state.beta2**tf) / (1.0 - state.beta1**tf)
    new_psi = psi - lr_t * m / (jnp.sqrt(v) + 1e-7)
    return state._replace(step=t, m=m, v=v), new_psi


def adjust_learning_rate(epoch: int, base_lr: float, max_epoch: int) -> float:
    """5-epoch linear warmup then linear decay (reference :1137-1141).

    Clamped at zero: the reference formula goes NEGATIVE past max_epoch
    (gradient ASCENT) — it never notices because its loop runs exactly
    max_epoch epochs, but any caller running run_epoch past bc.n_epochs
    (demos, resumed runs) would silently optimize psi the wrong way."""
    if epoch <= 5:
        return base_lr * epoch / 5.0
    return max(0.0, base_lr * (1.0 - epoch / max_epoch))
