"""psi optimizer semantics vs independent numpy references."""

import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.bilevel.psi_opt import (
    adjust_learning_rate,
    psi_optimizer_init,
    psi_optimizer_update,
)


def test_sgd_step():
    st = psi_optimizer_init("sgd", 0.1)
    psi = jnp.ones(8)
    g = jnp.full(8, 2.0)
    _, new = psi_optimizer_update(st, psi, g)
    np.testing.assert_allclose(np.asarray(new), 1.0 - 0.1 * 2.0, rtol=1e-6)


def test_momentum_accumulates():
    st = psi_optimizer_init("momentum", 0.1, momentum=0.9)
    psi = jnp.zeros(8)
    g = jnp.ones(8)
    v = np.zeros(8)
    p = np.zeros(8)
    for _ in range(4):
        st, psi = psi_optimizer_update(st, psi, g)
        v = 0.9 * v - 0.1 * np.ones(8)
        p = p + v
    np.testing.assert_allclose(np.asarray(psi), p, rtol=1e-5)


def test_adam_matches_reference_formulation():
    st = psi_optimizer_init("Adam", 0.001)
    psi = jnp.zeros(8)
    g = jnp.full(8, 0.5)
    m = np.zeros(8)
    v = np.zeros(8)
    p = np.zeros(8)
    for t in range(1, 4):
        st, psi = psi_optimizer_update(st, psi, g)
        m += (1 - 0.9) * (0.5 - m)
        v += (1 - 0.999) * (0.25 - v)
        lr_t = 0.001 * np.sqrt(1 - 0.999**t) / (1 - 0.9**t)
        p -= lr_t * m / (np.sqrt(v) + 1e-7)
    np.testing.assert_allclose(np.asarray(psi), p, rtol=1e-5)


def test_lr_schedule():
    assert adjust_learning_rate(0, 1.0, 50) == 0.0
    assert adjust_learning_rate(5, 1.0, 50) == 1.0
    assert abs(adjust_learning_rate(25, 1.0, 50) - 0.5) < 1e-9
    # warmup is linear
    assert abs(adjust_learning_rate(2, 1.0, 50) - 0.4) < 1e-9
    # clamped at zero past max_epoch: the raw reference formula goes
    # negative there (gradient ASCENT for any caller running extra epochs)
    assert adjust_learning_rate(50, 1.0, 50) == 0.0
    assert adjust_learning_rate(75, 1.0, 50) == 0.0
