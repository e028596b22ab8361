"""Gumbel-softmax relaxation of categorical sampling.

Capability parity with the reference (``optimization/utils/gumble.py:57-70``):
a soft sample is the softmax-weighted expectation of the bin-center degrees,
``sum(softmax((logits + g)/T) * degrees)``, with g ~ Gumbel(0,1).

TPU-native difference: the reference needs TWO functions — a no-grad numpy
draw that *returns the noise* plus a torch replay that re-consumes it — so
the sampled pose and its gradient path agree. With explicit PRNG keys, one
differentiable function and one noise-drawing function compose: replay is
just "pass the same noise array", and under ``jax.grad`` no replay is needed
at all.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_noise(key, shape):
    """g ~ Gumbel(0, 1) via inverse transform -log(-log(U))."""
    u = jax.random.uniform(key, shape, minval=1e-20, maxval=1.0)
    return -jnp.log(-jnp.log(u))


def gumbel_softmax_expectation(logits, values, noise, temperature: float):
    """Differentiable soft sample: E_{softmax((logits+noise)/T)}[values].

    Args:
      logits: [..., C] log-probabilities (unnormalized fine).
      values: [C] per-category values (bin-center degrees).
      noise: [..., C] Gumbel noise (fixed / replayable).
    """
    y = jax.nn.softmax((logits + noise) / temperature, axis=-1)
    return jnp.sum(y * values, axis=-1)
