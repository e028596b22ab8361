"""Frequency positional encoding gamma(x).

Same math and channel ordering as the reference Embedder
(``optimization/utils/run_nerf_helpers.py:18-66``):
``[x, sin(x*2^0), cos(x*2^0), ..., sin(x*2^{L-1}), cos(x*2^{L-1})]``
but computed as one broadcasted outer product instead of a list of python
lambdas — a single fused VPU expression under XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def encoding_dim(input_dims: int, num_freqs: int, include_input: bool = True) -> int:
    return input_dims * (int(include_input) + 2 * num_freqs)


def positional_encoding(x, num_freqs: int, include_input: bool = True):
    """gamma(x) for x[..., D] -> [..., D*(include + 2*num_freqs)].

    Frequencies are 2^k for k in [0, num_freqs) (log-sampled, matching the
    reference's log_sampling=True with max_freq_log2 = multires-1).
    """
    if num_freqs == 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)  # [L]
    xb = x[..., None, :] * freqs[:, None]                # [..., L, D]
    # interleave sin/cos per frequency: [..., L, 2, D] -> [..., L*2*D]
    enc = jnp.stack([jnp.sin(xb), jnp.cos(xb)], axis=-2)
    enc = enc.reshape(*x.shape[:-1], 2 * num_freqs * x.shape[-1])
    if include_input:
        enc = jnp.concatenate([x, enc], axis=-1)
    return enc
