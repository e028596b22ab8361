"""Sampler diagnostics — the reference's gumble.py __main__ demo
(``optimization/utils/gumble.py:85-134``) as a library function: draw many
soft samples at several temperatures, histogram them against the target
categorical, optionally render a figure (matplotlib optional)."""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from neuralsim_tpu.config import SamplerConfig
from neuralsim_tpu.sampler.gumbel import gumbel_noise, gumbel_softmax_expectation
from neuralsim_tpu.sampler.poses import bin_centers


def sample_histogram(probs, temperature: float, n_samples: int = 1000,
                     key=None, sc: Optional[SamplerConfig] = None) -> np.ndarray:
    """Empirical bin frequencies of gumbel-softmax(+uniform-in-bin) samples."""
    sc = sc or SamplerConfig()
    key = key if key is not None else jax.random.PRNGKey(0)
    kg, ku = jax.random.split(key)
    logits = jnp.log(jnp.asarray(probs) + 1e-12)
    centers = bin_centers(sc)
    noise = gumbel_noise(kg, (n_samples, sc.n_bins))
    soft = jax.vmap(
        lambda n: gumbel_softmax_expectation(logits, centers, n, temperature)
    )(noise)
    u = jax.random.uniform(ku, (n_samples,))
    samples = soft - sc.bin_width_deg / 2 + sc.bin_width_deg * u
    bins = np.floor_divide(np.asarray(samples), sc.bin_width_deg).astype(int)
    bins = np.mod(bins, sc.n_bins)
    return np.bincount(bins, minlength=sc.n_bins) / n_samples


def temperature_sweep(probs, temperatures: Sequence[float] = (0.01, 0.1, 5.0),
                      n_samples: int = 1000, key=None) -> Dict[float, np.ndarray]:
    """Reference demo comparison: how the soft-sample histogram tracks the
    target distribution as T varies (low T -> faithful, high T -> uniform)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    out = {}
    for i, t in enumerate(temperatures):
        out[t] = sample_histogram(probs, t, n_samples, jax.random.fold_in(key, i))
    return out


def plot_temperature_sweep(probs, out_path: str, **kw) -> Optional[str]:
    """Write the histogram figure if matplotlib is available (the reference
    saves 'gumbel.png'); returns the path or None."""
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except Exception:
        return None
    sweep = temperature_sweep(probs, **kw)
    fig, axes = plt.subplots(1, len(sweep) + 1, figsize=(4 * (len(sweep) + 1), 3))
    axes[0].bar(range(len(probs)), np.asarray(probs))
    axes[0].set_title("target")
    for ax, (t, freq) in zip(axes[1:], sweep.items()):
        ax.bar(range(len(freq)), freq)
        ax.set_title(f"T={t}")
    fig.tight_layout()
    fig.savefig(out_path)
    plt.close(fig)
    return out_path
