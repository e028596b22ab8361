"""Independent numpy re-derivations of the NeRF math, used as golden oracles.

These are written from the rendering equations (and checked against the
documented behavior of the reference implementation), NOT imported from or
copied out of either codebase under test — so a bug shared between
neuralsim_tpu and this oracle would have to be introduced twice.
"""

import numpy as np


def pe(x, L):
    """positional encoding [x, sin(2^0 x), cos(2^0 x), ..., cos(2^{L-1} x)]."""
    outs = [x]
    for k in range(L):
        outs.append(np.sin(x * (2.0 ** k)))
        outs.append(np.cos(x * (2.0 ** k)))
    return np.concatenate(outs, axis=-1)


def rays_for_pixel(px, py, K, c2w):
    """One camera ray: dir = R @ [(px-cx)/fx, -(py-cy)/fy, -1]."""
    d_cam = np.array(
        [(px - K[0, 2]) / K[0, 0], -(py - K[1, 2]) / K[1, 1], -1.0]
    )
    d_world = c2w[:3, :3] @ d_cam
    o = c2w[:3, -1]
    return o, d_world


def composite(raw, z_vals, ray_d, white_bkgd=False):
    """Alpha compositing for ONE ray: raw [S,4], z_vals [S]."""
    s = len(z_vals)
    dists = np.empty(s)
    dists[:-1] = z_vals[1:] - z_vals[:-1]
    dists[-1] = 1e10
    dists = dists * np.linalg.norm(ray_d)

    rgb = 1.0 / (1.0 + np.exp(-raw[:, :3]))
    sigma = np.maximum(raw[:, 3], 0.0)
    alpha = 1.0 - np.exp(-sigma * dists)

    trans = np.ones(s)
    for i in range(1, s):
        trans[i] = trans[i - 1] * (1.0 - alpha[i - 1] + 1e-10)
    weights = alpha * trans

    rgb_map = (weights[:, None] * rgb).sum(0)
    depth = (weights * z_vals).sum()
    acc = weights.sum()
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc)
    return rgb_map, acc, weights, depth


def invert_cdf(bins, weights, u):
    """Inverse-CDF draw for one ray: bins [B], weights [B-1], u [M]."""
    w = weights + 1e-5
    pdf = w / w.sum()
    cdf = np.concatenate([[0.0], np.cumsum(pdf)])
    samples = []
    for uu in u:
        idx = np.searchsorted(cdf, uu, side="right")
        below = max(0, idx - 1)
        above = min(len(cdf) - 1, idx)
        denom = cdf[above] - cdf[below]
        if denom < 1e-5:
            denom = 1.0
        t = (uu - cdf[below]) / denom
        samples.append(bins[below] + t * (bins[above] - bins[below]))
    return np.array(samples)


def mlp_forward(params, x_pe, d_pe, skips=(4,)):
    """NeRF MLP forward for flat [N, C] inputs with the skip-concat layout."""
    depth = sum(1 for k in params if k.startswith("pts_") and k.endswith("kernel"))
    h = x_pe
    for i in range(depth):
        h = np.maximum(h @ params[f"pts_{i}_kernel"] + params[f"pts_{i}_bias"], 0.0)
        if i in skips:
            h = np.concatenate([x_pe, h], axis=-1)
    alpha = h @ params["alpha_kernel"] + params["alpha_bias"]
    feat = h @ params["feature_kernel"] + params["feature_bias"]
    h = np.concatenate([feat, d_pe], axis=-1)
    h = np.maximum(h @ params["views_0_kernel"] + params["views_0_bias"], 0.0)
    rgb = h @ params["rgb_kernel"] + params["rgb_bias"]
    return np.concatenate([rgb, alpha], axis=-1)
