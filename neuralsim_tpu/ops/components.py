"""On-device connected components for auto-annotation (VERDICT r3 #5).

The host annotation path (``neuralsim_tpu.native`` C++ / numpy union-find)
reproduces the reference's cv2.connectedComponentsWithStats semantics
(``optimization/neural_sim_main.py:689-690, 786-797``: 8-connected
components of the thresholded render, largest box kept). The primary
data path, however, keeps renders on device end-to-end — and its previous
approximation (bbox of ALL foreground pixels, one box per image) trains on
systematically wider boxes for any frame with disconnected blobs and
cannot annotate multi-object frames at all.

This module computes exact 8-connected component boxes on device with
static shapes:

  - ``label_components``: iterative segmented min-scans. Each foreground
    pixel starts labeled with its row-major index; row and column
    segmented min-scans (jax.lax.associative_scan over (value, reset)
    pairs — reset at background) propagate the component minimum along
    mask runs, and one masked 4-diagonal min step links diagonal
    neighbours. A lax.while_loop iterates to fixpoint: every pixel ends
    with the MIN row-major index of its 8-connected component. The scans
    converge in O(component turns) iterations (2-3 for convex blobs), not
    O(diameter) as plain neighbour propagation would.
  - ``component_boxes``: per-component bounding boxes via scatter-min/max
    of pixel coordinates into label bins, ranked by box area (w*h —
    exactly the host's ``max(stats, key=s[2]*s[3])``) with ties broken by
    first-pixel order like the host's first-encountered-max.

Everything is int/bool downstream of the mask comparison, so no gradient
cotangents ever reach the while_loop — safe inside jax.grad (the unrolled
hypergradient differentiates build_detector_batches_device w.r.t. the
images; annotations are data, reference treats them identically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _segmented_min_scan(v, reset, axis: int, reverse: bool = False):
    """Min-scan of ``v`` along ``axis`` that restarts at ``reset`` pixels
    (background). Standard segmented-scan combine — associative."""

    def combine(a, b):
        av, ar = a
        bv, br = b
        return jnp.where(br, bv, jnp.minimum(av, bv)), ar | br

    out, _ = jax.lax.associative_scan(
        combine, (v, reset), axis=axis, reverse=reverse)
    return out


def _shift2d(x, dy: int, dx: int, fill):
    """Shift [N, H, W] by (dy, dx) filling vacated pixels with ``fill``
    (NO wraparound — a wrapped label would leak across image edges)."""
    n, h, w = x.shape
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), constant_values=fill)
    return p[:, 1 - dy:1 - dy + h, 1 - dx:1 - dx + w]


def label_components(mask) -> jnp.ndarray:
    """8-connected component labels of a [N, H, W] bool mask.

    Returns int32 [N, H, W]: each foreground pixel carries the minimum
    row-major index of its component; background pixels carry H*W.
    """
    mask = jax.lax.stop_gradient(mask)
    n, h, w = mask.shape
    big = jnp.int32(h * w)
    idx = jnp.arange(h * w, dtype=jnp.int32).reshape(1, h, w)
    init = jnp.where(mask, idx, big)
    reset = ~mask

    def body(state):
        lab, _ = state
        new = _segmented_min_scan(lab, reset, axis=2)
        new = _segmented_min_scan(new, reset, axis=2, reverse=True)
        new = _segmented_min_scan(new, reset, axis=1)
        new = _segmented_min_scan(new, reset, axis=1, reverse=True)
        # one masked diagonal-neighbour min links 8-connectivity; the next
        # iteration's scans spread it through the component
        masked = jnp.where(mask, new, big)
        for dy, dx in ((-1, -1), (-1, 1), (1, -1), (1, 1)):
            new = jnp.minimum(new, _shift2d(masked, dy, dx, big))
        new = jnp.where(mask, new, big)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body,
                                (init, jnp.asarray(True)))
    return lab


def component_boxes(mask, max_boxes: int):
    """Top-``max_boxes`` 8-connected component boxes of [N, H, W] masks.

    Returns (boxes [N, K, 4] float32 XYXY with the host path's x + w
    convention, valid [N, K] bool). Slot order: box area (w*h) descending,
    ties by first-pixel (min row-major index) order — slot 0 equals the
    host auto_annotate largest-component box exactly, for ANY number of
    components (selection ranks all components, not the first K found).
    """
    n, h, w = mask.shape
    hw = h * w
    lab = label_components(mask).reshape(n, hw)           # [N, HW]
    rows = jnp.broadcast_to(
        (jnp.arange(hw, dtype=jnp.int32) // w)[None], (n, hw))
    cols = jnp.broadcast_to(
        (jnp.arange(hw, dtype=jnp.int32) % w)[None], (n, hw))

    fg = lab < hw
    # scatter component extrema into label bins (bin index = the
    # component's min pixel index; background scatters into bin hw,
    # dropped by the mode="drop" out-of-bounds rule after clipping off)
    lab_safe = jnp.where(fg, lab, hw)
    full = jnp.full((n, hw), jnp.int32(hw))
    minr = full.at[jnp.arange(n)[:, None], lab_safe].min(
        jnp.where(fg, rows, hw), mode="drop")
    minc = full.at[jnp.arange(n)[:, None], lab_safe].min(
        jnp.where(fg, cols, hw), mode="drop")
    zero = jnp.full((n, hw), jnp.int32(-1))
    maxr = zero.at[jnp.arange(n)[:, None], lab_safe].max(
        jnp.where(fg, rows, -1), mode="drop")
    maxc = zero.at[jnp.arange(n)[:, None], lab_safe].max(
        jnp.where(fg, cols, -1), mode="drop")

    present = maxr >= 0                                    # a real component
    area = (maxr - minr + 1) * (maxc - minc + 1)
    # rank by box area; lax.top_k ties resolve to the lower bin index =
    # first-pixel order, matching the host's first-encountered max
    score = jnp.where(present, area, -1)
    _, top = jax.lax.top_k(score, max_boxes)               # [N, K]
    gather = lambda t: jnp.take_along_axis(t, top, axis=1)
    valid = gather(present)
    boxes = jnp.stack([
        gather(minc).astype(jnp.float32),
        gather(minr).astype(jnp.float32),
        (gather(maxc) + 1).astype(jnp.float32),
        (gather(maxr) + 1).astype(jnp.float32),
    ], axis=-1)
    boxes = jnp.where(valid[..., None], boxes, 0.0)
    return boxes, valid
