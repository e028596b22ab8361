"""Feature Pyramid Network P3-P7 for RetinaNet (Flax).

Lateral 1x1 + top-down nearest-2x + output 3x3 over (C3, C4, C5), with the
RetinaNet extra levels: P6 = 3x3/s2 on C5, P7 = 3x3/s2 on relu(P6) —
matching detectron2's ``LastLevelP6P7(in_feature="res5")`` used by the
reference's retinanet_R_50_FPN_3x config (``neural_sim_main.py:598``).
"""

from __future__ import annotations

from typing import List

import flax.linen as nn
import jax
import jax.numpy as jnp


def _upsample_nearest_to(x, h_out: int, w_out: int):
    """Nearest-neighbor upsample to the LATERAL's actual spatial size
    (torchvision FPN does F.interpolate(size=lateral.shape): with
    SAME-padded ceil(side/stride) backbone maps, 2x only matches at
    even sizes — at 100px C4 is 7 while 2*C5 is 8)."""
    n, h, w, c = x.shape
    if (h_out, w_out) == (2 * h, 2 * w):
        return jnp.broadcast_to(
            x[:, :, None, :, None, :], (n, h, 2, w, 2, c)
        ).reshape(n, 2 * h, 2 * w, c)
    ri = jnp.minimum((jnp.arange(h_out) * h) // h_out, h - 1)
    ci = jnp.minimum((jnp.arange(w_out) * w) // w_out, w - 1)
    return x[:, ri][:, :, ci]


class FPN(nn.Module):
    """p6_source selects which feature feeds the P6 stride-2 conv:
    "c5" (2048 ch) is detectron2's LastLevelP6P7(in_feature="res5") — the
    reference's layout; "p5" (256 ch) is torchvision's LastLevelP6P7(256, 256)
    — needed so real torchvision retinanet_resnet50_fpn checkpoints (whose p6
    kernel is [3,3,256,256]) drop in without shape mismatch."""

    out_channels: int = 256
    p6_source: str = "c5"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, c3, c4, c5) -> List[jnp.ndarray]:
        l5 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="lateral5")(c5)
        l4 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="lateral4")(c4)
        l3 = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name="lateral3")(c3)

        t4 = l4 + _upsample_nearest_to(l5, l4.shape[1], l4.shape[2])
        t3 = l3 + _upsample_nearest_to(t4, l3.shape[1], l3.shape[2])

        p5 = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="output5")(l5)
        p4 = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="output4")(t4)
        p3 = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                     name="output3")(t3)

        if self.p6_source not in ("c5", "p5"):
            raise ValueError(f"p6_source must be 'c5' or 'p5', got {self.p6_source!r}")
        p6 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p6")(
                         c5 if self.p6_source == "c5" else p5)
        p7 = nn.Conv(self.out_channels, (3, 3), strides=(2, 2), padding=1,
                     dtype=self.dtype, name="p7")(nn.relu(p6))
        return [p3, p4, p5, p6, p7]
