"""ResNet-50 backbone (Flax) with frozen batch-norm.

The reference's detector backbone is detectron2's ResNet-50 with
``FREEZE_AT=6`` — the entire backbone frozen
(``optimization/neural_sim_main.py:617``) and BatchNorm layers that are
*always* FrozenBN (affine constants folded from running stats). We model
exactly that contract: ``FrozenBN`` is a pure affine scale/bias, and the
backbone's parameters can be wrapped in ``jax.lax.stop_gradient`` by the
caller (see ``models.retinanet.RetinaNet.__call__``) — giving identical
semantics to the reference without optimizer param-group surgery.

Conversion note: torchvision/detectron2 checkpoints fold as
``scale = gamma / sqrt(running_var + eps)``, ``bias = beta - mean * scale``.
Bottleneck stride lives on the 3x3 conv (torchvision convention; detectron2
caffe-style ``stride_in_1x1`` is exposed as a flag for weight parity).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class FrozenBN(nn.Module):
    """BatchNorm with folded statistics: y = x * scale + bias."""

    features: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return x * scale + bias


class Bottleneck(nn.Module):
    features: int            # inner width; output is 4x
    stride: int = 1
    stride_in_1x1: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        s1, s3 = (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        out = nn.Conv(self.features, (1, 1), strides=(s1, s1), use_bias=False,
                      dtype=self.dtype, name="conv1")(x)
        out = FrozenBN(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features, (3, 3), strides=(s3, s3), padding=1,
                      use_bias=False, dtype=self.dtype, name="conv2")(out)
        out = FrozenBN(self.features, name="bn2")(out)
        out = nn.relu(out)
        out = nn.Conv(self.features * 4, (1, 1), use_bias=False,
                      dtype=self.dtype, name="conv3")(out)
        out = FrozenBN(self.features * 4, name="bn3")(out)

        if x.shape[-1] != self.features * 4 or self.stride != 1:
            x = nn.Conv(self.features * 4, (1, 1), strides=(self.stride, self.stride),
                        use_bias=False, dtype=self.dtype, name="downsample_conv")(x)
            x = FrozenBN(self.features * 4, name="downsample_bn")(x)
        return nn.relu(out + x)


class ResNet50(nn.Module):
    """Returns (C3, C4, C5) feature maps at strides (8, 16, 32)."""

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    stride_in_1x1: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
                    dtype=self.dtype, name="stem_conv")(x)
        x = FrozenBN(64, name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        widths = (64, 128, 256, 512)
        for stage, (blocks, width) in enumerate(zip(self.stage_blocks, widths)):
            stride = 1 if stage == 0 else 2
            for b in range(blocks):
                x = Bottleneck(
                    width, stride=stride if b == 0 else 1,
                    stride_in_1x1=self.stride_in_1x1, dtype=self.dtype,
                    name=f"res{stage + 2}_block{b}",
                )(x)
            outs.append(x)
        _, c3, c4, c5 = outs
        return c3, c4, c5
