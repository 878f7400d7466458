"""ResNet-18/34 encoder in Flax (NHWC), matching torchvision's layout so
converted torch weights reproduce activations bit-for-bit (up to float32
rounding).

Rebuild of the reference encoder
(libs/deep_models/depth/monodepth2/resnet_encoder.py:17-98) including the
multi-image input variant used by the pose network (2 stacked RGB frames)
and the monodepth2 input normalization (x - 0.45) / 0.225.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import FrozenBatchNorm


class BasicBlock(nn.Module):
    """torchvision BasicBlock: two 3x3 convs + identity/downsample skip."""

    features: int
    stride: int = 1

    @nn.compact
    def __call__(self, x):
        identity = x
        out = nn.Conv(
            self.features,
            (3, 3),
            strides=(self.stride, self.stride),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            name="conv1",
        )(x)
        out = FrozenBatchNorm(self.features, name="bn1")(out)
        out = nn.relu(out)
        out = nn.Conv(
            self.features,
            (3, 3),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            name="conv2",
        )(out)
        out = FrozenBatchNorm(self.features, name="bn2")(out)
        if self.stride != 1 or x.shape[-1] != self.features:
            identity = nn.Conv(
                self.features,
                (1, 1),
                strides=(self.stride, self.stride),
                use_bias=False,
                name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(self.features, name="downsample_bn")(
                identity
            )
        return nn.relu(out + identity)


class ResnetEncoder(nn.Module):
    """ResNet encoder returning the 5-scale feature pyramid.

    Attributes:
        num_layers: 18 or 34 (basic blocks only; the reference uses 18).
        num_input_images: stacked RGB frames (1 for depth, 2 for pose).

    Output channels: [64, 64, 128, 256, 512] at strides [2, 4, 8, 16, 32]
    (`num_ch_enc`, ref resnet_encoder.py:68).
    """

    num_layers: int = 18
    num_input_images: int = 1

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)

    @nn.compact
    def __call__(self, x):
        blocks = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3)}[self.num_layers]
        # monodepth2 input normalization (ref resnet_encoder.py:89)
        x = (x - 0.45) / 0.225

        x = nn.Conv(
            64,
            (7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            name="conv1",
        )(x)
        x = FrozenBatchNorm(64, name="bn1")(x)
        f0 = nn.relu(x)

        x = nn.max_pool(
            f0, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
        )
        feats = [f0]
        for stage, (planes, n_blocks) in enumerate(
            zip((64, 128, 256, 512), blocks)
        ):
            stride = 1 if stage == 0 else 2
            for b in range(n_blocks):
                x = BasicBlock(
                    planes,
                    stride=stride if b == 0 else 1,
                    name=f"layer{stage + 1}_{b}",
                )(x)
            feats.append(x)
        return feats
