"""Monodepth2 depth decoder in Flax (NHWC).

Rebuild of libs/deep_models/depth/monodepth2/depth_decoder.py:17-65: a
skip-connected upconv decoder emitting sigmoid disparity at four scales.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from .layers import Conv3x3, ConvBlock, upsample2x_nearest


class DepthDecoder(nn.Module):
    """Decoder over the 5-scale encoder pyramid.

    Returns {scale: [N x H/2^s x W/2^s x 1] sigmoid disparity} for
    ``scales`` (default 0..3).
    """

    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    scales: Sequence[int] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True

    @nn.compact
    def __call__(self, input_features):
        num_ch_dec = (16, 32, 64, 128, 256)
        outputs = {}
        x = input_features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(num_ch_dec[i], name=f"upconv_{i}_0")(x)
            x = upsample2x_nearest(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, input_features[i - 1]], axis=-1)
            x = ConvBlock(num_ch_dec[i], name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = Conv3x3(
                    self.num_output_channels, name=f"dispconv_{i}"
                )(x)
                outputs[i] = nn.sigmoid(disp)
        return outputs
