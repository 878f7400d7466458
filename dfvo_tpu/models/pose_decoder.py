"""Monodepth2 pose decoder in Flax (NHWC).

Rebuild of libs/deep_models/pose/monodepth2/pose_decoder.py:14-54: squeeze
1x1 conv on the last encoder feature, three pose convs, global average,
0.01-scaled (axisangle, translation) output.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class PoseDecoder(nn.Module):
    num_ch_enc: Sequence[int] = (64, 64, 128, 256, 512)
    num_input_features: int = 1
    num_frames_to_predict_for: int = 2

    @nn.compact
    def __call__(self, last_features):
        """Args: last_features: list (len ``num_input_features``) of
        [N x H x W x C] deepest encoder features.

        Returns:
            (axisangle [N x F x 1 x 3], translation [N x F x 1 x 3]).
        """
        cat = [
            nn.relu(nn.Conv(256, (1, 1), name="squeeze")(f))
            for f in last_features
        ]
        out = jnp.concatenate(cat, axis=-1)
        for i in range(3):
            k = (3, 3) if i != 2 else (1, 1)
            pad = ((1, 1), (1, 1)) if i != 2 else ((0, 0), (0, 0))
            feat = (
                256 if i != 2 else 6 * self.num_frames_to_predict_for
            )
            out = nn.Conv(feat, k, padding=pad, name=f"pose_{i}")(out)
            if i != 2:
                out = nn.relu(out)
        out = jnp.mean(out, axis=(1, 2))  # global average over H, W
        out = 0.01 * out.reshape(-1, self.num_frames_to_predict_for, 1, 6)
        return out[..., :3], out[..., 3:]
