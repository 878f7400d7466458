"""Monodepth2 depth and pose networks (encoder + decoder wrappers).

Rebuilds the reference interfaces
libs/deep_models/depth/monodepth2/monodepth2.py:22-139 (depth) and
libs/deep_models/pose/monodepth2/monodepth2.py:24-119 (pose), including
disp→depth conversion and the x5.4 KITTI stereo-baseline multiplier.
"""

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..geometry.lie import transformation_from_parameters
from .depth_decoder import DepthDecoder
from .layers import resize_bilinear
from .pose_decoder import PoseDecoder
from .resnet_encoder import ResnetEncoder


def disp_to_depth(disp, min_depth, max_depth):
    """Sigmoid disparity -> (scaled_disp, depth)
    (ref depth/monodepth2/layers.py:16-25)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    return scaled_disp, 1.0 / scaled_disp


class Monodepth2Depth(nn.Module):
    """Single-view depth: ResNet-18 encoder → skip-connected decoder →
    sigmoid disparity at 4 scales → metric depth.

    Args (module attributes):
        min_depth/max_depth: disparity range (kitti: 0.1/100,
            ref monodepth2.py:74-89).
        baseline_multiplier: x5.4 for KITTI stereo-trained models
            (monodepth2 assumes a 0.1-unit baseline, ref monodepth2.py:138).
    """

    min_depth: float = 0.1
    max_depth: float = 100.0
    baseline_multiplier: float = 5.4
    scales: Sequence[int] = (0, 1, 2, 3)

    @nn.compact
    def __call__(self, img):
        """img: [N x H x W x 3] in [0, 1].

        Returns:
            dict with ``depth`` [N x H x W] metric depth (scale 0, resized to
            input size, x baseline multiplier) and ``disps`` {scale: raw
            sigmoid disparity} for finetuning losses.
        """
        feats = ResnetEncoder(18, name="encoder")(img)
        disps = DepthDecoder(scales=tuple(self.scales), name="decoder")(feats)
        n, h, w, _ = img.shape
        disp0 = resize_bilinear(disps[0], h, w, align_corners=False)
        scaled_disp, depth = disp_to_depth(disp0, self.min_depth, self.max_depth)
        return {
            "depth": depth[..., 0] * self.baseline_multiplier,
            "disp": scaled_disp[..., 0],
            "disps": disps,
        }


class Monodepth2Pose(nn.Module):
    """Two-view pose CNN: ResNet-18 (6-channel input) → pose decoder →
    SE(3) transform (relative pose from image 2 to image 1, inverted
    composition as in ref pose/monodepth2/monodepth2.py:86-99).
    """

    baseline_multiplier: float = 5.4

    @nn.compact
    def __call__(self, img_pair):
        """img_pair: [N x H x W x 6] two stacked RGB frames in [0, 1].

        Returns:
            [N x 4 x 4] relative pose, translation scaled by the baseline
            multiplier.
        """
        feats = ResnetEncoder(18, num_input_images=2, name="encoder")(img_pair)
        axisangle, translation = PoseDecoder(
            num_input_features=1, num_frames_to_predict_for=2, name="decoder"
        )([feats[-1]])
        T = transformation_from_parameters(
            axisangle[:, 0, 0], translation[:, 0, 0], invert=True
        )
        T = T.at[:, :3, 3].multiply(self.baseline_multiplier)
        return T
