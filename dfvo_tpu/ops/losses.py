"""Self-supervised losses for online finetuning.

Rebuilds of the reference loss stack used by online adaptation:
SSIM (depth/monodepth2/layers.py:369-399), edge-aware smoothness
(layers.py:353-366), the 0.85·SSIM + 0.15·L1 reprojection loss
(deep_flow.py:346-355 / deep_depth.py), all in NHWC.
"""

import jax.numpy as jnp


def _avg_pool3x3(x):
    """3x3 mean pool, stride 1, on reflect-padded input (torch
    AvgPool2d(3,1) after ReflectionPad2d(1))."""
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    out = jnp.zeros_like(x)
    for dy in range(3):
        for dx in range(3):
            out = out + xp[:, dy : dy + x.shape[1], dx : dx + x.shape[2], :]
    return out / 9.0


def ssim(x, y):
    """Structural-dissimilarity map clamp((1 - SSIM)/2, 0, 1)
    (ref layers.py:369-399).

    Args:
        x, y: [N x H x W x C] images in [0, 1].

    Returns:
        [N x H x W x C] dissimilarity.
    """
    c1 = 0.01**2
    c2 = 0.03**2
    mu_x = _avg_pool3x3(x)
    mu_y = _avg_pool3x3(y)
    sigma_x = _avg_pool3x3(x**2) - mu_x**2
    sigma_y = _avg_pool3x3(y**2) - mu_y**2
    sigma_xy = _avg_pool3x3(x * y) - mu_x * mu_y
    ssim_n = (2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)
    ssim_d = (mu_x**2 + mu_y**2 + c1) * (sigma_x + sigma_y + c2)
    return jnp.clip((1 - ssim_n / ssim_d) / 2, 0.0, 1.0)


def reprojection_loss(pred, target):
    """Per-pixel photometric loss 0.85·SSIM + 0.15·L1, channel-averaged
    (ref deep_flow.py:346-355).

    Returns:
        [N x H x W x 1].
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    s = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return 0.85 * s + 0.15 * l1


def smooth_loss(value, img):
    """Edge-aware first-order smoothness (ref layers.py:353-366).

    Args:
        value: [N x H x W x C] map to smooth (disparity or flow magnitude).
        img: [N x H x W x 3] color image providing edges.

    Returns:
        scalar loss.
    """
    grad_x = jnp.abs(value[:, :, :-1, :] - value[:, :, 1:, :])
    grad_y = jnp.abs(value[:, :-1, :, :] - value[:, 1:, :, :])
    img_gx = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True
    )
    img_gy = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True
    )
    grad_x = grad_x * jnp.exp(-img_gx)
    grad_y = grad_y * jnp.exp(-img_gy)
    return jnp.mean(grad_x) + jnp.mean(grad_y)
