"""HD3 training losses (NHWC).

Rebuild of libs/deep_models/flow/hd3/hd3losses.py:7-50: per-level KL
divergence between the predicted motion distributions and bilinear
densities of the (residual) ground-truth motion, plus the end-point-error
metric. Unused at inference in the reference too; provided for training/
finetuning parity of the HD3 family.
"""

import jax
import jax.numpy as jnp

from .hd3_ops import disp2flow, resize_dense_vector, vector2density
from .layers import resize_bilinear


def downsample_flow(flo, scale_factor):
    """Bilinear flow downsample WITHOUT magnitude rescaling
    (ref hd3_ops.py:105-125, dense branch). Returns (flow, valid_mask)."""
    n, h, w, c = flo.shape
    nh, nw = int(h * scale_factor), int(w * scale_factor)
    out = resize_bilinear(flo, nh, nw, align_corners=True)
    return out, jnp.ones((n, nh, nw, 1), flo.dtype)


def hd3_loss(ms_prob, ms_pred, gt, corr_range, task="flow", ds=6):
    """Multi-level KL-divergence objective (ref hd3losses.py:15-38).

    Args:
        ms_prob: per-level [N x h x w x classes] logits from HD3Net.
        ms_pred: per-level [N x h x w x dim] motion vectors (full-res units).
        gt: [N x H x W x 2] ground-truth flow (full resolution).
        corr_range: per-level support radii (static).
        task: 'flow' | 'stereo'.
        ds: downsample ratio of the coarsest level.

    Returns:
        scalar loss.
    """
    dim = 1 if task == "stereo" else 2
    n, H, W, _ = gt.shape
    total = 0.0
    for l, prob in enumerate(ms_prob):
        scaled_gt, valid = downsample_flow(gt, 1.0 / 2 ** (ds - l))
        if task == "stereo":
            scaled_gt = scaled_gt[..., 0:1]
        if l > 0:
            h, w = scaled_gt.shape[1], scaled_gt.shape[2]
            up_prev = 2.0 * resize_bilinear(
                ms_pred[l - 1] / 2 ** (ds - (l - 1)), h, w, align_corners=True
            )
            scaled_gt = scaled_gt / 2 ** (ds - l) - up_prev
        else:
            scaled_gt = scaled_gt / 2 ** (ds - l)
        gt_dist = vector2density(scaled_gt, corr_range[l], dim) * valid
        gt_dist = jax.lax.stop_gradient(gt_dist)
        log_pred = jax.nn.log_softmax(prob, axis=-1)
        # KLDivLoss(batchmean): sum(target * (log(target) - log_pred)) / N
        safe_t = jnp.where(gt_dist > 0, gt_dist, 1.0)
        kld = jnp.sum(gt_dist * (jnp.log(safe_t) - log_pred)) / n
        total = total + 4 ** (ds - l) / (H * W) * kld
    return total


def end_point_error(output, gt, gt_mask=None):
    """Masked mean EPE at ground-truth resolution (ref hd3losses.py:41-56).

    Args:
        output: [N x h x w x (1|2)] prediction (stereo or flow).
        gt: [N x H x W x 2] ground truth.
        gt_mask: optional [N x H x W] validity.
    """
    if output.shape[-1] == 1:
        output = disp2flow(output)
    out = resize_dense_vector(output, gt.shape[1], gt.shape[2])
    err = jnp.linalg.norm(out - gt, axis=-1)
    if gt_mask is None:
        return jnp.mean(err)
    m = gt_mask.astype(err.dtype)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)
