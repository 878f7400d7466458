"""TUM RGB-D toolkit: timestamp association and ATE evaluation.

Rebuild of the reference's vendored TUM tools
(tools/evaluation/tum_tool/associate.py:49-128 and
pose_evaluation_utils.py ATE/Horn alignment), used by the TUM/Kinect
dataset loaders and the TUM evaluation path.
"""

import numpy as np


def read_file_list(filename):
    """Read a TUM-format file into {timestamp: [data...]}; '#' lines are
    comments (ref associate.py:49-71)."""
    out = {}
    with open(filename, "r") as f:
        for line in f.read().replace(",", " ").replace("\t", " ").split("\n"):
            parts = [v.strip() for v in line.split(" ") if v.strip() != ""]
            if not parts or parts[0].startswith("#"):
                continue
            out[float(parts[0])] = parts[1:]
    return out


def associate(first_list, second_list, offset=0.0, max_difference=0.02):
    """Greedy closest-timestamp association (ref associate.py:74-128).

    Returns:
        sorted list of (t_first, t_second) matches.
    """
    first_keys = set(first_list.keys())
    second_keys = set(second_list.keys())
    potential = [
        (abs(a - (b + offset)), a, b)
        for a in first_keys
        for b in second_keys
        if abs(a - (b + offset)) < max_difference
    ]
    potential.sort()
    matches = []
    for _, a, b in potential:
        if a in first_keys and b in second_keys:
            first_keys.remove(a)
            second_keys.remove(b)
            matches.append((a, b))
    matches.sort()
    return matches


def align_horn(model, data):
    """Horn's closed-form SE(3) alignment of [3 x N] point sets: finds
    (R, t) minimizing ||R·model + t - data|| (ref
    pose_evaluation_utils.py align())."""
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_zc = model - model_mean
    data_zc = data - data_mean
    W = np.zeros((3, 3))
    for i in range(model.shape[1]):
        W += np.outer(model_zc[:, i], data_zc[:, i])
    U, d, Vh = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vh) < 0:
        S[2, 2] = -1
    R = U @ S @ Vh
    t = data_mean - R @ model_mean
    err = R @ model + t - data
    rmse = np.sqrt(np.sum(err * err) / model.shape[1])
    return R, t, rmse


def compute_ate(gt_traj, pred_traj):
    """ATE RMSE after Horn alignment.

    Args:
        gt_traj, pred_traj: {timestamp: [4x4]} with matching keys (or
        pred keys a subset of gt keys).

    Returns:
        (rmse, aligned_pred {timestamp: [4x4]}).
    """
    keys = sorted(set(gt_traj) & set(pred_traj))
    gt_xyz = np.array([gt_traj[k][:3, 3] for k in keys]).T
    pred_xyz = np.array([pred_traj[k][:3, 3] for k in keys]).T
    R, t, rmse = align_horn(pred_xyz, gt_xyz)
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t[:, 0]
    aligned = {k: T @ pred_traj[k] for k in keys}
    return rmse, aligned
