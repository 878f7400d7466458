"""Checkpointing: orbax save/restore of network variables + optimizer state.

Rebuild of the reference checkpoint machinery: finetuned-model saving
(deep_models.py:340-350) and the epoch/step CheckpointLogger with
best-model tracking (libs/deep_models/checkpoint_logger.py:15-96), on
orbax instead of torch.save.
"""

import os
import shutil

import orbax.checkpoint as ocp


def save_variables(path, variables, opt_state=None, train_state=None):
    """Save a variables pytree (+ optional optimizer/train state) to
    ``path`` (an orbax checkpoint directory)."""
    path = os.path.abspath(path)
    payload = {"variables": variables}
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if train_state is not None:
        payload["train_state"] = train_state
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        shutil.rmtree(path)
    ckptr.save(path, payload)
    ckptr.wait_until_finished()
    return path


def restore_variables(path, template=None):
    """Restore a payload saved by :func:`save_variables`.

    ``template`` must mirror the SAVED payload structure — i.e.
    ``{"variables": ..., ["opt_state": ...]}`` — to restore with correct
    shardings/dtypes.
    """
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        return ckptr.restore(path, template)
    return ckptr.restore(path)


class CheckpointLogger:
    """Epoch/step checkpoint manager with best-model copy
    (ref checkpoint_logger.py:25-96)."""

    def __init__(self, ckpt_dir, keep_n=5):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self.manager = ocp.CheckpointManager(
            self.ckpt_dir,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep_n, create=True
            ),
        )
        self.best_metric = None

    def save(self, step, variables, opt_state=None, train_state=None, metric=None):
        """Save at ``step``; if ``metric`` improves (lower is better), also
        snapshot to ``<ckpt_dir>/best``."""
        payload = {"variables": variables}
        if opt_state is not None:
            payload["opt_state"] = opt_state
        if train_state is not None:
            payload["train_state"] = train_state
        self.manager.save(step, args=ocp.args.StandardSave(payload))
        self.manager.wait_until_finished()
        if metric is not None and (
            self.best_metric is None or metric < self.best_metric
        ):
            self.best_metric = metric
            best_dir = os.path.join(self.ckpt_dir, "best")
            save_variables(best_dir, variables, opt_state, train_state)

    def restore_latest(self, template=None):
        step = self.manager.latest_step()
        if step is None:
            return None, None
        if template is not None:
            payload = self.manager.restore(
                step, args=ocp.args.StandardRestore(template)
            )
        else:
            payload = self.manager.restore(step)
        return step, payload
