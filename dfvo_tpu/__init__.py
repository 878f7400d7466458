"""dfvo_tpu — a TPU-native (JAX/XLA/Pallas) visual-odometry framework.

A from-scratch rebuild of the capabilities of DF-VO (Huangying-Zhan/DF-VO,
ICRA 2020 / arXiv 2103.00933): monocular frame-to-frame visual odometry that
fuses a single-view depth CNN (Monodepth2) and a two-view optical-flow CNN
(LiteFlowNet) with multi-view geometry (essential-matrix RANSAC, PnP,
triangulation-based scale recovery).

Unlike the reference (single-GPU PyTorch + OpenCV host round trips), the whole
frame-to-frame tracker here runs on-device: the networks are Flax modules with
the correlation cost volume as a Pallas TPU kernel, and the geometric solvers
are batched `jax.vmap` RANSAC kernels. Multi-sequence tracking shards one
sequence per TPU core via `jax.shard_map`.

Layout (mirrors reference layers, see SURVEY.md §1):
    utils/       config loader, timers, host IO        (ref: libs/general/)
    geometry/    SE3 / intrinsics / camera ops         (ref: libs/geometry/)
    solvers/     batched RANSAC solvers                (ref: cv2 calls)
    ops/         Pallas + XLA kernels (correlation, warps, losses)
    models/      Flax networks + torch weight converters (ref: libs/deep_models/)
    matching/    keypoint selection                    (ref: libs/matching/)
    tracker/     E-tracker / PnP-tracker               (ref: libs/tracker/)
    datasets/    dataset loaders                       (ref: libs/datasets/)
    pipeline/    DFVO orchestration + visualization    (ref: libs/dfvo.py)
    parallel/    multi-sequence sharding (new capability)
    evaluation/  KITTI odometry / TUM eval harness     (ref: tools/evaluation/)
    flowlib/     optical-flow IO + color coding        (ref: libs/flowlib/)
"""

__version__ = "0.1.0"
