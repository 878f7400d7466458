"""Benchmark: steady-state DF-VO frames/sec/chip on the fused device step.

Runs the full per-frame computation (Monodepth2 depth CNN + bidirectional
LiteFlowNet with the Pallas correlation kernel + keypoint selection +
batched essential/homography/PnP RANSAC + scale recovery) at the reference's
default resolution (192x640, default_configuration.yml) on synthetic
frames, and reports steady-state FPS including host->device image upload.

The reference publishes no throughput numbers (BASELINE.md); the driver's
target is >200 FPS/chip (BASELINE.json), so ``vs_baseline`` = fps / 200.

Prints ONE JSON line.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


def main():
    from dfvo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from dfvo_tpu.pipeline.frontend import DeepFrontend
    from dfvo_tpu.pipeline.tracking import TrackingConfig, tracking_step
    from dfvo_tpu.utils import ConfigLoader

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = ConfigLoader().merge_cfg(
        [os.path.join(repo, "options/examples/default_configuration.yml")]
    )
    h, w = cfg.image.height, cfg.image.width

    frontend = DeepFrontend(cfg)
    tcfg = TrackingConfig.from_cfg(cfg)
    variables = frontend.init_variables(jax.random.PRNGKey(0))
    K = np.array(
        [[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h], [0, 0, 1]], np.float32
    )
    Kj = jnp.asarray(K)
    Kij = jnp.asarray(np.linalg.inv(K).astype(np.float32))

    @jax.jit
    def vo_step(variables, img_cur_u8, img_ref_u8, depth_ref, prev, rng):
        img_cur = img_cur_u8.astype(jnp.float32) / 255.0
        img_ref = img_ref_u8.astype(jnp.float32) / 255.0
        fo = frontend.infer(variables, img_cur, img_ref)
        tr = tracking_step(
            rng,
            fo["flow_fwd"],
            fo["flow_diff"],
            fo["depth_cur"],
            depth_ref,
            prev,
            Kj,
            Kij,
            tcfg,
        )
        return tr["pose"], tr["mode"], fo["depth_cur"]

    rng_np = np.random.RandomState(0)
    n_frames = 64
    frames = rng_np.randint(0, 255, (n_frames + 1, h, w, 3), dtype=np.uint8)
    depth_ref = jnp.asarray(rng_np.uniform(1, 40, (h, w)), jnp.float32)
    prev = jnp.eye(4, dtype=jnp.float32)

    # warmup / compile
    for i in range(3):
        pose, _, depth_ref = vo_step(
            variables,
            jnp.asarray(frames[i + 1]),
            jnp.asarray(frames[i]),
            depth_ref,
            prev,
            jax.random.PRNGKey(i),
        )
    pose.block_until_ready()

    t0 = time.perf_counter()
    for i in range(n_frames):
        pose, mode, depth_ref = vo_step(
            variables,
            jnp.asarray(frames[i + 1]),
            jnp.asarray(frames[i]),
            depth_ref,
            prev,
            jax.random.PRNGKey(i),
        )
    pose.block_until_ready()
    elapsed = time.perf_counter() - t0
    fps = n_frames / elapsed

    print(
        json.dumps(
            {
                "metric": "kitti_vo_fps_per_chip_192x640_full_step",
                "value": round(fps, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps / 200.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
