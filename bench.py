"""Benchmark: steady-state DF-VO frames/sec/chip, batch (scan) mode.

Runs the full per-frame computation (Monodepth2 depth CNN + bidirectional
LiteFlowNet with the Pallas correlation kernel + keypoint selection +
batched essential/homography RANSAC + scale recovery + PnP fallback under
lax.cond) at the reference's default resolution (192x640,
default_configuration.yml) over synthetic frames.

Measurement uses the batch execution mode (pipeline/scan_runner.py): frames
are staged to HBM up front and the frame loop itself is a `lax.scan` on
device, exactly how long sequences are processed for throughput. Timing
wraps a single blocking device call; only the final [T x 4 x 4] poses
return to the host.

Two numbers are reported (VERDICT r1 item 6):
* ``value`` — the REALISTIC path: E-tracker-success frames
  (tpu.force_e_path), which dominate real KITTI sequences. Random
  benchmark frames cannot make the data-dependent E-validity vote succeed,
  so the common path is benchmarked by statically dropping the PnP branch
  — every other op (kp selection, essential RANSAC + polish, GRIC,
  homography, scale recovery, pose chaining) still runs.
* ``worst_case_fps`` — the full hybrid step where the random frames force
  the PnP fallback conditional every single frame (real sequences hit it
  on a small minority of frames).

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

    from dfvo_tpu.pipeline.scan_runner import ScanRunner
    from dfvo_tpu.utils import ConfigLoader

    repo = os.path.dirname(os.path.abspath(__file__))
    cfg = ConfigLoader().merge_cfg(
        [os.path.join(repo, "options/examples/default_configuration.yml")]
    )
    if os.environ.get("BENCH_CHUNK"):
        cfg.tpu.scan_chunk = int(os.environ["BENCH_CHUNK"])
    h, w = cfg.image.height, cfg.image.width
    chunk = int(cfg.tpu.scan_chunk)

    K = np.array(
        [[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h], [0, 0, 1]], np.float32
    )
    Kj = jnp.asarray(K)
    Kij = jnp.asarray(np.linalg.inv(K).astype(np.float32))

    rng_np = np.random.RandomState(0)
    max_chunks = 12
    # stage all frames in HBM up front (one upload), as the async loader
    # pipeline does for real sequences
    frames_dev = jnp.asarray(
        rng_np.randint(
            0, 255, (max_chunks * chunk + 1, h, w, 3), dtype=np.uint8
        )
    )
    base = jax.random.PRNGKey(0)

    def measure(force_e_path):
        cfg.tpu.force_e_path = force_e_path
        runner = ScanRunner(cfg)
        variables = runner.frontend.prepare_variables(
            runner.frontend.init_variables(jax.random.PRNGKey(0))
        )
        depth0 = runner._init_depth(variables, frames_dev[0])

        def run_chunks(n_chunks):
            carry = (
                frames_dev[0],
                depth0,
                jnp.eye(4, dtype=jnp.float32),
                jnp.asarray(1.0, jnp.float32),
            )
            poses = None
            for c in range(n_chunks):
                start = 1 + c * chunk
                imgs = jax.lax.dynamic_slice_in_dim(
                    frames_dev, start, chunk, 0
                )
                rngs = jax.vmap(lambda i: jax.random.fold_in(base, i))(
                    jnp.arange(start, start + chunk)
                )
                poses, modes, carry = runner._chunk_step(
                    variables, imgs, carry, rngs, Kj, Kij
                )
            # scalar fetch = the only reliable device sync in this
            # environment (block_until_ready returns early through the
            # relay); the last chunk's poses depend on every prior chunk
            # via the carry
            return float(jnp.sum(poses))

        # warmup: compile + pay the relay's first-fetch handshake
        run_chunks(1)
        run_chunks(max_chunks)

        def timed(n_chunks):
            t0 = time.perf_counter()
            run_chunks(n_chunks)
            return time.perf_counter() - t0

        # delta-workload timing cancels fixed dispatch/sync overhead
        k1, k2 = 2, max_chunks
        t1 = min(timed(k1) for _ in range(3))
        t2 = min(timed(k2) for _ in range(3))
        return (k2 - k1) * chunk / max(t2 - t1, 1e-9)

    fps_worst = measure(force_e_path=False)
    fps_real = measure(force_e_path=True)

    print(
        json.dumps(
            {
                "metric": "kitti_vo_fps_per_chip_192x640_full_step_scan",
                "value": round(fps_real, 2),
                "unit": "frames/s",
                "vs_baseline": round(fps_real / 200.0, 3),
                "worst_case_fps": round(fps_worst, 2),
                "note": "value = realistic E-success path; worst_case = PnP fallback forced every frame by random inputs",
            }
        )
    )


if __name__ == "__main__":
    main()
