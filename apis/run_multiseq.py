"""Batched multi-sequence VO: track several sequences in parallel, one (or
more) per TPU core.

The new distributed capability over the reference (which is single-process,
single-GPU; SURVEY.md §2.12): network weights are replicated across a 1-D
``seq`` mesh, the frame batch is sharded, and the VO path needs no
collectives at all.

    python apis/run_multiseq.py -d options/examples/default_configuration.yml \
        [-c custom.yml] --seqs 00 01 02 ... [--max_frames N]

Writes one KITTI-format trajectory per sequence into
``<result_dir>/<seq>.txt``, scoreable by tools/evaluation/odometry/eval_odom.py.
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dfvo_tpu.utils import ConfigLoader  # noqa: E402
from dfvo_tpu.utils.cache import enable_compilation_cache  # noqa: E402
from dfvo_tpu.utils.io import mkdir_if_not_exists, save_traj  # noqa: E402


def main():
    parser = argparse.ArgumentParser(description="DF-VO multi-sequence (TPU)")
    parser.add_argument("-d", "--default_configuration", type=str,
                        default="options/examples/default_configuration.yml")
    parser.add_argument("-c", "--configuration", type=str, default=None)
    parser.add_argument("--seqs", nargs="+", required=True)
    parser.add_argument("--max_frames", type=int, default=None)
    args = parser.parse_args()

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    from dfvo_tpu.datasets import datasets as dataset_registry
    from dfvo_tpu.parallel import MultiSeqRunner

    loader = ConfigLoader()
    cfg = loader.merge_cfg([args.default_configuration, args.configuration])

    # pad the sequence batch to the device count
    n_dev = len(jax.devices())
    seqs = list(args.seqs)
    S = ((len(seqs) + n_dev - 1) // n_dev) * n_dev
    pad_seqs = seqs + [seqs[-1]] * (S - len(seqs))

    datasets, loaders = [], []
    from dfvo_tpu.utils.native_loader import make_prefetcher

    for s in pad_seqs:
        scfg = cfg.copy()
        scfg.seq = str(s)
        ds = dataset_registry[scfg.dataset](scfg)
        datasets.append(ds)
    n_frames = min(len(d) for d in datasets)
    if args.max_frames:
        n_frames = min(n_frames, args.max_frames)
    for ds in datasets:
        paths = [
            ds.get_image_path(ds.get_timestamp(i)) for i in range(n_frames)
        ]
        loaders.append(
            make_prefetcher(paths, cfg.image.height, cfg.image.width)
        )

    runner = MultiSeqRunner(cfg)
    variables = runner.frontend.prepare_variables(
        runner.frontend.load_variables(jax.random.PRNGKey(cfg.seed))
    )

    # per-sequence intrinsics, sharded with the batch
    Kj = jnp.asarray(
        np.stack([d.cam_intrinsics.mat for d in datasets]), jnp.float32
    )
    Kij = jnp.asarray(
        np.stack([d.cam_intrinsics.inv_mat for d in datasets]), jnp.float32
    )

    @jax.jit
    def depth_batch(variables, imgs_u8):
        imgs = imgs_u8.astype(jnp.float32) / 255.0
        return runner.frontend.depth_net.apply(
            variables["depth"], imgs
        )["depth"]

    def next_batch():
        return np.stack([ld.next()[1] for ld in loaders])

    img_ref = jnp.asarray(next_batch())
    depth_ref = depth_batch(variables, img_ref)
    prev = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), (S, 4, 4))

    globals_np = [np.eye(4) for _ in range(S)]
    trajs = [{0: np.eye(4)} for _ in range(S)]

    from tqdm import tqdm

    base = jax.random.PRNGKey(cfg.seed)
    execution = str(cfg.tpu.get("execution", "frame"))
    if execution == "scan":
        # chunked on-device frame loop per sequence (same program as the
        # single-sequence tpu.execution: scan path, shard_mapped over seq)
        chunk_step = runner.make_chunk_step()
        T = int(cfg.tpu.scan_chunk)
        h, w = cfg.image.height, cfg.image.width
        carry = (
            img_ref,
            depth_ref,
            prev,
            jnp.ones((S,), jnp.float32),
        )
        pbar = tqdm(total=n_frames)
        pbar.update(1)
        for start in range(1, n_frames, T):
            ids = list(range(start, min(start + T, n_frames)))
            imgs = np.empty((S, T, h, w, 3), np.uint8)
            for j, _ in enumerate(ids):
                frame = next_batch()  # [S x H x W x 3]
                imgs[:, j] = frame
            for j in range(len(ids), T):  # static chunk shape
                imgs[:, j] = imgs[:, len(ids) - 1]
            id_pad = ids + [ids[-1]] * (T - len(ids))
            rngs = jax.vmap(
                lambda i: jax.vmap(
                    lambda s: jax.random.fold_in(jax.random.fold_in(base, i), s)
                )(jnp.arange(S, dtype=jnp.uint32))
            )(jnp.asarray(id_pad)).swapaxes(0, 1)  # [S x T x 2]
            poses, modes, carry = chunk_step(
                variables, jnp.asarray(imgs), carry, rngs, Kj, Kij
            )
            rel = np.asarray(poses, np.float64)[:, : len(ids)]
            for s in range(S):
                for j, i in enumerate(ids):
                    globals_np[s] = globals_np[s] @ rel[s, j]
                    trajs[s][i] = globals_np[s].copy()
            pbar.update(len(ids))
        pbar.close()
    else:
        vo_step = runner.make_vo_step()
        for i in tqdm(range(1, n_frames)):
            img_cur = jnp.asarray(next_batch())
            rngs = jax.vmap(
                lambda k: jax.random.fold_in(base, k)
            )(jnp.arange(i * S, (i + 1) * S, dtype=jnp.uint32))
            poses, modes, depth_ref = vo_step(
                variables, img_cur, img_ref, depth_ref, prev, rngs, Kj, Kij
            )
            prev = poses
            img_ref = img_cur
            rel = np.asarray(poses, np.float64)
            for s in range(S):
                globals_np[s] = globals_np[s] @ rel[s]
                trajs[s][i] = globals_np[s].copy()

    result_dir = cfg.directory.result_dir
    mkdir_if_not_exists(result_dir)
    for s, name in enumerate(seqs):
        save_traj(
            os.path.join(result_dir, f"{name}.txt"), trajs[s], format="kitti"
        )
    print(f"saved {len(seqs)} trajectories to {result_dir}")


if __name__ == "__main__":
    main()
