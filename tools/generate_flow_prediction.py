"""Export LiteFlowNet flow predictions in KITTI Flow 2012/2015 format.

Rebuild of the reference tool (tools/generate_flow_prediction.py:1-184):
run the flow network over image pairs, optionally mask flows failing the
forward-backward consistency check, write 16-bit KITTI flow PNGs.

    python tools/generate_flow_prediction.py \
        --dataset kitti2015 --data_dir DATA --result RESULT \
        [--flow_mask_thre 0.1] [--model weights.pytorch]
"""

import argparse
import os
import sys
from glob import glob

import numpy as np
from tqdm import tqdm

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    parser = argparse.ArgumentParser(description="flow prediction export")
    parser.add_argument(
        "--dataset", choices=["kitti2012", "kitti2015"], default="kitti2015"
    )
    parser.add_argument("--data_dir", required=True)
    parser.add_argument("--result", required=True)
    parser.add_argument("--model", default=None, help="torch .pytorch weights")
    parser.add_argument(
        "--flow_mask_thre",
        type=float,
        default=None,
        help="forward-backward consistency threshold; invalid flows get 0",
    )
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from dfvo_tpu.flowlib import write_kitti_png_flow
    from dfvo_tpu.models import LiteFlowNet
    from dfvo_tpu.pipeline.frontend import (
        forward_backward_consistency,
        resize_dense_flow,
    )

    os.makedirs(args.result, exist_ok=True)

    net = LiteFlowNet()
    img_paths = sorted(glob(os.path.join(args.data_dir, "*_10.png")))

    # initialize with converted weights (or random if none provided)
    sample = cv2.imread(img_paths[0])
    h, w = sample.shape[:2]
    th = (h // 32 + (h % 32 > 0)) * 32
    tw = (w // 32 + (w % 32 > 0)) * 32
    dummy = jnp.zeros((1, th, tw, 3), jnp.float32)
    if args.model and os.path.isfile(args.model):
        from dfvo_tpu.models.convert import (
            convert_liteflownet,
            load_torch_state_dict,
        )

        variables = jax.tree.map(
            jnp.asarray, convert_liteflownet(load_torch_state_dict(args.model))
        )
        print(f"==> Initialize LiteFlowNet with [{args.model}]")
    else:
        variables = net.init(jax.random.PRNGKey(0), dummy, dummy)
        print("==> WARNING: random flow weights (no --model given)")

    @jax.jit
    def infer(variables, img1, img2):
        i1 = jnp.concatenate([img1, img2], axis=0)
        i2 = jnp.concatenate([img2, img1], axis=0)
        flows = net.apply(variables, i1, i2)
        full = resize_dense_flow(flows[1], h, w)
        fwd, bwd = full[0:1], full[1:2]
        diff = forward_backward_consistency(fwd, bwd)
        return fwd[0], diff[0]

    for p1 in tqdm(img_paths):
        p2 = p1.replace("_10.png", "_11.png")
        im1 = cv2.cvtColor(cv2.imread(p1), cv2.COLOR_BGR2RGB)
        im2 = cv2.cvtColor(cv2.imread(p2), cv2.COLOR_BGR2RGB)

        def prep(im):
            im = cv2.resize(im, (tw, th)).astype(np.float32) / 255.0
            return jnp.asarray(im)[None]

        flow, diff = infer(variables, prep(im1), prep(im2))
        flow = np.asarray(flow)
        mask = None
        if args.flow_mask_thre is not None:
            mask = np.asarray(diff) < args.flow_mask_thre
            flow = flow * mask[..., None]
        out = os.path.join(args.result, os.path.basename(p1))
        write_kitti_png_flow(flow, out, mask)


if __name__ == "__main__":
    main()
