"""Capture a real device profile of the scan-mode VO step on the TPU.

Round-1 performance work was driven entirely by delta-workload host timings
(CLAUDE.md); this tool captures an actual ``jax.profiler`` trace of the
fused chunk step (the exact program ``bench.py`` times) and summarizes
per-op device time from the xplane protobuf via tensorboard_plugin_profile.

Usage:
    python tools/profile_tpu.py [--outdir /tmp/jax_trace] [--chunk N]

Prints a table of the top device ops by total self time, aggregated by
op category, to stdout, and leaves the raw trace directory for TensorBoard.
"""

import argparse
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def summarize_xplane(outdir, top=30):
    """Parse the captured .xplane.pb directly (the tensorboard profile
    plugin's converter is incompatible with this env's TF build — parse the
    XSpace proto ourselves) and print per-op device-time aggregates.

    Requires PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python (the installed
    _pb2 modules are older-gencode; pure-python parsing accepts them).
    """
    os.environ.setdefault("PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION", "python")
    paths = glob.glob(
        os.path.join(outdir, "**", "*.xplane.pb"), recursive=True
    )
    if not paths:
        return None
    path = sorted(paths)[-1]
    try:
        from tensorflow.tsl.profiler.protobuf import xplane_pb2
    except Exception as e:  # pragma: no cover
        print(f"[profile] xplane proto import failed: {e}")
        return None
    import collections

    space = xplane_pb2.XSpace()
    with open(path, "rb") as f:
        space.ParseFromString(f.read())
    report = []
    full = []
    for p in space.planes:
        if "TPU" not in p.name:
            continue
        md = p.event_metadata
        for line in p.lines:
            tot, cnt = collections.Counter(), collections.Counter()
            for ev in line.events:
                name = (
                    md[ev.metadata_id].name
                    if ev.metadata_id in md
                    else str(ev.metadata_id)
                )
                tot[name] += ev.duration_ps
                cnt[name] += 1
            if not tot:
                continue
            report.append(
                f"-- {p.name} line '{line.name}' events={sum(cnt.values())}"
                f" total={sum(tot.values())/1e9:.3f}ms"
            )
            for name, ps in tot.most_common(top):
                report.append(
                    f"   {ps/1e9:9.3f} ms  x{cnt[name]:5d}  {name[:110]}"
                )
            full.append((p.name, line.name, tot, cnt))
    text = "\n".join(report)
    print(text)
    with open(os.path.join(outdir, "op_summary.txt"), "w") as f:
        f.write(text)
    # complete per-op dump (the top-N table hides a long tail that can be
    # half the device time) for offline aggregation
    with open(os.path.join(outdir, "op_summary_full.txt"), "w") as f:
        for pname, lname, tot, cnt in full:
            f.write(f"== {pname} / {lname}\n")
            for name, ps in tot.most_common():
                f.write(f"{ps/1e9:12.4f} ms x{cnt[name]:6d}  {name}\n")
    return text


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/jax_trace")
    ap.add_argument("--chunk", type=int, default=0)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--e-path", action="store_true",
        help="profile the static E-success path (tpu.force_e_path)",
    )
    ap.add_argument(
        "--coherent", action="store_true",
        help="profile the bench headline program: coherent-motion synthetic "
        "sequence under the default config (the deferred-PnP cond skips "
        "dynamically instead of being compiled out)",
    )
    ap.add_argument(
        "--time-only", action="store_true",
        help="skip tracing; print delta-workload ms/frame of the chunk "
        "step (for quick A/B of op variants via DFVO_*_PALLAS env toggles)",
    )
    args = ap.parse_args()

    from dfvo_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from dfvo_tpu.pipeline.scan_runner import ScanRunner
    from dfvo_tpu.utils import ConfigLoader

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    cfg = ConfigLoader().merge_cfg(
        [os.path.join(repo, "options/examples/default_configuration.yml")]
    )
    if args.chunk:
        cfg.tpu.scan_chunk = args.chunk
    if args.e_path:
        cfg.tpu.force_e_path = True
    h, w = cfg.image.height, cfg.image.width
    chunk = int(cfg.tpu.scan_chunk)

    runner = ScanRunner(cfg)
    variables = runner.frontend.prepare_variables(
        runner.frontend.init_variables(jax.random.PRNGKey(0))
    )
    K = np.array(
        [[0.58 * w, 0, 0.5 * w], [0, 1.92 * h, 0.5 * h], [0, 0, 1]], np.float32
    )
    Kj = jnp.asarray(K)
    Kij = jnp.asarray(np.linalg.inv(K).astype(np.float32))

    rng_np = np.random.RandomState(0)
    oracle = None
    if args.coherent:
        from dfvo_tpu.synth import (
            corrupt_flow,
            make_oracle_sequence,
            render_images,
            structured_flow_diff,
        )

        depths_o, flows_o, _ = make_oracle_sequence(
            h, w, K, chunk + 1, seed=0
        )
        images = render_images(depths_o, flows_o, seed=0)
        rng_sf = np.random.RandomState(1)
        diffs, flows_c = [], []
        for fl in flows_o:
            d, bad = structured_flow_diff(rng_sf, h, w, n_bad=2)
            diffs.append(d)
            flows_c.append(corrupt_flow(fl, bad, rng_sf))
        frames = jnp.asarray(np.stack(images))
        depth0 = jnp.asarray(depths_o[0])
        oracle = {
            "depths": jnp.asarray(np.stack(depths_o[1:])),
            "flow_fwd": jnp.asarray(np.stack(flows_c)),
            "flow_diff": jnp.asarray(np.stack(diffs)),
        }
    else:
        frames = jnp.asarray(
            rng_np.randint(0, 255, (chunk + 1, h, w, 3), dtype=np.uint8)
        )
        depth0 = runner._init_depth(variables, frames[0])
    base = jax.random.PRNGKey(0)
    rngs = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(1, 1 + chunk)
    )
    carry = (
        frames[0],
        depth0,
        jnp.eye(4, dtype=jnp.float32),
        jnp.asarray(1.0, jnp.float32),
    )

    def step():
        poses, modes, c2 = runner._chunk_step(
            variables, frames[1:], carry, rngs, Kj, Kij, oracle=oracle
        )
        return float(jnp.sum(poses))  # dependent scalar = real device sync

    print("[profile] warmup (compile + handshake)...")
    step()
    step()

    if args.time_only:
        import time as _time

        def timed(k):
            t0 = _time.perf_counter()
            for _ in range(k):
                step()
            return _time.perf_counter() - t0

        k1, k2 = 2, 8
        t1 = min(timed(k1) for _ in range(3))
        t2 = min(timed(k2) for _ in range(3))
        ms_frame = (t2 - t1) / (k2 - k1) / chunk * 1e3
        toggles = {
            k: os.environ.get(k, "1")
            for k in ("DFVO_CORR_PALLAS", "DFVO_HEADCONV_PALLAS",
                      "DFVO_REGFILTER_PALLAS")
        }
        print(f"[time] {ms_frame:.3f} ms/frame  (chunk={chunk}, "
              f"coherent={args.coherent}) toggles={toggles}")
        return

    print(f"[profile] tracing {args.reps} chunk steps -> {args.outdir}")
    jax.profiler.start_trace(args.outdir)
    for _ in range(args.reps):
        step()
    jax.profiler.stop_trace()

    # parse in a subprocess: pure-python protobuf must be forced before
    # google.protobuf is first imported, and jax already pulled it in
    import subprocess

    env = dict(os.environ, PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION="python")
    code = (
        "import sys; sys.path.insert(0, %r); "
        "from tools.profile_tpu import summarize_xplane; "
        "summarize_xplane(%r)"
        % (os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
           args.outdir)
    )
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True
    )
    print(r.stdout)
    if r.returncode != 0:
        print("[profile] summarize failed:", r.stderr[-2000:])
    else:
        print(f"[profile] summary at {args.outdir}/op_summary.txt")


if __name__ == "__main__":
    main()
