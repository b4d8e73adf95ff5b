"""Online loop-closure-detection latency: the per-frame serving hot loop.

Runs the full OnlineLoopCloser over a simulated KITTI-layout sequence on the
real device — per frame: load preprocessed channel images, leg embedding,
covariance-ellipse + inactive-map gating, descriptor-DB query (device-side
top-1 when a mesh is used), accept/reject — and reports frames/s with
p50/p95 per-frame latency. This is the end-to-end number the sharded
descriptor DB exists for (reference demo3_lcd.py:85-123 is the loop being
replaced; the reference publishes no numbers for it).

Usage:
  python bench_lcd.py --work-dir /tmp/lcd_bench --frames 1000 [--no-mesh]
Prints one JSON line -> commit as LCD_TIMING_r{N}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--no-mesh", action="store_true",
                    help="single-device DescriptorDB instead of the "
                    "mesh-sharded store")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    from overlapnet_tpu.core.jax_setup import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import numpy as np

    from overlapnet_tpu.geometry import kitti
    from overlapnet_tpu.lcd.infer import Infer
    from overlapnet_tpu.lcd.online import OnlineLoopCloser
    from overlapnet_tpu.parallel.mesh import make_mesh
    from overlapnet_tpu.sim.e2e import SEQ, generate_sequence, make_config

    files, poses = generate_sequence(args.work_dir, args.frames, seed=args.seed)
    cfg = make_config(args.work_dir)
    covs = kitti.load_covariances(files["covariance_file"])

    mesh = None if args.no_mesh else make_mesh(len(jax.devices()))
    infer = Infer(cfg, db_capacity=max(1024, args.frames), mesh=mesh)
    closer = OnlineLoopCloser(
        infer, poses, covariances=covs,
        inactive_time=min(100, args.frames // 4), inactive_dist=50.0,
    )

    # Frame 0 carries the first-compile warmup; timed separately so the
    # committed steady-state distribution is not polluted by it (VERDICT r4
    # weak #3). The run itself is pipelined (OnlineLoopCloser.run): gating
    # depends only on poses, so up to pipeline_depth fused frame steps are
    # in flight at once and the device round trip amortizes across frames.
    t0 = time.perf_counter()
    closer.step(0)
    warmup_ms = (time.perf_counter() - t0) * 1e3

    window = 50
    win_ms = []  # per-frame ms, averaged over each window
    t_run0 = time.perf_counter()
    start = 1
    while start < args.frames:
        end = min(args.frames, start + window)
        t = time.perf_counter()
        closer.run(end)
        win_ms.append((time.perf_counter() - t) * 1e3 / (end - start))
        if (end // window) % 4 == 0:
            print(f"# frame {end}: {win_ms[-1]:.1f} ms/frame (window avg)",
                  file=sys.stderr, flush=True)
        start = end
    total = time.perf_counter() - t_run0

    win_ms = np.asarray(win_ms)
    result = {
        "metric": "lcd_frames_per_sec",
        "value": round((args.frames - 1) / total, 2),
        "unit": "frames/s",
        "frames": args.frames,
        # per-frame ms percentiles over 50-frame pipelined windows; the max
        # window contains the largest query-bucket recompile
        "p50_ms": round(float(np.percentile(win_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(win_ms, 95)), 2),
        "max_window_ms": round(float(win_ms.max()), 2),
        "warmup_ms": round(warmup_ms, 1),
        "window_frames": window,
        "closures": len(closer.closures),
        "db_rows": len(infer.feature_volumes),
        "mesh_devices": 0 if mesh is None else int(
            np.prod(list(mesh.shape.values()))
        ),
        "device": str(jax.devices()[0]),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
