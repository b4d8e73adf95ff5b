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

    # warm the compile caches outside the timed loop (leg bucket-1 +
    # query buckets) so latencies reflect steady-state serving
    closer.step(0)
    t0 = time.perf_counter()
    lat = []
    for idx in range(1, args.frames):
        t = time.perf_counter()
        closer.step(idx)
        lat.append(time.perf_counter() - t)
        if idx % 100 == 0:
            print(f"# frame {idx}: {np.median(lat[-100:]) * 1e3:.1f} ms p50",
                  file=sys.stderr, flush=True)
    total = time.perf_counter() - t0

    lat_ms = np.asarray(lat) * 1e3
    result = {
        "metric": "lcd_frames_per_sec",
        "value": round((args.frames - 1) / total, 2),
        "unit": "frames/s",
        "frames": args.frames,
        "p50_ms": round(float(np.percentile(lat_ms, 50)), 2),
        "p95_ms": round(float(np.percentile(lat_ms, 95)), 2),
        "max_ms": round(float(lat_ms.max()), 2),
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
