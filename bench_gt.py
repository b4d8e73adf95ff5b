"""GT-generation throughput at KITTI scale (~1000 frames, full N x N).

The reference computes ground-truth overlap/yaw with a per-frame Python loop
over per-pair numpy projections (reference src/utils/com_overlap_yaw.py:35-55
driven by demo/demo4_gen_gt_files.py:42-114) — one query frame vs a sequence
takes it minutes on CPU. Our engine (geometry/overlap.py:com_overlap_yaw_all)
keeps the whole sequence resident on device and streams asynchronously
dispatched vmapped pair chunks, so the full N x N table is feasible.

This harness proves it at scale: it renders an ``--frames``-frame synthetic
KITTI-layout sequence (sim/world.py — used when real KITTI data is absent,
same scan sizes: ~130k points/scan), then times the full all-pairs GT
computation end-to-end on the real device and writes one JSON line per
phase plus a summary to stdout.

Run (committed artifact GT_TIMING_r03.json):
  python bench_gt.py --frames 1000 --out GT_TIMING_r03.json
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=1000)
    ap.add_argument("--work-dir", default="/tmp/overlapnet_gt_bench")
    ap.add_argument("--chunk-size", type=int, default=1024)
    ap.add_argument("--side", type=float, default=150.0,
                    help="trajectory square side [m]; 150 makes a ~600 m/lap "
                         "path like KITTI 07, so the far-pair gate engages")
    ap.add_argument("--laps", type=float, default=3.0)
    ap.add_argument("--max-points", type=int, default=130_000)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax

    from overlapnet_tpu.geometry import kitti
    from overlapnet_tpu.geometry.overlap import (
        com_overlap_yaw_all,
        load_scans_padded,
    )
    from overlapnet_tpu.sim.world import (
        loop_trajectory,
        make_world,
        write_kitti_sequence,
    )

    # cache key covers every parameter that shapes the rendered sequence —
    # a --laps/--max-points change must not silently reuse stale scans
    # (ADVICE r3)
    seq_dir = os.path.join(
        args.work_dir,
        f"seq_{args.frames}_{int(args.side)}_{args.laps:g}_{args.max_points}",
    )
    poses_file = os.path.join(seq_dir, "poses.txt")
    t0 = time.perf_counter()
    if not os.path.exists(poses_file):
        rng = np.random.default_rng(0)
        extent = args.side / 2.0 + 60.0
        world = make_world(rng, extent=extent,
                           n_walls=int(60 * extent / 90),
                           n_cylinders=int(80 * extent / 90))
        poses = loop_trajectory(args.frames, side=args.side, laps=args.laps)
        write_kitti_sequence(seq_dir, world, poses, max_points=args.max_points)
    t_render = time.perf_counter() - t0

    scan_paths = kitti.load_files(os.path.join(seq_dir, "velodyne"))
    T_cam_velo = kitti.load_calib(os.path.join(seq_dir, "calib.txt"))
    poses = kitti.poses_cam_to_velo(kitti.load_poses(poses_file), T_cam_velo)
    n = len(scan_paths)

    t0 = time.perf_counter()
    points = load_scans_padded(scan_paths, args.max_points)
    t_io = time.perf_counter() - t0

    t0 = time.perf_counter()
    gt = com_overlap_yaw_all(
        scan_paths, poses,
        chunk_size=args.chunk_size,
        max_points=args.max_points,
        points=points,
    )
    t_gt = time.perf_counter() - t0

    n_pairs = len(gt)
    # gated fraction (reporting only): pairs whose sensor separation alone
    # already guarantees zero overlap (see overlap.py far-pair gate)
    centers = poses[:, :3, 3]
    d = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    gated_frac = float(np.mean(d > 50.0 + 51.0))
    result = {
        "metric": "gt_all_pairs",
        "frames": n,
        "pairs": n_pairs,
        "points_per_scan": args.max_points,
        "chunk_size": args.chunk_size,
        "render_s": round(t_render, 1),
        "scan_io_s": round(t_io, 1),
        "gt_compute_s": round(t_gt, 1),
        "approx_gated_fraction": round(gated_frac, 3),
        "pairs_per_sec": round(n_pairs / t_gt, 1),
        "frames_per_sec": round(n / t_gt, 2),
        "overlap_mean": round(float(gt[:, 2].mean()), 4),
        "overlap_max": round(float(gt[:, 2].max()), 4),
        "device": str(jax.devices()[0].device_kind),
        "note": (
            "gt_compute_s covers transfer + all N*N pair chunks + single "
            "fetch; reference com_overlap_yaw.py is a per-pair host loop "
            "(one query row took minutes at this scale)"
        ),
    }
    line = json.dumps(result)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
