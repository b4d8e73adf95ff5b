"""gen-data: preprocess raw scans into projected channel images.

Equivalent of reference demo/demo1_gen_data.py:50-77 (batch drivers in
src/utils/gen_*_data.py), driven either by a demo.yml-style config
(``Demo1`` block) or by explicit flags.

Usage:
  python -m overlapnet_tpu.cli gen-data <demo.yml>
  python -m overlapnet_tpu.cli gen-data --scan-folder S --dst-folder D
      [--semantic-folder P] [--normalize-depth]
"""

from __future__ import annotations

import argparse

import yaml

from overlapnet_tpu.geometry.gen_data import (
    gen_depth_data,
    gen_intensity_data,
    gen_normal_data,
    gen_semantic_data,
)


def main(argv: list[str]) -> int:
    ap = argparse.ArgumentParser(prog="gen-data", description=__doc__)
    ap.add_argument("config", nargs="?", help="demo.yml with a Demo1 block")
    ap.add_argument("--scan-folder")
    ap.add_argument("--dst-folder")
    ap.add_argument("--semantic-folder", default="")
    ap.add_argument("--normalize-depth", action="store_true")
    args = ap.parse_args(argv)

    scan_folder, dst_folder, semantic_folder = (
        args.scan_folder, args.dst_folder, args.semantic_folder
    )
    if args.config:
        with open(args.config) as f:
            demo1 = (yaml.safe_load(f) or {}).get("Demo1", {})
        scan_folder = scan_folder or demo1.get("scan_folder")
        dst_folder = dst_folder or demo1.get("dst_folder")
        semantic_folder = semantic_folder or demo1.get("semantic_folder", "")
    if not scan_folder or not dst_folder:
        ap.error("need --scan-folder and --dst-folder (or a config file)")

    depth = gen_depth_data(scan_folder, dst_folder, normalize=args.normalize_depth)
    print(f"depth: {len(depth)} images")
    normal = gen_normal_data(scan_folder, dst_folder)
    print(f"normal: {len(normal)} images")
    intensity = gen_intensity_data(scan_folder, dst_folder)
    print(f"intensity: {len(intensity)} images")
    import os

    if semantic_folder and os.path.isdir(semantic_folder):
        semantic = gen_semantic_data(semantic_folder, scan_folder, dst_folder)
        print(f"semantic: {len(semantic)} images")
    return 0
