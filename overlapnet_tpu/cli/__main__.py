"""CLI dispatcher.

Commands (reference counterparts in parentheses):

  gen-data   preprocess scans into channel images   (demo1_gen_data.py)
  infer      overlap+yaw for one scan pair          (demo2_infer.py)
  lcd        online loop-closure over a sequence    (demo3_lcd.py)
  gen-gt     ground-truth overlap/yaw generation    (demo4_gen_gt_files.py)
  train      train the model                        (src/two_heads/training.py)
  evaluate   evaluation harness                     (src/two_heads/testing.py)
  pack       build per-sequence image packs         (no reference counterpart)
  sim        generate a synthetic KITTI sequence    (no reference counterpart)
"""

from __future__ import annotations

import sys


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv or argv[0] in ("-h", "--help"):
        print(__doc__)
        return 0
    cmd, rest = argv[0], argv[1:]
    from overlapnet_tpu.core.jax_setup import (
        enable_persistent_cache,
        maybe_initialize_distributed,
    )

    enable_persistent_cache()
    # multi-host bootstrap (no-op unless OVERLAPNET_COORDINATOR is set);
    # must run before any jax.devices() call so meshes span all hosts
    maybe_initialize_distributed()
    if cmd == "gen-data":
        from overlapnet_tpu.cli.gen_data import main as run
    elif cmd == "infer":
        from overlapnet_tpu.cli.infer_pair import main as run
    elif cmd == "lcd":
        from overlapnet_tpu.cli.lcd import main as run
    elif cmd == "gen-gt":
        from overlapnet_tpu.cli.gen_gt import main as run
    elif cmd == "train":
        from overlapnet_tpu.cli.train import main as run
    elif cmd == "evaluate":
        from overlapnet_tpu.cli.evaluate import main as run
    elif cmd == "pack":
        from overlapnet_tpu.cli.pack import main as run
    elif cmd == "sim":
        from overlapnet_tpu.cli.sim import main as run
    else:
        print(f"Unknown command: {cmd}\n{__doc__}")
        return 2
    return run(rest) or 0


if __name__ == "__main__":
    sys.exit(main())
