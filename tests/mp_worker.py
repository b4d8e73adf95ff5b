"""Multi-process worker for the 2-process distributed parity test.

Run as:  python tests/mp_worker.py <coordinator> <num_processes> <process_id> <out_json>

Each process exposes 2 virtual CPU devices, joins the jax.distributed
cluster via the same env-gated bootstrap the CLI uses
(core.jax_setup.maybe_initialize_distributed), builds a global 4-device
mesh, runs ONE DP train step on a fixed batch plus a sharded descriptor-DB
query, and (rank 0) writes the numeric results to ``out_json`` for the
parent test to compare against the single-process run.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    coord, n_proc, pid, out_json = (
        sys.argv[1], int(sys.argv[2]), int(sys.argv[3]), sys.argv[4]
    )
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ["OVERLAPNET_COORDINATOR"] = coord
    os.environ["OVERLAPNET_NUM_PROCESSES"] = str(n_proc)
    os.environ["OVERLAPNET_PROCESS_ID"] = str(pid)

    import jax

    jax.config.update("jax_platforms", "cpu")

    from overlapnet_tpu.core.jax_setup import maybe_initialize_distributed

    assert maybe_initialize_distributed(), "bootstrap did not trigger"
    assert jax.process_count() == n_proc, jax.process_count()
    assert jax.device_count() == 2 * n_proc, jax.device_count()

    import numpy as np

    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.lcd.descriptor_db import ShardedDescriptorDB
    from overlapnet_tpu.models import leg_output_width, make_head_apply
    from overlapnet_tpu.parallel.mesh import make_mesh, shard_batch
    from overlapnet_tpu.train.trainer import Trainer

    cfg = OverlapNetConfig()
    cfg.model.input_width = 360
    cfg.train.batch_size = 8

    mesh = make_mesh()  # all 4 global devices
    assert mesh.size == 2 * n_proc

    # --- one DP train step on a deterministic global batch ----------------
    rng = np.random.default_rng(0)
    w = leg_output_width(cfg.model)
    batch = {
        "x1": rng.normal(size=(8, 64, 360, 4)).astype(np.float32),
        "x2": rng.normal(size=(8, 64, 360, 4)).astype(np.float32),
        "overlap": rng.uniform(size=(8,)).astype(np.float32),
        "orientation": rng.integers(0, w, size=(8,)).astype(np.int32),
    }
    trainer = Trainer(cfg, steps_per_epoch=4, mesh=mesh)
    state, metrics = trainer.train_step(trainer.state, shard_batch(mesh, batch))
    loss = float(metrics["loss"])
    grad_norm = float(metrics["grad_norm"])

    # --- sharded descriptor-DB query over the same mesh --------------------
    rng2 = np.random.default_rng(1)
    fvs = rng2.normal(size=(6, w, 128)).astype(np.float32)
    sdb = ShardedDescriptorDB(
        make_head_apply(cfg.model), jax.tree.map(np.asarray, state.params),
        mesh, capacity=16, width=w,
    )
    sdb.add(fvs)
    vals, ids, yaws, confs = sdb.query_topk(fvs[0], k=3)
    ov_all, _, _ = sdb.query_all(fvs[0])

    if pid == 0:
        with open(out_json, "w") as f:
            json.dump({
                "loss": loss,
                "grad_norm": grad_norm,
                "topk_vals": [float(v) for v in vals],
                "topk_ids": [int(i) for i in ids],
                "overlaps": [float(v) for v in ov_all[: len(sdb)]],
            }, f)
    # all processes must agree before exiting
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("mp_worker_done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
