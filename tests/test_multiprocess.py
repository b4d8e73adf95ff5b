"""Two-process distributed bootstrap test (VERDICT r2 ask #2).

Spawns 2 actual OS processes, each with 2 virtual CPU devices, joined via
jax.distributed through the same env-gated bootstrap the CLI uses. One DP
train step and a sharded-DB query run over the global 4-device mesh; the
results must match a single-process 4-device run bit-for-bit (same global
math, different process topology).

The reference has no distributed machinery at all (SURVEY.md §2: single
GPU, reference training.py:336-342); this is the framework's multi-host
scaling story, exercised for real.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_parity(tmp_path):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out_json = str(tmp_path / "mp_result.json")

    env = dict(os.environ)
    env.pop("OVERLAPNET_COORDINATOR", None)
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mp_worker.py"),
             coord, "2", str(pid), out_json],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outputs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outputs.append(out)
    for p, out in zip(procs, outputs):
        assert p.returncode == 0, f"worker failed:\n{out[-4000:]}"
    with open(out_json) as f:
        mp = json.load(f)

    # single-process reference on a 4-device mesh (same global math)
    import jax

    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.lcd.descriptor_db import ShardedDescriptorDB
    from overlapnet_tpu.models import leg_output_width, make_head_apply
    from overlapnet_tpu.parallel.mesh import make_mesh, shard_batch
    from overlapnet_tpu.train.trainer import Trainer

    cfg = OverlapNetConfig()
    cfg.model.input_width = 360
    cfg.train.batch_size = 8
    mesh = make_mesh(4, devices=jax.devices("cpu")[:4])

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

    np.testing.assert_allclose(float(metrics["loss"]), mp["loss"], rtol=1e-5)
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), mp["grad_norm"], rtol=1e-5
    )

    rng2 = np.random.default_rng(1)
    fvs = rng2.normal(size=(6, w, 128)).astype(np.float32)
    sdb = ShardedDescriptorDB(
        make_head_apply(cfg.model), jax.tree.map(np.asarray, state.params),
        mesh, capacity=16, width=w,
    )
    sdb.add(fvs)
    vals, ids, _, _ = sdb.query_topk(fvs[0], k=3)
    ov_all, _, _ = sdb.query_all(fvs[0])

    np.testing.assert_array_equal(np.asarray(ids), mp["topk_ids"])
    np.testing.assert_allclose(np.asarray(vals), mp["topk_vals"], rtol=1e-5)
    np.testing.assert_allclose(
        ov_all[: len(sdb)], mp["overlaps"], rtol=1e-5
    )
