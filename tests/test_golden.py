"""Golden model-forward regression anchors (VERDICT r2 ask #6).

Fixed-seed params (init_params rng=0) + the two bundled reference scans
(/root/reference/data/scans/000000.bin, 000001.bin) through the full-size
64x900x4 geo model must reproduce the committed (overlap, yaw-argmax, logit
stats) anchors. This pins the entire numeric path — projection, normal map,
legs, delta head, correlation head — so any refactor that silently changes
model numerics fails here, the way the reference's infer self-test pins its
demo outputs (reference infer.py:268-302).

Anchors were produced on the CPU backend with
jax_default_matmul_precision=highest (same settings as this test); overlap
tolerances absorb XLA-version drift, argmaxes are exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from overlapnet_tpu.core.config import OverlapNetConfig
from overlapnet_tpu.geometry import load_scan, normal_map, pad_points, range_projection
from overlapnet_tpu.models import build_model, init_params

# (left idx, right idx) -> (overlap, yaw argmax, logit mean, logit max)
GOLDEN = {
    (0, 1): (0.5050565004348755, 180, 263.7239074707031, 311.9192810058594),
    (1, 0): (0.5035894513130188, 180, 263.7239074707031, 311.9192810058594),
    (0, 0): (0.5035746693611145, 180, 266.84405517578125, 325.6856994628906),
}
GOLDEN_FV = {"mean": 0.0425775907933712, "absmax": 0.6808858513832092}


@pytest.mark.slow
def test_golden_forward_bundled_scans(bundled_scan_paths):
    with jax.default_matmul_precision("highest"):
        imgs = []
        for p in bundled_scan_paths:
            pts = jnp.asarray(pad_points(load_scan(p)))
            r, v, _, _ = range_projection(pts)
            imgs.append(
                jnp.concatenate([r[..., None], normal_map(r, v)], axis=-1)[None]
            )
        cfg = OverlapNetConfig()
        # the exact anchors pin the full-precision numeric path; the default
        # config (bf16 legs) is gated separately below
        mcfg32 = dataclasses.replace(cfg.model, leg_dtype="float32")
        model = build_model(mcfg32)
        params = init_params(mcfg32, 4, rng=0)
        fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))

        for (i, j), (ov_g, argmax_g, lmean_g, lmax_g) in GOLDEN.items():
            ov, logits = fwd(params, imgs[i], imgs[j])
            ov = float(np.asarray(ov)[0, 0])
            lg = np.asarray(logits)[0]
            assert abs(ov - ov_g) < 1e-3, (i, j, ov, ov_g)
            assert int(lg.argmax()) == argmax_g, (i, j, int(lg.argmax()))
            np.testing.assert_allclose(float(lg.mean()), lmean_g, rtol=1e-3)
            np.testing.assert_allclose(float(lg.max()), lmax_g, rtol=1e-3)

        enc = jax.jit(lambda p, x: model.apply(p, x, method=type(model).encode))
        fv = np.asarray(enc(params, imgs[0]))
        assert fv.shape == (1, 360, 128)
        np.testing.assert_allclose(float(fv.mean()), GOLDEN_FV["mean"], rtol=1e-3)
        np.testing.assert_allclose(
            float(np.abs(fv).max()), GOLDEN_FV["absmax"], rtol=1e-3
        )

        # default config (bfloat16 leg compute, ModelConfig.leg_dtype): the
        # reduced-precision conv stack must stay within serving tolerance of
        # the fp32 anchors — overlap drift < 5e-3 and exact yaw argmax.
        model_bf = build_model(cfg.model)
        assert cfg.model.leg_dtype == "bfloat16"
        fwd_bf = jax.jit(lambda p, a, b: model_bf.apply(p, a, b))
        for (i, j), (ov_g, argmax_g, _, _) in GOLDEN.items():
            ov, logits = fwd_bf(params, imgs[i], imgs[j])
            ov = float(np.asarray(ov)[0, 0])
            lg = np.asarray(logits)[0]
            assert abs(ov - ov_g) < 5e-3, (i, j, ov, ov_g)
            assert int(lg.argmax()) == argmax_g, (i, j, int(lg.argmax()))
