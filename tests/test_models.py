"""Model structure tests: shape chain, checkpoint schema, head consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from overlapnet_tpu.core.config import ModelConfig
from overlapnet_tpu.models import (
    build_model,
    init_params,
    leg_output_width,
    make_head_apply,
    make_leg_apply,
)


def test_leg_output_width_formula():
    cfg = ModelConfig()  # W=900
    assert leg_output_width(cfg) == 360
    cfg2 = ModelConfig(input_width=360)
    assert leg_output_width(cfg2) == 90


def test_full_model_shapes(small_model_cfg):
    cfg = small_model_cfg
    params = init_params(cfg, num_channels=4, rng=0)
    model = build_model(cfg)
    x = jnp.zeros((2, 64, cfg.input_width, 4))
    overlap, orientation = model.apply(params, x, x)
    w = leg_output_width(cfg)
    assert overlap.shape == (2, 1)
    assert orientation.shape == (2, w)
    assert np.all(np.isfinite(np.asarray(overlap)))
    assert np.all((np.asarray(overlap) >= 0) & (np.asarray(overlap) <= 1))


def test_param_schema_names(small_model_cfg):
    """Layer names are the checkpoint schema (reference infer.py:117-122:
    weights load by name into split leg/head models)."""
    params = init_params(small_model_cfg, num_channels=4)["params"]
    legs = params["legs"]
    for name in ["s_conv1", "s_conv2", "s_conv3", "s_conv3a", "s_conv4",
                 "s_conv5", "s_conv6", "s_conv7", "s_conv8", "s_conv9",
                 "s_conv10"]:
        assert name in legs, f"missing {name}"
        assert "kernel" in legs[name] and "bias" in legs[name]
    head = params["overlap_head"]
    for name in ["c_conv1", "c_conv2", "c_conv3", "overlap_output"]:
        assert name in head
    assert "orientation_head" not in params or not params["orientation_head"]


def test_leg_head_split_matches_full(small_model_cfg):
    """encode+score must equal the fused forward (the factorization that
    makes descriptor caching sound, reference testing.py:6-13)."""
    cfg = small_model_cfg
    params = init_params(cfg, num_channels=4, rng=1)
    model = build_model(cfg)
    rng = np.random.default_rng(0)
    x1 = jnp.asarray(rng.normal(size=(2, 64, cfg.input_width, 4)).astype(np.float32))
    x2 = jnp.asarray(rng.normal(size=(2, 64, cfg.input_width, 4)).astype(np.float32))

    full_overlap, full_orient = model.apply(params, x1, x2)

    leg_apply = make_leg_apply(cfg)
    head_apply = make_head_apply(cfg)
    fa = leg_apply(params, x1)
    fb = leg_apply(params, x2)
    assert fa.shape == (2, leg_output_width(cfg), 128)
    split_overlap, split_orient = head_apply(params, fa, fb)

    np.testing.assert_allclose(
        np.asarray(full_overlap), np.asarray(split_overlap), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(full_orient), np.asarray(split_orient), rtol=1e-5, atol=1e-4
    )


def test_delta_head_impls_agree(small_model_cfg):
    cfg_xla = small_model_cfg
    import dataclasses

    cfg_blk = dataclasses.replace(cfg_xla, delta_head_impl="blocked")
    params = init_params(cfg_xla, num_channels=4, rng=2)
    rng = np.random.default_rng(1)
    w = leg_output_width(cfg_xla)
    fa = jnp.asarray(rng.normal(size=(2, w, 128)).astype(np.float32))
    fb = jnp.asarray(rng.normal(size=(2, w, 128)).astype(np.float32))
    o_xla = make_head_apply(cfg_xla)(params, fa, fb)
    o_blk = make_head_apply(cfg_blk)(params, fa, fb)
    np.testing.assert_allclose(
        np.asarray(o_xla[0]), np.asarray(o_blk[0]), rtol=1e-4, atol=1e-5
    )


def test_self_pair_peak_at_center(small_model_cfg):
    """A scan correlated with itself peaks at zero shift = center bin."""
    cfg = small_model_cfg
    params = init_params(cfg, num_channels=4, rng=3)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 64, cfg.input_width, 4)).astype(np.float32))
    model = build_model(cfg)
    _, orient = model.apply(params, x, x)
    w = leg_output_width(cfg)
    assert int(jnp.argmax(orient[0])) == w // 2


def test_full_size_model_shapes():
    """One full 64x900 forward to pin the production shape chain."""
    cfg = ModelConfig()
    params = init_params(cfg, num_channels=4, rng=0)
    model = build_model(cfg)
    x = jnp.zeros((1, 64, 900, 4))
    overlap, orientation = model.apply(params, x, x)
    assert overlap.shape == (1, 1)
    assert orientation.shape == (1, 360)
    # c_conv3 sees (360/15=24, 24) grid -> 22x22x256 flatten = 123904
    kernel = params["params"]["overlap_head"]["overlap_output"]["kernel"]
    assert kernel.shape[0] == 22 * 22 * 256


def test_gradients_flow(small_model_cfg):
    cfg = small_model_cfg
    params = init_params(cfg, num_channels=4, rng=4)
    model = build_model(cfg)
    x1 = jnp.ones((1, 64, cfg.input_width, 4)) * 0.1
    x2 = jnp.ones((1, 64, cfg.input_width, 4)) * 0.2

    def loss_fn(p):
        ov, orient = model.apply(p, x1, x2)
        return jnp.sum(ov) + jnp.mean(orient**2)

    grads = jax.grad(loss_fn)(params)
    leaf = grads["params"]["legs"]["s_conv1"]["kernel"]
    assert np.all(np.isfinite(np.asarray(leaf)))
    assert np.abs(np.asarray(leaf)).sum() > 0


def test_cosine_correlation_head(small_model_cfg):
    """'cosine' mode: bounded logits (|z| <= logit_scale), learnable scale
    param present, and the self-pair peak stays at the center bin."""
    import dataclasses

    cfg = dataclasses.replace(small_model_cfg, correlation_normalize="cosine")
    params = init_params(cfg, num_channels=4, rng=3)
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    names = ["/".join(str(getattr(k, "key", k)) for k in p) for p, _ in flat]
    assert any("logit_scale" in n for n in names), names

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 64, cfg.input_width, 4)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(2, 64, cfg.input_width, 4)).astype(np.float32))
    model = build_model(cfg)
    _, orient = model.apply(params, x, y)
    assert float(jnp.max(jnp.abs(orient))) <= 10.0 + 1e-3  # |cos| <= 1 * scale

    _, self_orient = model.apply(params, x, x)
    w = leg_output_width(cfg)
    assert int(jnp.argmax(self_orient[0])) == w // 2


def test_rolled_input_shifts_correlation_peak(bundled_scan_paths):
    """Rolling the RIGHT image by +s columns moves the correlation peak by
    -s/width_stride bins (NOT -s*W'/W): the legs are translation-covariant
    at their total column stride (2), so the peak moves
    input_width/(360*stride) = 1.25 bins per degree of yaw. This measured
    factor is the basis of the 'calibrated' yaw space (ops/yaw.py) — the
    reference's 1-bin-per-degree readout (infer.py:158) over-reports yaw
    by exactly this ratio.

    Uses a real bundled scan (the 900-column range image is a true 360-deg
    panorama, so a circular column roll IS a yaw rotation); VALID convs make
    the equivariance approximate at the receptive-field border, hence the
    2-bin tolerance.
    """
    from overlapnet_tpu.core.config import OverlapNetConfig
    from overlapnet_tpu.core.leg_specs import width_stride
    from overlapnet_tpu.geometry import (
        load_scan,
        normal_map,
        pad_points,
        range_projection,
    )

    pts = jnp.asarray(pad_points(load_scan(bundled_scan_paths[0])))
    r, v, _, _ = range_projection(pts)
    img = np.asarray(jnp.concatenate([r[..., None], normal_map(r, v)], axis=-1))

    cfg = OverlapNetConfig().model
    wp, stride = leg_output_width(cfg), width_stride(cfg)
    params = init_params(cfg, 4, rng=0)
    model = build_model(cfg)
    fwd = jax.jit(lambda p, a, b: model.apply(p, a, b))

    for s in [0, 10, 250]:
        rolled = np.roll(img, s, axis=1)
        _, logits = fwd(params, jnp.asarray(img[None]), jnp.asarray(rolled[None]))
        peak = int(np.argmax(np.asarray(logits)[0]))
        expected = (wp // 2 - round(s / stride)) % wp
        circ = min(abs(peak - expected), wp - abs(peak - expected))
        assert circ <= 2, (s, peak, expected)


def test_circular_legs_exact_equivariance():
    """'circular' leg padding: rolling the input panorama by s columns rolls
    the feature volume by exactly s/stride bins — bit-exact, every layer
    wrap-padded (the architecture fix for the valid-conv yaw aliasing)."""
    from overlapnet_tpu.core.leg_specs import width_stride

    cfg = ModelConfig(
        input_width=360, leg_padding="circular", leg_dtype="float32"
    )
    assert leg_output_width(cfg) == 360 // width_stride(cfg)
    params = init_params(cfg, 4, rng=0)
    model = build_model(cfg)
    enc = jax.jit(lambda p, x: model.apply(p, x, method=type(model).encode))
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 64, 360, 4)).astype(np.float32)
    f0 = np.asarray(enc(params, jnp.asarray(img)))
    for s in [2, 50, 358]:
        fr = np.asarray(enc(params, jnp.asarray(np.roll(img, s, axis=2))))
        np.testing.assert_array_equal(fr, np.roll(f0, s // 2, axis=1))


def test_circular_legs_full_range_yaw_roundtrip():
    """With circular legs the calibrated yaw space is alias-free over the
    full +/-180 degrees (valid legs alias beyond 144)."""
    from overlapnet_tpu.core.leg_specs import bins_per_degree
    from overlapnet_tpu.ops.yaw import peak_to_degrees, target_bins

    cfg = ModelConfig(input_width=900, leg_padding="circular")
    w = leg_output_width(cfg)
    assert w == 450 and abs(bins_per_degree(cfg) - 1.25) < 1e-9
    yaws = np.arange(-179, 180, 13)
    # GT npz bins at W'=450 resolution (0.8 deg/bin), reference formula
    ref_bins = np.mod(w // 2 - np.round(yaws / (360.0 / w)), w).astype(int)
    tgt = np.asarray(target_bins(jnp.asarray(ref_bins), cfg))
    dec = np.asarray(peak_to_degrees(tgt.astype(np.float32), cfg))
    err = np.abs(dec - yaws)
    err = np.minimum(err, 360 - err)
    assert err.max() < 0.5, err.max()
