"""Unit tests for the compute ops against analytic numpy oracles (the
reference's inline self-tests, reformulated: RangePadding2D.py:44-93,
NormalizedCorrelation2D.py:112-144)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from overlapnet_tpu.ops.correlation import circular_correlation, wrap_pad
from overlapnet_tpu.ops.delta import delta_conv1, delta_volume


def brute_force_correlation(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """out[s] = sum_{w,c} a[(s + w - W//2) mod W, c] * b[w, c]."""
    bsz, w, c = a.shape
    out = np.zeros((bsz, w))
    for s in range(w):
        rolled = np.roll(a, -(s - w // 2), axis=1)  # rolled[w'] = a[w' + s - W//2]
        out[:, s] = np.sum(rolled * b, axis=(1, 2))
    return out


def test_wrap_pad_oracle():
    # pad([1 2 3 4], 2) -> [3 4 1 2 3 4 1]  (RangePadding2D.py:5)
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0]).reshape(1, 4, 1)
    out = np.asarray(wrap_pad(x, 2)).ravel()
    assert np.array_equal(out, [3, 4, 1, 2, 3, 4, 1])


@pytest.mark.parametrize("method", ["fft", "conv"])
def test_correlation_matches_bruteforce(method):
    rng = np.random.default_rng(0)
    a = rng.normal(size=(2, 36, 8)).astype(np.float32)
    b = rng.normal(size=(2, 36, 8)).astype(np.float32)
    out = np.asarray(
        circular_correlation(jnp.asarray(a), jnp.asarray(b), method=method)
    )
    expected = brute_force_correlation(a, b)
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("method", ["fft", "conv"])
def test_correlation_shift_equivariance(method):
    """Rolling the right input by k bins moves the argmax so that
    yaw = W//2 - argmax recovers k (the property behind infer.py:158)."""
    rng = np.random.default_rng(1)
    w = 60
    a = rng.normal(size=(1, w, 16)).astype(np.float32)
    for k in [0, 1, 7, 30, 59]:
        b = np.roll(a, k, axis=1)
        out = np.asarray(
            circular_correlation(jnp.asarray(a), jnp.asarray(b), method=method)
        )
        peak = int(np.argmax(out[0]))
        assert (w // 2 - peak) % w == k % w


def test_correlation_methods_agree():
    rng = np.random.default_rng(2)
    a = rng.normal(size=(3, 90, 128)).astype(np.float32)
    b = rng.normal(size=(3, 90, 128)).astype(np.float32)
    out_fft = np.asarray(circular_correlation(jnp.asarray(a), jnp.asarray(b), method="fft"))
    out_conv = np.asarray(circular_correlation(jnp.asarray(a), jnp.asarray(b), method="conv"))
    np.testing.assert_allclose(out_fft, out_conv, rtol=1e-3, atol=1e-2)


@pytest.mark.parametrize("normalize", ["euclidean", "scaling", "standardization"])
def test_correlation_normalization_modes_run(normalize):
    rng = np.random.default_rng(3)
    a = rng.normal(size=(2, 24, 4)).astype(np.float32)
    b = rng.normal(size=(2, 24, 4)).astype(np.float32)
    out = np.asarray(
        circular_correlation(jnp.asarray(a), jnp.asarray(b), normalize=normalize)
    )
    assert out.shape == (2, 24)
    assert np.all(np.isfinite(out))


def test_delta_volume_oracle():
    rng = np.random.default_rng(4)
    a = rng.normal(size=(2, 6, 3)).astype(np.float32)
    b = rng.normal(size=(2, 6, 3)).astype(np.float32)
    out = np.asarray(delta_volume(jnp.asarray(a), jnp.asarray(b)))
    expected = np.abs(a[:, :, None, :] - b[:, None, :, :])
    np.testing.assert_allclose(out, expected, rtol=1e-6)


def test_delta_conv1_matches_materialized():
    rng = np.random.default_rng(5)
    bsz, w, c, s, f = 2, 90, 32, 15, 64
    a = rng.normal(size=(bsz, w, c)).astype(np.float32)
    b = rng.normal(size=(bsz, w, c)).astype(np.float32)
    kernel = rng.normal(size=(1, s, c, f)).astype(np.float32) * 0.1
    bias = rng.normal(size=(f,)).astype(np.float32)

    fused = np.asarray(
        delta_conv1(jnp.asarray(a), jnp.asarray(b), jnp.asarray(kernel), jnp.asarray(bias), stride=s)
    )

    # materialized oracle
    diff = np.abs(a[:, :, None, :] - b[:, None, :, :])  # (B, W, W, C)
    j = w // s
    expected = np.zeros((bsz, w, j, f), np.float32)
    for jo in range(j):
        block = diff[:, :, jo * s : (jo + 1) * s, :].reshape(bsz, w, s * c)
        expected[:, :, jo, :] = block @ kernel[0].reshape(s * c, f)
    expected += bias

    assert fused.shape == expected.shape
    np.testing.assert_allclose(fused, expected, rtol=1e-4, atol=1e-4)


def test_delta_conv1_pallas_matches_fused():
    """Pallas fused kernel (interpret mode on CPU) == blocked XLA path."""
    import jax
    from jax.experimental.pallas import tpu as pltpu

    from overlapnet_tpu.ops.pallas_delta import delta_conv1_pallas

    rng = np.random.default_rng(7)
    bsz, w, c, s, f = 2, 90, 32, 15, 16
    a = jnp.asarray(rng.normal(size=(bsz, w, c)).astype(np.float32))
    b = jnp.asarray(rng.normal(size=(bsz, w, c)).astype(np.float32))
    kernel = jnp.asarray(rng.normal(size=(1, s, c, f)).astype(np.float32) * 0.1)
    bias = jnp.asarray(rng.normal(size=(f,)).astype(np.float32))

    expected = np.asarray(delta_conv1(a, b, kernel, bias, stride=s))
    with pltpu.force_tpu_interpret_mode():
        out = np.asarray(delta_conv1_pallas(a, b, kernel, bias, stride=s))
    np.testing.assert_allclose(out, expected, rtol=1e-4, atol=1e-4)

    # custom-VJP backward == autodiff through the blocked path
    def loss_p(a, b, k):
        with pltpu.force_tpu_interpret_mode():
            return jnp.sum(delta_conv1_pallas(a, b, k, stride=s) ** 2)

    def loss_x(a, b, k):
        return jnp.sum(delta_conv1(a, b, k, stride=s) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(a, b, kernel[0])
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(a, b, kernel)
    for p_, x_ in zip(gp, (gx[0], gx[1], gx[2][0])):
        np.testing.assert_allclose(
            np.asarray(p_), np.asarray(x_), rtol=1e-3, atol=1e-3
        )


def test_delta_conv1_blocking_invariance():
    rng = np.random.default_rng(6)
    a = rng.normal(size=(1, 360, 8)).astype(np.float32)
    b = rng.normal(size=(1, 360, 8)).astype(np.float32)
    kernel = rng.normal(size=(1, 15, 8, 4)).astype(np.float32)
    o1 = np.asarray(delta_conv1(jnp.asarray(a), jnp.asarray(b), jnp.asarray(kernel), block=24))
    o2 = np.asarray(delta_conv1(jnp.asarray(a), jnp.asarray(b), jnp.asarray(kernel), block=360))
    np.testing.assert_allclose(o1, o2, rtol=1e-5, atol=1e-5)


def test_subbin_peak_recovers_fractional_vertex():
    """Parabolic logits peaked between bins: subbin_peak returns the exact
    vertex (the interpolation behind serving's continuous yaw output)."""
    from overlapnet_tpu.ops.correlation import subbin_peak

    w = 36
    x = np.arange(w, dtype=np.float64)
    for true in [10.3, 0.4, 35.6, 18.0]:
        d = np.minimum(np.abs(x - true), w - np.abs(x - true))
        logits = (-(d**2)).astype(np.float32)[None]
        peak = float(subbin_peak(jnp.asarray(logits))[0])
        circ = min(abs(peak - true), w - abs(peak - true))
        assert circ < 1e-3, (true, peak)


def test_subbin_peak_flat_and_integer():
    from overlapnet_tpu.ops.correlation import subbin_peak

    flat = jnp.zeros((1, 12))
    assert float(subbin_peak(flat)[0]) == 0.0
    # symmetric peak -> offset 0, returns the argmax exactly
    logits = np.zeros((1, 12), np.float32)
    logits[0, 5] = 3.0
    logits[0, 4] = logits[0, 6] = 1.0
    assert float(subbin_peak(jnp.asarray(logits))[0]) == 5.0


def test_yaw_space_calibrated_roundtrip():
    """GT (reference-format) bin -> calibrated target bin -> decoded degrees
    must recover the physical yaw (within bin rounding) for |yaw| <= 144
    (the alias-free range of the 900-col/stride-2 geometry)."""
    from overlapnet_tpu.core.config import ModelConfig
    from overlapnet_tpu.core.leg_specs import bins_per_degree
    from overlapnet_tpu.ops.yaw import (
        peak_to_degrees,
        ref_bins_to_degrees,
        target_bins,
    )

    mcfg = ModelConfig()  # yaw_space='calibrated'
    assert abs(bins_per_degree(mcfg) - 1.25) < 1e-9
    yaws = np.arange(-140, 141, 7)  # +/-144 exactly is the alias boundary
    ref_bins = np.mod(180 - yaws, 360)  # reference GT binning (1 deg/bin)
    np.testing.assert_allclose(
        np.asarray(ref_bins_to_degrees(ref_bins, mcfg)), yaws, atol=1e-6
    )
    tgt = np.asarray(target_bins(jnp.asarray(ref_bins), mcfg))
    dec = np.asarray(peak_to_degrees(tgt.astype(np.float32), mcfg))
    err = np.abs(dec - yaws)
    err = np.minimum(err, 360 - err)
    assert err.max() <= 0.5 / 1.25 + 1e-4, err.max()  # f32 rounding slack


def test_yaw_space_reference_is_identity():
    from overlapnet_tpu.core.config import ModelConfig
    from overlapnet_tpu.ops.yaw import peak_to_degrees, target_bins

    mcfg = ModelConfig(yaw_space="reference")
    bins = np.arange(0, 360, 17)
    np.testing.assert_array_equal(np.asarray(target_bins(bins, mcfg)), bins)
    # reference readout: 180 - argmax, wrapped
    deg = np.asarray(peak_to_degrees(bins.astype(np.float32), mcfg))
    expected = np.mod(180.0 - bins + 180.0, 360.0) - 180.0
    np.testing.assert_allclose(deg, expected, atol=1e-5)


def test_flip_margin_detects_antipodal_ambiguity():
    """flip_margin ~0 for a bimodal curve with equal antipodal peaks, ~1 for
    a single sharp peak, and invariant to logit scale/offset (the learnable
    correlation scale must not affect it)."""
    import jax.numpy as jnp

    from overlapnet_tpu.ops.correlation import flip_margin, yaw_confidence

    w = 360
    x = np.zeros(w, np.float32)
    x[100] = 10.0
    assert float(flip_margin(jnp.asarray(x))) > 0.95
    # equal antipodal peak (within the +/-3-bin window)
    y = x.copy()
    y[(100 + w // 2 + 2) % w] = 9.9
    assert float(flip_margin(jnp.asarray(y))) < 0.02
    # scale/offset invariance
    m1 = float(flip_margin(jnp.asarray(y)))
    m2 = float(flip_margin(jnp.asarray(y * 37.0 + 5.0)))
    assert abs(m1 - m2) < 1e-5
    # combined confidence collapses for the bimodal curve even though the
    # softmax peak mass is high (the VERDICT r4 failure mode)
    sharp_bimodal = y * 50.0
    peak_mass = float(jnp.max(jax.nn.softmax(jnp.asarray(sharp_bimodal))))
    assert peak_mass > 0.9  # softmax alone cannot see the flip risk
    assert float(yaw_confidence(jnp.asarray(sharp_bimodal))) < 0.1


def test_flip_margin_batched_shapes():
    from overlapnet_tpu.ops.correlation import flip_margin

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 90)).astype(np.float32)
    out = np.asarray(flip_margin(jnp.asarray(logits)))
    assert out.shape == (5,)
    assert np.all((out >= 0.0) & (out <= 1.0))


def test_peak_margin_detects_off_antipodal_ambiguity():
    """peak_margin catches competing modes the antipodal margin cannot:
    a 90-degree-offset secondary peak collapses it, while flip_margin
    stays high (the r05 failure mode)."""
    from overlapnet_tpu.ops.correlation import (
        flip_margin,
        peak_margin,
        yaw_confidence,
    )

    w = 360
    x = np.zeros(w, np.float32)
    x[100] = 10.0
    assert float(peak_margin(jnp.asarray(x))) > 0.95  # unimodal
    y = x.copy()
    y[(100 + 90) % w] = 9.8  # quarter-turn competitor
    assert float(flip_margin(jnp.asarray(y))) > 0.9  # antipodal-only: blind
    assert float(peak_margin(jnp.asarray(y))) < 0.05
    assert float(yaw_confidence(jnp.asarray(y * 50.0))) < 0.1
    # guard window: the peak's own shoulder does not count as a competitor
    z = x.copy()
    z[103] = 9.9
    assert float(peak_margin(jnp.asarray(z), guard=8)) > 0.9
