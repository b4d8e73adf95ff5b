"""Circular cross-correlation over yaw shifts (the orientation head's op).

The reference implements this as a per-sample ``tf.scan`` that wrap-pads the
left feature volume to width 2W-1 and convolves it with the right volume as a
conv kernel (reference: NormalizedCorrelation2D.py:43-109, RangePadding2D.py:
31-41). Semantics: with pad = W//2,

    out[b, s] = sum_{w, c} a[b, (s + w - W//2) mod W, c] * b[b, w, c]

i.e. a circular cross-correlation with the zero-shift peak moved to the
center bin W//2 — which is why inference reads ``yaw = W//2 - argmax``
(reference infer.py:158).

TPU-native backends (no per-sample loop; vmap/batch everywhere):

- 'fft'  : O(W log W * C). rfft along the shift axis; the channel sum happens
           in frequency space, so one irfft of length W per sample.
- 'conv' : one MXU grouped convolution; batch as feature groups, each sample's
           right volume acts as that group's kernel.

Both are exact (up to float assoc.) and differentiable; training uses
whichever ``ModelConfig.correlation_method`` selects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def wrap_pad(x: jax.Array, pad: int) -> jax.Array:
    """Width-wise wrap pad to width 2W-1: [x[pad:], x, x[:pad-1]]
    (reference RangePadding2D.py:31-41; pad([1 2 3 4], 2) -> [3 4 1 2 3 4 1]).

    Args:
      x: (..., W, C)
    """
    return jnp.concatenate([x[..., pad:, :], x, x[..., : pad - 1, :]], axis=-2)


def _normalize(x: jax.Array, mode: str) -> jax.Array:
    """Feature-volume normalization variants
    (reference NormalizedCorrelation2D.py:55-73). Production uses 'none'
    (reference generateNet.py:343)."""
    if mode == "none":
        return x
    if mode == "euclidean":
        norm = jnp.linalg.norm(x, axis=-2, keepdims=True)
        return x / jnp.where(norm > 0, norm, 1.0)
    if mode == "scaling":
        x_min = jnp.min(x, axis=-2, keepdims=True)
        x_max = jnp.max(x, axis=-2, keepdims=True)
        return (x - x_min) / (x_max - x_min + 1e-6)
    if mode == "standardization":
        x = x - jnp.mean(x, axis=-2, keepdims=True) + 1e-5
        norm = jnp.linalg.norm(x, axis=-2, keepdims=True)
        return x / jnp.where(norm > 0, norm, 1.0)
    raise ValueError(f"Unknown correlation normalization: {mode!r}")


def _circular_correlation_fft(a: jax.Array, b: jax.Array) -> jax.Array:
    w = a.shape[-2]
    fa = jnp.fft.rfft(a.astype(jnp.float32), axis=-2)
    fb = jnp.fft.rfft(b.astype(jnp.float32), axis=-2)
    spec = jnp.sum(fa * jnp.conj(fb), axis=-1)  # channel sum in freq space
    corr = jnp.fft.irfft(spec, n=w, axis=-1)
    # corr[k] = sum_w a[(w + k) mod W] * b[w]; the reference's padded-conv
    # indexing is out[s] = corr[(s - W//2) mod W] => roll by +W//2.
    return jnp.roll(corr, w // 2, axis=-1)


def _circular_correlation_conv(a: jax.Array, b: jax.Array) -> jax.Array:
    """Grouped-conv formulation: one conv with batch*channels input channels
    and batch feature groups, so each sample's `b` is its group's kernel."""
    bsz, w, c = a.shape
    padded = wrap_pad(a, w // 2)  # (B, 2W-1, C)
    lhs = padded.transpose(0, 2, 1).reshape(1, bsz * c, 1, 2 * w - 1)
    rhs = b.transpose(0, 2, 1).reshape(bsz, c, 1, w)
    out = jax.lax.conv_general_dilated(
        lhs.astype(jnp.float32),
        rhs.astype(jnp.float32),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=bsz,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.reshape(bsz, w)


def subbin_peak(logits: jax.Array) -> jax.Array:
    """Sub-bin peak position of (..., W) correlation logits.

    Fits a parabola through the argmax bin and its two circular neighbours
    and returns argmax + vertex offset (float32, offset clipped to
    [-0.5, 0.5]). The reference reads the raw argmax (reference
    infer.py:158), quantizing yaw to the 1-degree bin grid; the parabolic
    vertex recovers the continuous peak at no extra model cost — free
    accuracy for loop-closure initialization (VERDICT r3 ask #2b).
    """
    w = logits.shape[-1]
    i = jnp.argmax(logits, axis=-1)
    p = jnp.take_along_axis(logits, i[..., None], axis=-1)[..., 0]
    left = jnp.take_along_axis(logits, ((i - 1) % w)[..., None], axis=-1)[..., 0]
    right = jnp.take_along_axis(logits, ((i + 1) % w)[..., None], axis=-1)[..., 0]
    denom = left - 2.0 * p + right
    offset = jnp.where(
        jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0
    )
    offset = jnp.clip(offset, -0.5, 0.5)
    return i.astype(jnp.float32) + offset.astype(jnp.float32)


def flip_margin(logits: jax.Array, window: int = 3) -> jax.Array:
    """Antipodal ambiguity margin of (..., W) correlation logits, in [0, 1].

    Ratio of the peak's height over the strongest bin within ``window`` bins
    of the antipode (peak + W//2), normalized by the curve's dynamic range:

        (peak - anti) / (peak - min)

    Scale- AND offset-invariant (a learnable logit scale cancels), so it
    measures the raw correlation geometry, not softmax sharpness: ~0 means
    the antipodal correlation is as strong as the peak (a 180-degree-
    symmetric scene — the peak could be a flip), ~1 means the antipode
    carries no energy. This is the bimodality signal the softmax peak mass
    cannot see (VERDICT r4 weak #1: closures with 180.0-degree yaw error at
    softmax confidence 1.0). Reference counterpart: none — the reference
    reads only argmax (infer.py:158).
    """
    w = logits.shape[-1]
    i = jnp.argmax(logits, axis=-1)
    peak = jnp.max(logits, axis=-1)
    offs = jnp.arange(-window, window + 1)
    anti_idx = jnp.mod(i[..., None] + w // 2 + offs, w)
    anti = jnp.max(jnp.take_along_axis(logits, anti_idx, axis=-1), axis=-1)
    lo = jnp.min(logits, axis=-1)
    return (peak - anti) / jnp.maximum(peak - lo, 1e-12)


def peak_margin(logits: jax.Array, guard: int = 8) -> jax.Array:
    """Secondary-peak margin of (..., W) correlation logits, in [0, 1].

    Peak-to-sidelobe ratio generalizing :func:`flip_margin` beyond the
    antipode: the margin of the peak over the strongest bin at circular
    distance > ``guard`` bins (the guard excludes the peak's own width),
    normalized by the curve's dynamic range — scale/offset invariant.
    ~0 means a competing correlation mode ANYWHERE (±90° grid symmetry,
    ±180° flips, repeated structure) rivals the winner; ~1 means the peak
    is unimodal. Measured need: RESULTS r05 interim showed 90-degree yaw
    errors at softmax confidence 0.86 in 4-fold-symmetric scenes — invisible
    to both the softmax mass and the antipodal-only margin."""
    w = logits.shape[-1]
    i = jnp.argmax(logits, axis=-1)
    peak = jnp.max(logits, axis=-1)
    idx = jnp.arange(w)
    # circular distance of every bin from the peak
    raw = jnp.abs(idx - i[..., None])
    dist = jnp.minimum(raw, w - raw)
    masked = jnp.where(dist > guard, logits, -jnp.inf)
    second = jnp.max(masked, axis=-1)
    lo = jnp.min(logits, axis=-1)
    return jnp.clip(
        (peak - second) / jnp.maximum(peak - lo, 1e-12), 0.0, 1.0
    )


def yaw_confidence(logits: jax.Array, guard: int = 8) -> jax.Array:
    """Ambiguity-aware yaw confidence: softmax peak mass x secondary-peak
    margin.

    The peak mass measures how sharp the winning mode is; the secondary-
    peak margin measures whether ANY competing mode (antipodal flip,
    90-degree grid symmetry, repeated structure) rivals it. Their product
    scales the pose-graph edge's yaw information
    (backend.closures_to_edges): a sharp but multi-modal correlation gets
    near-zero heading weight instead of full weight."""
    peak_mass = jnp.max(jax.nn.softmax(logits, axis=-1), axis=-1)
    return peak_mass * peak_margin(logits, guard)


def circular_correlation(
    a: jax.Array,
    b: jax.Array,
    *,
    normalize: str = "none",
    method: str = "fft",
) -> jax.Array:
    """Orientation logits: correlation of two (B, W, C) feature volumes over
    all W circular shifts, peak centered at bin W//2.

    Returns (B, W) float32 logits ('orientation_output').
    """
    a = _normalize(a, normalize)
    b = _normalize(b, normalize)
    if method == "fft":
        return _circular_correlation_fft(a, b)
    if method == "conv":
        return _circular_correlation_conv(a, b)
    raise ValueError(f"Unknown correlation method: {method!r}")
