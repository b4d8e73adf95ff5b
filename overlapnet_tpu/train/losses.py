"""Training losses.

Exact functional equivalents of the reference's two losses
(reference: training.py:71-92) and their 5:1 combination
(training.py:255-259):

- overlap: mean sigmoid of the absolute error,
  ``mean(1 / (1 + exp(-((|y_hat - y| + 0.25) * 24 - 12))))``
- orientation: ``tf.nn.weighted_cross_entropy_with_logits`` with
  pos_weight = network_output_size (360), against a target vector that is
  zero except target[yaw_bin] = overlap, binarized at
  min_overlap_for_angle (training.py:42-43, 86-92;
  ImagePairOverlapOrientationSequence.py:118-123).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sigmoid_overlap_loss(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Mean sigmoid-shaped overlap regression loss (training.py:71-83).

    Args:
      pred: (B,) or (B, 1) predicted overlap in [0, 1].
      target: (B,) true overlap.
    """
    diff = jnp.abs(jnp.reshape(pred, target.shape) - target)
    x = (diff + 0.25) * 24.0 - 12.0
    return jnp.mean(jax.nn.sigmoid(x))


def orientation_target(
    yaw_bins: jax.Array, overlaps: jax.Array, output_size: int
) -> jax.Array:
    """Target vector: zeros except y[yaw_bin] = overlap
    (ImagePairOverlapOrientationSequence.py:118-123).

    Args:
      yaw_bins: (B,) integer yaw bin per pair.
      overlaps: (B,) overlap per pair.
    Returns: (B, output_size) float32.
    """
    onehot = jax.nn.one_hot(yaw_bins.astype(jnp.int32), output_size, dtype=jnp.float32)
    return onehot * overlaps[:, None].astype(jnp.float32)


def weighted_orientation_entropy(
    logits: jax.Array,
    target: jax.Array,
    pos_weight: float,
    min_overlap_for_angle: float = 0.7,
    pair_mask: jax.Array | None = None,
    soft_overlap_min: float = -1.0,
) -> jax.Array:
    """Weighted cross-entropy on yaw logits (training.py:86-92).

    The target is binarized: z = (target > min_overlap_for_angle). Loss per
    element follows tf.nn.weighted_cross_entropy_with_logits:
      (1 - z) * x + (1 + (pos_weight - 1) * z) * log(1 + exp(-|x|)) + max(-x, 0) * ...
    reduced by mean over batch and bins (keras per-output mean).

    ``soft_overlap_min`` in [0, min_overlap_for_angle) replaces the hard
    binarization with a linear ramp z = clip((target - soft) / (hard -
    soft), 0, 1): pairs in the (soft, hard) overlap band then carry an
    overlap-proportional positive weight at their yaw bin instead of an
    all-zero target. The reference's hard cutoff leaves yaw completely
    unsupervised below 0.7 overlap, which is exactly where the LCD engine
    accepts closures (threshold 0.3, demo3_lcd.py:55) — measured as a yaw-
    accuracy cliff: 0.12 deg RMS above 0.7, ~50 deg below (RESULTS_r04,
    VERDICT r4 weak #2). Default -1 = reference-parity hard binarization.
    """
    if 0.0 <= soft_overlap_min < min_overlap_for_angle:
        z = jnp.clip(
            (target - soft_overlap_min)
            / (min_overlap_for_angle - soft_overlap_min),
            0.0,
            1.0,
        ).astype(logits.dtype)
    else:
        z = (target > min_overlap_for_angle).astype(logits.dtype)
    x = logits
    log_weight = 1.0 + (pos_weight - 1.0) * z
    # numerically stable form used by TF:
    # (1 - z) * x + log_weight * (log1p(exp(-|x|)) + relu(-x))
    loss = (1.0 - z) * x + log_weight * (
        jnp.log1p(jnp.exp(-jnp.abs(x))) + jax.nn.relu(-x)
    )
    if pair_mask is not None:
        # average only over pairs that carry a yaw label: a sub-threshold
        # pair's all-zero target means "yaw unknown", not "no yaw" —
        # penalizing every bin there only teaches logit suppression.
        per_pair = jnp.mean(loss, axis=-1)
        m = pair_mask.astype(loss.dtype)
        return jnp.sum(per_pair * m) / jnp.maximum(jnp.sum(m), 1.0)
    return jnp.mean(loss)


def combined_loss(
    overlap_pred: jax.Array,
    orientation_logits: jax.Array,
    overlap_true: jax.Array,
    orientation_target_vec: jax.Array,
    *,
    pos_weight: float,
    min_overlap_for_angle: float = 0.7,
    overlap_weight: float = 5.0,
    orientation_weight: float = 1.0,
    mask_zero_orientation: bool = False,
    soft_overlap_min: float = -1.0,
):
    """Total loss = 5 * overlap + 1 * orientation (training.py:257).

    ``mask_zero_orientation`` restricts the orientation CE to pairs whose
    overlap exceeds the yaw-label threshold (min_overlap_for_angle, or
    soft_overlap_min when the soft ramp is active); reference parity =
    False (training.py:86-92 averages over all)."""
    l_overlap = sigmoid_overlap_loss(overlap_pred, overlap_true)
    soft = 0.0 <= soft_overlap_min < min_overlap_for_angle
    mask_thr = soft_overlap_min if soft else min_overlap_for_angle
    pair_mask = overlap_true > mask_thr if mask_zero_orientation else None
    l_orient = weighted_orientation_entropy(
        orientation_logits,
        orientation_target_vec,
        pos_weight,
        min_overlap_for_angle,
        pair_mask=pair_mask,
        soft_overlap_min=soft_overlap_min,
    )
    total = overlap_weight * l_overlap + orientation_weight * l_orient
    return total, {"loss": total, "overlap_loss": l_overlap, "orientation_loss": l_orient}
