"""Yaw conventions: correlation-peak bins <-> physical degrees.

The reference reads yaw directly as ``180 - argmax`` degrees (reference
infer.py:158) and bins GT yaw at one degree per bin
(com_overlap_yaw.py:54). But the legs are VALID convs with total column
stride 2 on a 900-column panorama, so physically the correlation peak moves
``input_width / (360 * width_stride)`` = **1.25 bins per degree of yaw**,
not 1 (measured on real scans and a controlled rotating simulation:
tests/test_models.py::test_rolled_input_shifts_correlation_peak,
tests/test_sim.py). The reference convention therefore over-reports yaw by
25% and aliases beyond |yaw| > 144 degrees.

``ModelConfig.yaw_space`` selects the convention:

- 'calibrated' (default): training targets are placed at the bin where the
  physical peak lands, and decoding divides by the measured bins-per-degree
  factor. GT npz files keep the reference's 1-degree-bin format on disk
  (data compatibility); conversion happens at target-build/decode time.
- 'reference': bit-parity with the reference (targets = GT bins, decode =
  center - peak in bins-as-degrees).

All functions accept numpy or jax arrays (jnp ops; jit-safe).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from overlapnet_tpu.core.leg_specs import bins_per_degree, leg_output_width


def ref_bins_to_degrees(bins: jax.Array, mcfg) -> jax.Array:
    """GT-npz yaw bins (reference format, com_overlap_yaw.py:54) ->
    physical degrees in (-180, 180]."""
    w = leg_output_width(mcfg)
    return (w // 2 - jnp.asarray(bins, jnp.float32)) * (360.0 / w)


def target_bins(ref_bins: jax.Array, mcfg) -> jax.Array:
    """Training-target bin index for GT bins in the reference npz format.

    'reference': unchanged. 'calibrated': the bin where the correlation
    peak physically lands for that relative yaw."""
    ref_bins = jnp.asarray(ref_bins)
    if mcfg.yaw_space == "reference":
        return ref_bins
    w = leg_output_width(mcfg)
    yaw_deg = ref_bins_to_degrees(ref_bins, mcfg)
    peak = jnp.round(bins_per_degree(mcfg) * yaw_deg)
    return jnp.mod(w // 2 - peak.astype(jnp.int32), w)


def peak_to_degrees(peak: jax.Array, mcfg) -> jax.Array:
    """Correlation peak position (float sub-bin ok) -> yaw degrees.

    'reference': center - peak, read as degrees (reference infer.py:158).
    'calibrated': (center - peak) / bins_per_degree, wrapped to
    (-180, 180]."""
    w = leg_output_width(mcfg)
    off = w // 2 - jnp.asarray(peak, jnp.float32)
    if mcfg.yaw_space == "reference":
        deg = off * (360.0 / w)
    else:
        deg = off / bins_per_degree(mcfg)
    return jnp.mod(deg + 180.0, 360.0) - 180.0
