"""Siamese legs: the per-scan descriptor encoder.

Re-design of reference generateNet.generate360OutputkLegs
(generateNet.py:119-219): an 11-conv VALID/ReLU stack that maps one
(64, W, C) range image to a (W', 128) feature volume — one 128-dim descriptor
per yaw bin (W'=360 for W=900). Layer names s_conv1..s_conv10 (+ s_conv3a)
are preserved as the de-facto checkpoint schema (weights load by name,
reference infer.py:117-122).

The 'Fixed' variant (frozen legs, generateNet.py:222-324) is realized by the
trainer masking leg gradients (``ModelConfig.legs_trainable=False``) rather
than by a duplicate module.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from overlapnet_tpu.core.config import ModelConfig


def _conv_specs(cfg: ModelConfig) -> list[tuple[str, int, tuple[int, int], tuple[int, int]]]:
    """(name, features, kernel hxw, strides) for the leg stack; shape table in
    SURVEY.md §2 (reference generateNet.py:161-217)."""
    if cfg.small_net:
        return [("s_conv1", 2, (5, 15), (5, 5))]
    specs = [
        ("s_conv1", 16, (5, 15), tuple(cfg.strides_layer1)),
        ("s_conv2", 32, (3, 15), (2, 1)),
        ("s_conv3", 64, (3, 15), (2, 1)),
    ]
    if cfg.additional_unsymmetric_layer3a:
        specs.append(("s_conv3a", 64, (3, 12), (2, 1)))
    specs += [
        ("s_conv4", 128, (2, 9), (2, 1)),
        ("s_conv5", 128, (1, 9), (1, 1)),
        ("s_conv6", 128, (1, 9), (1, 1)),
        ("s_conv7", 128, (1, 9), (1, 1)),
        ("s_conv8", 128, (1, 7), (1, 1)),
        ("s_conv9", 128, (1, 5), (1, 1)),
        ("s_conv10", 128, (1, 3), (1, 1)),
    ]
    return specs


def leg_output_width(cfg: ModelConfig) -> int:
    """Static leg output width for an input of width cfg.input_width."""
    w = cfg.input_width
    h = cfg.input_height
    for _, _, (kh, kw), (sh, sw) in _conv_specs(cfg):
        w = (w - kw) // sw + 1
        h = (h - kh) // sh + 1
        if w <= 0 or h <= 0:
            raise ValueError(
                f"Leg conv stack collapses input {cfg.input_height}x"
                f"{cfg.input_width} to nonpositive size at some layer"
            )
    return w


def leg_output_height(cfg: ModelConfig) -> int:
    h = cfg.input_height
    for _, _, (kh, _), (sh, _) in _conv_specs(cfg):
        h = (h - kh) // sh + 1
    return h


class SiameseLegs(nn.Module):
    """Shared-weight conv encoder; apply to each scan of a pair.

    Input (B, H, W, C) NHWC; output (B, W', 128) with the height-1 axis
    squeezed (fails loudly if the configured input height does not collapse
    to 1, as in the reference's 64-row geometry).
    """

    cfg: ModelConfig
    param_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        x = x.astype(compute_dtype)
        for name, features, kernel, strides in _conv_specs(self.cfg):
            x = nn.Conv(
                features=features,
                kernel_size=kernel,
                strides=strides,
                padding="VALID",
                name=name,
                dtype=compute_dtype,
                param_dtype=self.param_dtype,
            )(x)
            x = nn.relu(x)
        if x.shape[1] != 1:
            raise ValueError(
                f"Leg output height is {x.shape[1]}, expected 1 "
                f"(input {self.cfg.input_height} rows)"
            )
        return jnp.squeeze(x, axis=1)  # (B, W', 128)
