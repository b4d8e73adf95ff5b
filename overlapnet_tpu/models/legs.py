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
from overlapnet_tpu.core.leg_specs import (  # noqa: F401  (re-exported)
    conv_specs as _conv_specs,
    leg_output_height,
    leg_output_width,
)


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
        compute_dtype = jnp.dtype(self.cfg.leg_dtype or self.cfg.compute_dtype)
        circular = self.cfg.leg_padding == "circular"
        x = x.astype(compute_dtype)
        for name, features, kernel, strides in _conv_specs(self.cfg):
            if circular:
                # Wrap-pad the width (the image is a 360-degree panorama):
                # out[j] covers columns j*sw .. j*sw+kw-1 mod W, so the
                # feature space stays exactly periodic (W' = W/stride) and
                # input-roll equivariance is exact — no border loss, no
                # yaw aliasing (ModelConfig.leg_padding docstring).
                kw = kernel[1]
                if kw > 1:
                    x = jnp.concatenate([x, x[:, :, : kw - 1, :]], axis=2)
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
        # Feature volumes are always float32 downstream (descriptor DB rows,
        # correlation peaks, delta head): only the conv stack runs in the
        # reduced dtype; the cast back is free relative to the convs.
        return jnp.squeeze(x, axis=1).astype(jnp.float32)  # (B, W', 128)
