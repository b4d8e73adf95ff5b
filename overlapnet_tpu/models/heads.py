"""Pairwise heads: overlap regression and yaw-orientation correlation.

Overlap head re-designs reference generateDeltaLayerConv1NetworkHead
(generateNet.py:64-116); orientation head re-designs generateCorrelationHead
(generateNet.py:327-354). Layer names c_conv1..3 / overlap_output /
orientation_output are preserved as the checkpoint schema.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from overlapnet_tpu.core.config import ModelConfig
from overlapnet_tpu.ops.correlation import circular_correlation
from overlapnet_tpu.ops.delta import delta_conv1, delta_volume


class _DeltaConv1(nn.Module):
    """Owns the c_conv1 parameters (linear 1xS, stride (1,S) conv applied to
    the all-pairs delta volume) and dispatches between the fused and the
    materialized implementation. Param layout matches nn.Conv (HWIO kernel)
    so checkpoints are interchangeable."""

    features: int
    stride: int
    impl: str  # 'xla' | 'blocked' | 'pallas'

    @nn.compact
    def __call__(self, fa: jax.Array, fb: jax.Array) -> jax.Array:
        c = fa.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.glorot_uniform(),
            (1, self.stride, c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        if self.impl == "xla":
            # Broadcast-diff + conv, written as if materialized; XLA fuses the
            # abs-diff into the convolution so the (B, W, W, C) tensor never
            # reaches HBM (measured: ~60k pairs/s/chip at B>=128 on v5e, fp32
            # VPU-bound — the fastest backend; B=256 would need 17 GB if it
            # actually materialized).
            diff = delta_volume(fa, fb)  # (B, W, W, C)
            out = jax.lax.conv_general_dilated(
                diff,
                kernel.astype(diff.dtype),  # match compute dtype (bf16 path)
                window_strides=(1, self.stride),
                padding="VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            )
            return out + bias
        if self.impl == "pallas":
            from overlapnet_tpu.ops.pallas_delta import delta_conv1_pallas

            return delta_conv1_pallas(fa, fb, kernel, bias, stride=self.stride)
        if self.impl == "blocked":
            # Explicitly i-blocked fused path (bounded peak memory even if the
            # compiler declines to fuse; e.g. non-TPU backends).
            return delta_conv1(fa, fb, kernel, bias, stride=self.stride)
        raise ValueError(f"Unknown delta_head_impl: {self.impl!r}")


class DeltaConv1OverlapHead(nn.Module):
    """Overlap in [0, 1] from two (B, W, C) feature volumes.

    Pipeline (reference generateNet.py:92-114): fused delta+c_conv1 (linear)
    -> c_conv2 SxS-grid ReLU conv -> c_conv3 3x3 ReLU conv -> flatten ->
    Dense(1) sigmoid ('overlap_output').
    """

    cfg: ModelConfig

    @nn.compact
    def __call__(self, fa: jax.Array, fb: jax.Array) -> jax.Array:
        s = self.cfg.conv1_network_head_conv1size
        compute_dtype = jnp.dtype(self.cfg.compute_dtype)
        x = _DeltaConv1(
            features=64, stride=s, impl=self.cfg.delta_head_impl, name="c_conv1"
        )(fa.astype(compute_dtype), fb.astype(compute_dtype))
        x = nn.Conv(
            128,
            (s, 1),
            strides=(s, 1),
            padding="VALID",
            name="c_conv2",
            dtype=compute_dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x.astype(compute_dtype))
        x = nn.relu(x)
        x = nn.Conv(
            256,
            (3, 3),
            padding="VALID",
            name="c_conv3",
            dtype=compute_dtype,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x)
        x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.Dense(
            1,
            name="overlap_output",
            dtype=jnp.float32,
            kernel_init=nn.initializers.glorot_uniform(),
        )(x.astype(jnp.float32))
        return nn.sigmoid(x)  # (B, 1)


class CorrelationHead(nn.Module):
    """Yaw-orientation logits: circular cross-correlation over all W shifts,
    peak centered at bin W//2 (parameter-free in 'none'..'standardization'
    modes; reference generateNet.py:327-354). Yaw degrees at inference =
    W//2 - argmax.

    Extra mode 'cosine' (no reference counterpart): the raw correlation of
    non-centered ReLU features carries a huge positive DC offset (~+400
    logits at init), which saturates the weighted cross-entropy and blows up
    leg gradients until the first optimizer step kills every ReLU. Cosine
    mode zero-centers each feature volume, normalizes by the full Frobenius
    norm (logits in [-1, 1]), and multiplies by a learnable temperature so
    training can sharpen the peak — the contrastive-logit pattern."""

    cfg: ModelConfig

    @nn.compact
    def __call__(self, fa: jax.Array, fb: jax.Array) -> jax.Array:
        mode = self.cfg.correlation_normalize
        if mode == "cosine":
            def center_norm(x):
                x = x - jnp.mean(x, axis=(-2, -1), keepdims=True)
                n = jnp.linalg.norm(x, axis=(-2, -1), keepdims=True)
                return x / jnp.where(n > 0, n, 1.0)

            fa, fb = center_norm(fa), center_norm(fb)
            scale = self.param(
                "logit_scale",
                nn.initializers.constant(10.0),
                (),
                jnp.float32,
            )
            return scale * circular_correlation(
                fa, fb, normalize="none", method=self.cfg.correlation_method
            )
        return circular_correlation(
            fa,
            fb,
            normalize=mode,
            method=self.cfg.correlation_method,
        )  # (B, W) logits
