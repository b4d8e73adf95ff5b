"""Delta op: all-pairs |a_i - b_j| feature differences + first overlap conv.

The reference's DeltaLayer tiles both 1x360x128 feature volumes into a
360x360x128 tensor of absolute differences (reference: generateNet.py:15-61)
and immediately applies ``c_conv1`` — a *linear* 1x15, stride (1,15)
convolution (generateNet.py:96-100). The 360x360x128 intermediate is ~66 MB
fp32 per sample: the dominant memory hotspot of the whole model (SURVEY.md
hard-part #1).

Because c_conv1 is linear with stride == kernel width, the pair is exactly

    out[b, i, j, f] = sum_{k, c} W[k, c, f] * |a[b, i, c] - b[b, S*j + k, c]|

which this module computes *without* holding the full delta tensor:

- ``delta_conv1``: i-blocked fused abs-diff + MXU contraction (XLA path);
  peak live intermediate is B x T x W x C for a block of T rows.
- ``delta_volume``: materialized reference semantics, for tests and as the
  oracle for the fused paths.

A Pallas kernel with identical semantics lives in ``ops.pallas_delta`` and is
selected by ``ModelConfig.delta_head_impl='pallas'``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def delta_volume(a: jax.Array, b: jax.Array, negate: bool = False) -> jax.Array:
    """All-pairs absolute feature differences.

    Args:
      a, b: (B, W, C) feature volumes (the reference's 1xWxC with the height-1
        axis squeezed).
    Returns:
      (B, W, W, C); [b, i, j, c] = |a[b,i,c] - b[b,j,c]|
      (reference generateNet.py:45-61).
    """
    diff = jnp.abs(a[:, :, None, :] - b[:, None, :, :])
    return -diff if negate else diff


def _block_rows(a_blk: jax.Array, b_r: jax.Array, wmat: jax.Array) -> jax.Array:
    """Fused abs-diff + contraction for a block of left rows.

    a_blk: (B, T, C); b_r: (B, J, K, C); wmat: (K, C, F) -> (B, T, J, F).
    """
    diff = jnp.abs(a_blk[:, :, None, None, :] - b_r[:, None, :, :, :])
    return jax.lax.dot_general(
        diff,
        wmat,
        dimension_numbers=(((3, 4), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("stride", "block"))
def delta_conv1(
    a: jax.Array,
    b: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 15,
    block: int = 24,
) -> jax.Array:
    """Fused DeltaLayer + c_conv1 (linear, 1xS kernel, (1,S) stride).

    Args:
      a, b: (B, W, C) left/right feature volumes.
      kernel: (1, S, C, F) HWIO conv kernel (or (S, C, F)).
      bias: (F,) or None.
      stride: S, the conv1 width/stride (reference generateNet.py:88-89).
      block: left rows per step; bounds peak memory at B*block*W*C.

    Returns:
      (B, W, W//S, F) float32 — identical to conv2d(delta_volume(a, b)) with
      the reference's linear c_conv1.
    """
    bsz, w, c = a.shape
    if kernel.ndim == 4:
        kernel = kernel[0]
    s, kc, f = kernel.shape
    assert s == stride and kc == c, (kernel.shape, stride, c)
    j = w // s
    b_r = b[:, : j * s, :].reshape(bsz, j, s, c)
    wmat = kernel  # (S, C, F), contracted over (S, C)

    if w % block != 0:
        block = w  # fall back to a single block

    n_blocks = w // block
    a_blocks = a.reshape(bsz, n_blocks, block, c).transpose(1, 0, 2, 3)
    out = jax.lax.map(lambda blk: _block_rows(blk, b_r, wmat), a_blocks)
    out = out.transpose(1, 0, 2, 3, 4).reshape(bsz, w, j, f)
    if bias is not None:
        out = out + bias
    return out
