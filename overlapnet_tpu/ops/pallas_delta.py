"""Pallas TPU kernel: fused DeltaLayer + c_conv1.

The reference materializes the all-pairs |a_i - b_j| tensor (B, 360, 360, 128)
— ~66 MB fp32 per sample — in HBM and then convolves it (reference:
generateNet.py:15-61, 96-100). Because c_conv1 is *linear* with kernel width
== stride S, the composition is

    out[b, i, j, f] = sum_{k, c} W[k, c, f] * |a[b, i, c] - b[b, S*j + k, c]|

This kernel computes that directly in VMEM: for each (batch, row-tile) grid
step it forms the (T, W, C) abs-diff block on the VPU, reshapes it to
(T*J, S*C) and contracts with the (S*C, F) weight matrix on the MXU. The full
delta tensor never exists in HBM; per-step VMEM is ~T*W*C*4 bytes (~1.4 MB at
T=8, W=360, C=128).

Backward passes through a custom VJP that recomputes sign(a_i - b) per tile
(rematerialization — HBM traffic traded for VPU FLOPs).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(a_ref, b_ref, w_ref, out_ref, *, tile: int, stride: int):
    """One (batch, row-tile) step.

    a_ref: (1, T, C) left rows;  b_ref: (1, W, C) full right volume;
    w_ref: (S*C, F) folded conv1 weights;  out_ref: (1, T*J, F).
    """
    a = a_ref[0]  # (T, C)
    b = b_ref[0]  # (W, C)
    w = w_ref[:]  # (S*C, F)
    t, c = a.shape
    wdim = b.shape[0]
    j = wdim // stride
    # (T, W, C) abs-diff block, then (T*J, S*C) @ (S*C, F) on the MXU.
    diff = jnp.abs(a[:, None, :] - b[None, :, :])
    lhs = diff.reshape(t * j, stride * c)
    out_ref[0] = jnp.dot(lhs, w, preferred_element_type=jnp.float32)


@functools.partial(jax.jit, static_argnames=("stride", "tile"))
def _delta_conv1_fwd(a, b, wmat, *, stride: int, tile: int):
    bsz, w, c = a.shape
    f = wmat.shape[1]
    j = w // stride
    grid = (bsz, w // tile)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tile=tile, stride=stride),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tile, c), lambda bi, ti: (bi, ti, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, w, c), lambda bi, ti: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((stride * c, f), lambda bi, ti: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, tile * j, f), lambda bi, ti: (bi, ti, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, w * j, f), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * bsz * w * j * stride * c * f + bsz * w * w * c,
            bytes_accessed=4 * bsz * w * c * 2 + 4 * bsz * w * j * f,
            transcendentals=0,
        ),
    )(a, b, wmat)
    return out.reshape(bsz, w, j, f)


def _bwd_block(a_blk, b_r, wmat, g_blk):
    """XLA backward for a block of left rows (rematerializes the sign).

    a_blk: (B, T, C); b_r: (B, J, S, C); wmat: (S, C, F); g_blk: (B, T, J, F).
    Returns (da_blk (B, T, C), db_r (B, J, S, C), dw (S, C, F)).
    """
    diff = a_blk[:, :, None, None, :] - b_r[:, None, :, :, :]  # (B,T,J,S,C)
    sgn = jnp.sign(diff)
    # dL/d|diff|[b,t,j,s,c] = sum_f g[b,t,j,f] * w[s,c,f]
    gw = jax.lax.dot_general(
        g_blk, wmat,
        dimension_numbers=(((3,), (2,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (B, T, J, S, C)
    gd = gw * sgn
    da = jnp.sum(gd, axis=(2, 3))
    db = -jnp.sum(gd, axis=1)
    absd = jnp.abs(diff)
    dw = jax.lax.dot_general(
        absd, g_blk,
        dimension_numbers=(((0, 1, 2), (0, 1, 2)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (S, C, F)
    return da, db, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _delta_conv1_core(a, b, wmat, stride):
    tile = _pick_tile(a.shape[1])
    return _delta_conv1_fwd(a, b, wmat.reshape(-1, wmat.shape[-1]),
                            stride=stride, tile=tile)


def _core_fwd(a, b, wmat, stride):
    return _delta_conv1_core(a, b, wmat, stride), (a, b, wmat)


def _core_bwd(stride, res, g):
    a, b, wmat = res
    bsz, w, c = a.shape
    j = w // stride
    b_r = b[:, : j * stride, :].reshape(bsz, j, stride, c)
    block = _pick_tile(w, for_bwd=True)
    n_blocks = w // block
    a_blocks = a.reshape(bsz, n_blocks, block, c).transpose(1, 0, 2, 3)
    g_blocks = g.reshape(bsz, n_blocks, block, j, -1).transpose(1, 0, 2, 3, 4)

    def body(carry, xs):
        db_acc, dw_acc = carry
        a_blk, g_blk = xs
        da_blk, db, dw = _bwd_block(a_blk, b_r, wmat, g_blk)
        return (db_acc + db, dw_acc + dw), da_blk

    (db_r, dw), da_blocks = jax.lax.scan(
        body,
        (jnp.zeros_like(b_r), jnp.zeros_like(wmat)),
        (a_blocks, g_blocks),
    )
    da = da_blocks.transpose(1, 0, 2, 3).reshape(bsz, w, c)
    db = jnp.zeros_like(b).at[:, : j * stride, :].set(
        db_r.reshape(bsz, j * stride, c)
    )
    return da, db, dw


_delta_conv1_core.defvjp(_core_fwd, _core_bwd)


def _pick_tile(w: int, for_bwd: bool = False) -> int:
    """Largest tile of left rows that divides W, capped for VMEM."""
    cap = 24 if for_bwd else 8
    for t in range(cap, 0, -1):
        if w % t == 0:
            return t
    return 1


def delta_conv1_pallas(
    a: jax.Array,
    b: jax.Array,
    kernel: jax.Array,
    bias: jax.Array | None = None,
    *,
    stride: int = 15,
) -> jax.Array:
    """Fused DeltaLayer + linear c_conv1, Pallas forward + remat backward.

    Args:
      a, b: (B, W, C) left/right leg feature volumes.
      kernel: (1, S, C, F) HWIO conv kernel (or (S, C, F)).
      bias: (F,) or None.

    Returns: (B, W, W//S, F) float32, identical to
    ``ops.delta.delta_conv1`` / conv2d over the materialized delta volume.
    """
    if kernel.ndim == 4:
        kernel = kernel[0]
    s, c, f = kernel.shape
    assert s == stride and c == a.shape[-1], (kernel.shape, stride, a.shape)
    out = _delta_conv1_core(
        a.astype(jnp.float32), b.astype(jnp.float32),
        kernel.astype(jnp.float32), stride,
    )
    if bias is not None:
        out = out + bias
    return out
