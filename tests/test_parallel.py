"""Mesh/sharding mechanism tests beyond DP: the tensor-parallel head.

TP is closed-by-design for production (docs/PARALLELISM.md: the head runs
at the fp32 MXU roofline on one chip, so intra-op sharding buys nothing),
but the MECHANISM is validated here so the decision is evidence, not a
blind spot: the head's two channel-contracting ops (fused delta+c_conv1
and the circular correlation) are sharded over the channel axis with
shard_map + psum and must match the replicated computation.
"""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from overlapnet_tpu.ops.correlation import circular_correlation
from overlapnet_tpu.ops.delta import delta_conv1
from overlapnet_tpu.parallel.mesh import make_mesh


def test_channel_sharded_head_matches_replicated():
    """Channel-sharded scoring (C=128 split over 8 devices, psum over the
    channel contraction) == replicated scoring. This is the tensor-parallel
    layout the delta/correlation heads would use if a future model outgrew
    one chip."""
    from functools import partial

    from jax import shard_map

    mesh = make_mesh(8, axis_names=("model",), devices=jax.devices("cpu"))
    rng = np.random.default_rng(0)
    bsz, w, c, s, f = 2, 90, 128, 15, 64
    fa = rng.normal(size=(bsz, w, c)).astype(np.float32)
    fb = rng.normal(size=(bsz, w, c)).astype(np.float32)
    kernel = (rng.normal(size=(1, s, c, f)) * 0.05).astype(np.float32)
    bias = rng.normal(size=(f,)).astype(np.float32)

    # replicated reference
    full_delta = np.asarray(delta_conv1(fa, fb, kernel, bias, stride=s))
    full_corr = np.asarray(circular_correlation(jnp.asarray(fa), jnp.asarray(fb)))

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(None, None, "model"), P(None, None, "model"),
                  P(None, None, "model", None)),
        out_specs=(P(), P()),
    )
    def sharded_score(fa_s, fb_s, kernel_s):
        # each device holds C/8 channels; both contractions psum over them
        d = delta_conv1(fa_s, fb_s, kernel_s, None, stride=s)
        d = jax.lax.psum(d, "model")
        corr = circular_correlation(fa_s, fb_s)
        corr = jax.lax.psum(corr, "model")
        return d, corr

    shard = NamedSharding(mesh, P(None, None, "model"))
    d_sh, corr_sh = sharded_score(
        jax.device_put(fa, shard),
        jax.device_put(fb, shard),
        jax.device_put(kernel, NamedSharding(mesh, P(None, None, "model", None))),
    )
    np.testing.assert_allclose(
        np.asarray(d_sh) + bias, full_delta, rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(corr_sh), full_corr, rtol=1e-4, atol=1e-3)
