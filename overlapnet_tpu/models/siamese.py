"""Full siamese two-head model assembly + leg/head factorization.

Re-design of reference generateSiameseNetworkTemplate (generateNet.py:357-396)
and the leg/head split used by evaluation and serving (reference
testing.py:166-192, infer.py:95-111): the legs encode each scan once into a
(W', 128) feature volume; the heads score pairs of cached feature volumes.
That factorization is the framework's scaling axis (descriptor-DB sharding,
see lcd/descriptor_db.py).
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from overlapnet_tpu.core.config import ModelConfig
from overlapnet_tpu.core.registry import HEADS, LEGS, MODELS
from overlapnet_tpu.models.heads import CorrelationHead, DeltaConv1OverlapHead
from overlapnet_tpu.models.legs import SiameseLegs

Params = Any

LEGS.register("360OutputkLegs", SiameseLegs)
LEGS.register("360OutputkLegsFixed", SiameseLegs)  # frozen via grad masking
HEADS.register("DeltaLayerConv1NetworkHead", DeltaConv1OverlapHead)
HEADS.register("CorrelationHead", CorrelationHead)


class OverlapNet(nn.Module):
    """Siamese two-head network.

    __call__(x1, x2) -> (overlap (B, 1), orientation logits (B, W')).
    ``encode`` / ``score`` expose the leg/head factorization on the same
    parameter tree (flax shares scopes by module name).
    """

    cfg: ModelConfig

    def setup(self):
        self.legs = LEGS.get(self.cfg.legs_type)(self.cfg, name="legs")
        self.overlap_head = HEADS.get(self.cfg.overlap_head)(
            self.cfg, name="overlap_head"
        )
        self.orientation_head = HEADS.get(self.cfg.orientation_head)(
            self.cfg, name="orientation_head"
        )

    def encode(self, x: jax.Array) -> jax.Array:
        """One leg: (B, H, W, C) range image -> (B, W', 128) feature volume."""
        return self.legs(x)

    def score(self, fa: jax.Array, fb: jax.Array):
        """Heads on cached feature volumes -> (overlap, orientation logits)."""
        if self.cfg.correlation_stop_gradient:
            # Train the legs through the overlap loss only: the orientation
            # CE's gradient through the shared legs flattens the features and
            # stalls overlap learning (measured: overlap RMS frozen at the
            # untrained value when both backprop into the legs). Yaw then
            # comes from correlating overlap-learned features; the head's
            # learnable logit scale still trains from the CE.
            ga, gb = jax.lax.stop_gradient(fa), jax.lax.stop_gradient(fb)
        else:
            ga, gb = fa, fb
        return self.overlap_head(fa, fb), self.orientation_head(ga, gb)

    def __call__(self, x1: jax.Array, x2: jax.Array):
        fa = self.encode(x1)
        fb = self.encode(x2)
        return self.score(fa, fb)


MODELS.register("SiameseNetworkTemplate", OverlapNet)


def build_model(cfg: ModelConfig) -> OverlapNet:
    return MODELS.get(cfg.model_type)(cfg)


def init_params(
    cfg: ModelConfig, num_channels: int, rng: jax.Array | int = 0
) -> Params:
    """Initialize the parameter tree for the full model."""
    if isinstance(rng, int):
        rng = jax.random.PRNGKey(rng)
    model = build_model(cfg)
    dummy = jnp.zeros(
        (1, cfg.input_height, cfg.input_width, num_channels), jnp.float32
    )
    # jit: one compiled program instead of hundreds of eager dispatches
    # (matters on remote-device backends where each dispatch is a round trip).
    return jax.jit(model.init)(rng, dummy, dummy)


def make_leg_apply(cfg: ModelConfig) -> Callable[[Params, jax.Array], jax.Array]:
    """Leg-only apply fn (params, images) -> feature volumes."""
    model = build_model(cfg)

    def apply(params, x):
        return model.apply(params, x, method=OverlapNet.encode)

    return apply


def make_head_apply(cfg: ModelConfig):
    """Head-only apply fn (params, fa, fb) -> (overlap, orientation)."""
    model = build_model(cfg)

    def apply(params, fa, fb):
        return model.apply(params, fa, fb, method=OverlapNet.score)

    return apply
