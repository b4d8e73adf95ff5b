from overlapnet_tpu.models.heads import CorrelationHead, DeltaConv1OverlapHead
from overlapnet_tpu.models.legs import SiameseLegs, leg_output_width
from overlapnet_tpu.models.siamese import (
    OverlapNet,
    build_model,
    init_params,
    make_head_apply,
    make_leg_apply,
)

__all__ = [
    "CorrelationHead",
    "DeltaConv1OverlapHead",
    "OverlapNet",
    "SiameseLegs",
    "build_model",
    "init_params",
    "leg_output_width",
    "make_head_apply",
    "make_leg_apply",
]
