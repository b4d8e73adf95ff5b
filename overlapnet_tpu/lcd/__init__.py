"""Serving + loop-closure detection: descriptor DB, Infer API, gating."""

from overlapnet_tpu.lcd.descriptor_db import DescriptorDB, ShardedDescriptorDB
from overlapnet_tpu.lcd.gating import CovarianceEllipse, candidate_mask
from overlapnet_tpu.lcd.infer import Infer
from overlapnet_tpu.lcd.online import LoopClosure, OnlineLoopCloser

__all__ = [
    "DescriptorDB",
    "ShardedDescriptorDB",
    "CovarianceEllipse",
    "candidate_mask",
    "Infer",
    "LoopClosure",
    "OnlineLoopCloser",
]
