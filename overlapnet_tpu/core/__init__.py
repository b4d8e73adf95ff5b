from overlapnet_tpu.core.config import (
    ChannelConfig,
    DataConfig,
    ExperimentConfig,
    ModelConfig,
    OverlapNetConfig,
    TrainConfig,
    load_config,
)
from overlapnet_tpu.core.registry import Registry

__all__ = [
    "ChannelConfig",
    "DataConfig",
    "ExperimentConfig",
    "ModelConfig",
    "OverlapNetConfig",
    "TrainConfig",
    "Registry",
    "load_config",
]
