from overlapnet_tpu.ops.correlation import circular_correlation, wrap_pad
from overlapnet_tpu.ops.delta import delta_conv1, delta_volume

__all__ = ["circular_correlation", "delta_conv1", "delta_volume", "wrap_pad"]
