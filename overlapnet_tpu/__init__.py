"""OverlapNet-TPU: a TPU-native LiDAR loop-closure framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of PRBonn/OverlapNet
(reference: /root/reference): a siamese CNN that predicts the overlap and the
relative yaw angle between two LiDAR scans rendered as 64x900 spherical range
images, embedded in a loop-closure-detection pipeline for 3D LiDAR SLAM.

Layer map (TPU-first):
  core/       typed configs, registries, metrics
  geometry/   jittable spherical projection, normal maps, GT overlap/yaw
  ops/        Pallas + XLA kernels (fused delta-conv, circular correlation)
  models/     flax siamese legs + overlap/orientation heads
  data/       GT npz schema, balancing, batch pipeline
  train/      pjit training loop, losses, schedules, checkpoints, eval
  lcd/        serving API (Infer), sharded descriptor DB, LCD engine
  parallel/   device mesh + sharding helpers
  cli/        demo-equivalent entry points
"""

__version__ = "0.1.0"
