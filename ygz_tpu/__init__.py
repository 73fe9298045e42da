"""ygz_tpu — a TPU-native visual(-inertial) SLAM framework.

A ground-up JAX/XLA/Pallas re-design of the hybrid SLAM system in
gaoxiang12/ORB-YGZ-SLAM (ORB-SLAM2 features + SVO-style sparse direct
alignment + VI-ORB IMU fusion). Nothing here is a port: the reference's
threads+pointers architecture is replaced by a functional pipeline over
fixed-shape arrays, batched Gauss-Newton optimizers with sparse Schur
complements, and Pallas kernels for the pixel-level hot loops.

Layer map (mirrors SURVEY.md §7 build plan):
  core/      Lie groups (SE3/SO3), camera models, robust costs, GN/LM driver
  ops/       image kernels: pyramid, FAST, ORB describe, KLT align, Hamming
  matching/  projection search, BoW vocabulary, rotation-consistency filters
  backend/   batched bundle adjustment: pose-opt, local/global BA, Sim3 graph
  imu/       on-manifold preintegration, NavState, visual-inertial init
  pipeline/  MapState pytree, tracking cascade, local mapping, loop closing
  parallel/  device-mesh sharding for offline multi-frame throughput
  utils/     dataset loaders, YAML config, trajectory I/O, timing
  apps/      CLI drivers matching the reference's seven example binaries
  eval/      ATE evaluation (SE3 Horn + 7DoF Sim3 alignment)
"""

__version__ = "0.1.0"
