"""simpleslam_tpu — a TPU-native LiDAR SLAM framework.

A from-scratch JAX/XLA/Pallas re-architecture of the capabilities of the
reference C++ system (Rick0514/SimpleSLAM): EKF wheel+IMU fusion, LOAM /
NDT / VGICP scan-to-map registration, keyframe map management, ScanContext
loop closure, and an SE(3) pose-graph backend — built TPU-first:

- point clouds are fixed-capacity padded arrays (static shapes for XLA),
- neighbor search uses a sorted voxel-slab map with batched fixed-radius
  gathers instead of kd-trees,
- per-point loops become vmapped residual/Jacobian evaluation with masked
  einsum normal-equation reductions,
- the pose graph is solved by our own batched Gauss-Newton/LM solver
  (dense blocks on the MXU; CG and sharded multi-chip paths for scale),
- multi-chip scaling rides ``jax.sharding.Mesh`` + ``shard_map`` with ICI
  collectives (no NCCL/MPI translation).

Layer map (mirrors reference layers, see SURVEY.md §1):
  utils/     -> common/ + config/ (types, concurrency, logging, IO, config)
  ops/       -> PCR/ + filter/ + vendored registration libs as device kernels
  models/    -> frontend/ + backend/ + dataproxy state machines
  parallel/  -> (new) multi-chip sharding; no reference counterpart
  pipeline/  -> app/ (offline replay harness, simulation, evaluation)
"""

__version__ = "0.1.0"
