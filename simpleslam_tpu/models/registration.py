"""Point-cloud registration backends behind one scan2Map-shaped API.

Reference: ``PCR/include/PCR/PointCloudRegister.hpp:12-38`` — an abstract
``scan2Map(src, dst, pose&) -> bool`` plus ``getFitnessScore()``, with
LOAM / NDT / VGICP implementations selected by config
(``frontend/src/LidarOdometry.cpp:44-54``).

Here each backend also owns its *map representation builder*: the frontend
hands the downsampled submap cloud to ``build_target`` and passes the result
back to ``scan2map`` — so LOAM gets a point-slab voxel map while NDT/VGICP
get Gaussian voxel maps, all built on device.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import loam as loam_ops
from ..ops import ndt as ndt_ops
from ..ops import vgicp as vgicp_ops
from ..ops.pointcloud import PointCloud
from ..ops import voxel as vox
from ..utils.config import Params


class PointCloudRegister:
    """Abstract register (PointCloudRegister.hpp:12-38)."""

    def __init__(self) -> None:
        cfg = Params.get_instance()
        self.tpu_cfg = cfg["tpu"]
        self._fitness: float = float("inf")
        self.is_converge: bool = False

    def build_target(self, submap: PointCloud, origin: jax.Array) -> Any:
        raise NotImplementedError

    def scan2map(self, src: PointCloud, target: Any, pose: np.ndarray) -> Tuple[np.ndarray, bool]:
        """Refine ``pose`` (4, 4 numpy) registering ``src`` to ``target``.

        Returns (refined pose, converged)."""
        raise NotImplementedError

    def get_fitness_score(self) -> float:
        return self._fitness


class LoamRegister(PointCloudRegister):
    """LOAM point-to-plane GN on SE(3) (PCR/src/LoamRegister.cpp:99-223)."""

    # neighbor-search voxel size: must cover the 1.0 m kNN gate with radius 1
    TARGET_GRID = 1.0

    def build_target(self, submap: PointCloud, origin: jax.Array) -> vox.VoxelMap:
        return vox.build_voxel_map(
            submap,
            self.TARGET_GRID,
            origin,
            num_voxels=int(self.tpu_cfg["map_voxel_capacity"]),
            slab_size=int(self.tpu_cfg["max_pts_per_voxel"]),
        )

    def scan2map(self, src: PointCloud, target: vox.VoxelMap, pose: np.ndarray):
        res = loam_ops.scan2map(src, target, jnp.asarray(pose, jnp.float32))
        self.is_converge = bool(res.converged)
        return np.asarray(res.pose, np.float64), self.is_converge


class NdtRegister(PointCloudRegister):
    """OpenMP-NDT equivalent: Gaussian-voxel Newton with DIRECT7 lookups
    (adapter parity: PCR/src/NdtRegister.cpp:6-35, resolution 1.0)."""

    RESOLUTION = 1.0

    def build_target(self, submap: PointCloud, origin: jax.Array) -> vox.GaussianVoxelMap:
        return vox.build_gaussian_voxel_map(
            submap,
            self.RESOLUTION,
            origin,
            num_voxels=int(self.tpu_cfg["map_voxel_capacity"]),
        )

    def scan2map(self, src: PointCloud, target: vox.GaussianVoxelMap, pose: np.ndarray):
        res = ndt_ops.align(src, target, jnp.asarray(pose, jnp.float32))
        self.is_converge = bool(res.converged)
        return np.asarray(res.pose, np.float64), self.is_converge


class VgicpRegister(PointCloudRegister):
    """FastVGICP equivalent: voxelized distribution-to-distribution GICP
    (adapter parity: PCR/src/VgicpRegister.cpp:6-48, resolution 1.0)."""

    RESOLUTION = 1.0

    def __init__(self) -> None:
        super().__init__()
        self._lc_mode = False

    def init_for_lc(self) -> None:
        """Loosen for loop-closure verification (VgicpRegister.cpp:26-33)."""
        self._lc_mode = True

    def build_target(self, submap: PointCloud, origin: jax.Array) -> vgicp_ops.VgicpTarget:
        return vgicp_ops.build_target(
            submap,
            self.RESOLUTION,
            origin,
            num_voxels=int(self.tpu_cfg["map_voxel_capacity"]),
        )

    def scan2map(self, src: PointCloud, target: vgicp_ops.VgicpTarget, pose: np.ndarray):
        res = vgicp_ops.align(
            src, target, jnp.asarray(pose, jnp.float32), lc_mode=self._lc_mode
        )
        self.is_converge = bool(res.converged)
        self._fitness = float(res.fitness)
        return np.asarray(res.pose, np.float64), self.is_converge


def make_register(pcr_type: Optional[str] = None) -> PointCloudRegister:
    """Config-driven factory (LidarOdometry.cpp:44-54 semantics incl. the
    unknown-type error)."""
    if pcr_type is None:
        pcr_type = Params.get_instance()["frontend"]["pcr"]
    if pcr_type == "loam":
        return LoamRegister()
    if pcr_type == "ndt":
        return NdtRegister()
    if pcr_type == "vgicp":
        return VgicpRegister()
    raise ValueError(
        f"such pcr type({pcr_type}) is not exist, please implemented your self!"
    )
