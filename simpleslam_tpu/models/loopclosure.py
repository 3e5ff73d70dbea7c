"""Loop-closure detection + verification (reference LoopClosureManager).

Parity with ``backend/src/LoopClosureManager.cpp:11-127``:
- ``add_context``: for each new keyframe, voxel-downsample its cloud at
  ``contextDownSampleGridSize`` and append a ScanContext descriptor (:28-37);
- ``lc_handler_once``: for each unprocessed context, ScanContext query ->
  candidate keyframe; build a history submap of ``+-historySubmapRange``
  neighbor keyframes transformed into the map frame and downsampled (:40-60);
  verify by VGICP with the loosened LC parameters; accept when converged and
  fitness < ``fitnessThreshold``; push an ``LCResult`` and fire the LC event
  (:62-119).

Deliberate fix over the reference: the accepted between-measurement uses the
**VGICP-refined** pose, ``between = old_pose^-1 * refined``. The reference
computes ``old_pose.inverse() * cur_pose`` from the *unrefined* current
estimate (LoopClosureManager.cpp:108) — a factor whose residual is zero at
the current estimate, i.e. no correction signal (consistent with its README
benchmarking LC disabled). A loop closure that actually closes loops needs
the refined pose.

Descriptor storage is a fixed-capacity device array; queries are one jitted
call (ops/scancontext.py).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np

from .. import native
from ..ops import pointcloud as pcops
from ..ops import scancontext as sc
from ..utils.concurrency import SafeDeque
from ..utils.config import Params
from ..utils.logging import Logger
from .mapmanager import MapManager
from .registration import VgicpRegister


@dataclass
class LCResult:
    from_idx: int
    to_idx: int
    between: np.ndarray  # (4, 4): T_from^-1 * T_to_refined


class LoopClosureManager:
    def __init__(self, map_manager: MapManager):
        cfg = Params.get_instance()
        lc_cfg = cfg["backend"]["lc"]
        sc_cfg = cfg["backend"]["context"]["scancontext"]
        self.lg = Logger.get_instance()
        self.map_manager = map_manager
        self.kf_obj = map_manager.kf_obj

        self.context_ds = float(lc_cfg["contextDownSampleGridSize"])
        self.history_range = int(lc_cfg["historySubmapRange"])
        self.fitness_thresh = float(lc_cfg["fitnessThreshold"])
        self.num_exclude_recent = int(sc_cfg["numExcludeRecent"])
        self.num_candidates = int(sc_cfg["numCandidatesFromTree"])
        self.dist_thres = float(sc_cfg["scDistThres"])
        self.lidar_height = float(cfg["tf"]["lidar_height"])

        cap = int(cfg["tpu"]["max_keyframes"])
        self._cap = cap
        self.descs = jnp.zeros((cap, sc.NUM_RING, sc.NUM_SECTOR), jnp.float32)
        self.ring_keys = jnp.zeros((cap, sc.NUM_RING), jnp.float32)
        self.n_contexts = 0
        self.lc_size = 0  # processed watermark (lc_size_)

        self.register = VgicpRegister()
        self.register.init_for_lc()
        self.lc_queue: SafeDeque[LCResult] = SafeDeque(10)
        self._ctx_capacity = int(cfg["tpu"]["ds_scan_capacity"])

    # -- context ingestion (LoopClosureManager.cpp:28-37; call under kf lock) --
    def add_context(self) -> None:
        kfs = self.kf_obj.keyframes
        for i in range(self.n_contexts, len(kfs)):
            if i >= self._cap:
                self.lg.error("context capacity (%d) exceeded!", self._cap)
                return
            xyz = native.voxel_downsample_first(kfs[i].xyz, self.context_ds)
            pc = pcops.from_numpy(xyz, self._ctx_capacity)
            d = sc.make_descriptor(pc.xyz, pc.mask, self.lidar_height)
            self.descs = self.descs.at[i].set(d)
            self.ring_keys = self.ring_keys.at[i].set(sc.ring_key(d))
            self.n_contexts = i + 1

    # -- history submap (LoopClosureManager.cpp:40-60; call under kf lock) -----
    def _history_submap(self, key: int) -> np.ndarray:
        kfs = self.kf_obj.keyframes
        sel = [i for i in range(key - self.history_range,
                                key + self.history_range + 1)
               if 0 <= i < len(kfs)]
        merged = native.transform_concat(
            [kfs[i].xyz for i in sel],
            np.stack([kfs[i].pose for i in sel]) if sel else np.zeros((0, 4, 4)))
        return native.voxel_downsample_first(merged, self.context_ds)

    # -- detection pass (LoopClosureManager.cpp:62-119) ------------------------
    def lc_handler_once(self) -> int:
        """Process all new contexts; returns the number of accepted closures."""
        accepted = 0
        for i in range(self.lc_size, self.n_contexts):
            q = sc.query(self.descs, self.ring_keys, jnp.int32(i),
                         jnp.int32(self.num_exclude_recent),
                         jnp.float32(self.dist_thres),
                         num_candidates=self.num_candidates)
            old_key = int(q.idx)
            if old_key < 0:
                continue
            self.lg.info("%d to %d min dist: %.4f", i, old_key, float(q.min_dist))

            with self.kf_obj.lock:
                kfs = self.kf_obj.keyframes
                old_pose = kfs[old_key].pose.copy()
                cur_pose = kfs[i].pose.copy()
                scan_xyz = kfs[i].xyz
                submap = self._history_submap(old_key)

            cap = int(Params.get_instance()["tpu"]["submap_capacity"])
            if len(submap) > cap:
                self.lg.warn("LC submap truncated: %d > capacity %d",
                             len(submap), cap)
            sub_pc = pcops.from_numpy(submap, cap)
            target = self.register.build_target(
                sub_pc, jnp.asarray(old_pose[:3, 3].astype(np.float32)))
            src = pcops.from_numpy(scan_xyz, self._ctx_capacity)
            refined, conv = self.register.scan2map(src, target, cur_pose)
            fs = self.register.get_fitness_score()
            self.lg.info("%d to %d fitness score: %.4f (conv=%s)",
                         old_key, i, fs, conv)
            if conv and fs < self.fitness_thresh:
                between = np.linalg.inv(old_pose) @ refined
                self.lc_queue.push_back(LCResult(old_key, i, between), block=False)
                accepted += 1

        self.lc_size = self.n_contexts
        if accepted:
            self.kf_obj.lc_is_happening()
        return accepted


