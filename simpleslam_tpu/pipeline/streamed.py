"""Streamed lo-mode odometry executor: device-resident pose chain, batched
host synchronization.

Why this exists: the per-scan classic path (``pipeline/app.py`` →
``LidarOdometry.generate_odom``) fetches the refined pose and convergence
flag back to the host EVERY scan. On real TPU access paths a blocking
device→host fetch costs a full round-trip (~30 ms through the axon relay,
measured in benchmarks/), which dwarfs the ~0.3 ms of actual compute per
scan. This executor re-architects the loop the TPU way:

- the scan-to-scan pose chain (current + previous pose, for the constant-
  velocity prediction) lives ON DEVICE and feeds the next dispatch directly
  — dispatches are async and cost <1 ms;
- per scan the host does exactly one upload (the padded raw scan; the
  validity mask is derived on device from the padding sentinel);
- results (pose, convergence, fitness) are stacked on device and fetched
  ONCE per ``sync_every`` scans — one round-trip amortized over the batch;
- keyframe selection, submap rebuilds, and backend passes run at batch
  boundaries with <= ``sync_every`` scans of lag. The reference has the
  same asynchrony by construction: its map-update and backend threads run
  behind the odometry thread (MapManager.cpp:151-201, Backend.cpp:270).
  A backend correction is applied to the device chain as the same rigid
  ``delta`` broadcast the classic path applies to the frontend state.

lio mode stays on the classic path (its per-scan odom2map coupling needs
the EKF stream host-side); ``run_offline`` remains the reference-faithful
semantic baseline the tests compare against.
"""

from __future__ import annotations

from functools import partial
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from .. import native
from ..models.mapmanager import KeyFrame, MIN_KF_GAP
from ..ops import geometry as geo
from ..ops.pointcloud import PAD_COORD, PointCloud
from ..utils.config import Params
from ..utils.logging import Logger
from ..utils.tictoc import StageTimers, TicToc
from . import simulate as sim
from .app import SlamResult, SlamSystem


@partial(jax.jit, static_argnames=("ds_capacity", "kind"))
def _streamed_step(raw_xyz: jax.Array, target, pose_prev: jax.Array,
                   pose_prev2: jax.Array, grid: jax.Array,
                   ds_capacity: int, kind: str):
    """One odometry step with on-device constant-velocity prediction.

    ``raw_xyz`` is the padded (capacity, 3) upload; padding lanes carry
    PAD_COORD, so the validity mask is recovered on device (saves two
    uploads per scan). Returns (pose (4,4), packed (18,) [pose16, conv, fit]).
    """
    from ..models.registration import _fused_odometry_step

    mask = raw_xyz[:, 0] < 0.5 * PAD_COORD
    pc = PointCloud(raw_xyz, jnp.zeros(raw_xyz.shape[:1], jnp.float32), mask)
    step = geo.pose_compose(geo.pose_inverse(pose_prev2), pose_prev)
    init = geo.pose_compose(pose_prev, step)
    pose, conv, fit, _ = _fused_odometry_step(pc, target, init, grid,
                                              ds_capacity, kind)
    packed = jnp.concatenate([
        pose.reshape(16), conv.astype(jnp.float32)[None], fit[None]])
    return pose, packed


@partial(jax.jit, static_argnames=("ds_capacity", "kind"))
def _streamed_batch(raw_stack: jax.Array, target, pose_prev: jax.Array,
                    pose_prev2: jax.Array, grid: jax.Array,
                    ds_capacity: int, kind: str):
    """K odometry steps as ONE program: ``lax.scan`` over the scan axis.

    Per-dispatch chaining across the tunnel costs a scheduling round-trip
    per dependency (~45 ms each, measured); folding the chain into one
    program makes it K fused steps of pure device time plus a single fetch.
    ``raw_stack`` is (K, capacity, 3) padded scans. Returns
    ((pose_K, pose_{K-1}), packed (K, 18)).
    """
    from ..models.registration import _fused_odometry_step

    def one(carry, raw):
        prev, prev2 = carry
        mask = raw[:, 0] < 0.5 * PAD_COORD
        pc = PointCloud(raw, jnp.zeros(raw.shape[:1], jnp.float32), mask)
        step = geo.pose_compose(geo.pose_inverse(prev2), prev)
        init = geo.pose_compose(prev, step)
        pose, conv, fit, _ = _fused_odometry_step(pc, target, init, grid,
                                                  ds_capacity, kind)
        packed = jnp.concatenate([
            pose.reshape(16), conv.astype(jnp.float32)[None], fit[None]])
        return (pose, prev), packed

    carry, packed = jax.lax.scan(one, (pose_prev, pose_prev2), raw_stack)
    return carry, packed


@jax.jit
def _apply_delta(delta: jax.Array, pose: jax.Array) -> jax.Array:
    return geo.reorthonormalize(geo.pose_compose(delta, pose))


def run_streamed(system: SlamSystem, streams: sim.SensorStreams,
                 sync_every: int = 8, progress: bool = False) -> SlamResult:
    """Replay ``streams`` through the streamed executor (lo mode only)."""
    if system.mode != "lo":
        raise ValueError("run_streamed supports lo mode; use run_offline for lio")
    lg = Logger.get_instance()
    cfg = Params.get_instance()
    timers = StageTimers()
    tt_all = TicToc()

    mm = system.map_manager
    lo = system.lidar_odometry
    cap = int(cfg["tpu"]["scan_capacity"])
    dsc = int(cfg["tpu"]["ds_scan_capacity"])
    grid = jnp.float32(lo.grid_size)
    kind = system.register.KIND

    scan_stamps = np.asarray(streams.scan_stamps)
    n_scans = len(scan_stamps)
    est_poses: List[np.ndarray] = [np.eye(4)] * n_scans
    n_conv = 0

    # --- bootstrap: scan 0 seeds the map exactly like the classic path -----
    tt = TicToc()
    pose0 = lo.generate_odom(float(scan_stamps[0]), streams.scans[0])
    if mm.update_pending():
        mm.update_map()
    est_poses[0] = pose0
    n_conv += 1
    timers.add("odometry", tt.toc())

    pose_prev = jnp.asarray(pose0.astype(np.float32))
    pose_prev2 = pose_prev  # zero-velocity start
    last_kf_pos = pose0[:3, 3].copy()

    def dispatch(si: int, pose_prev, pose_prev2):
        """Upload + dispatch one batch; returns (batch, packed, new chain).

        The final partial batch is padded by repeating the last scan (extra
        outputs ignored) so only one batch size ever compiles.
        """
        batch = list(range(si, min(si + sync_every, n_scans)))
        target = mm.get_target()
        raws = np.empty((sync_every, cap, 3), np.float32)
        for k in range(sync_every):
            i = batch[min(k, len(batch) - 1)]
            raws[k], _, _ = native.pad_cloud(
                np.asarray(streams.scans[i], np.float32), cap, PAD_COORD)
        pre = pose_prev
        (pose_prev, pose_prev2), packed = _streamed_batch(
            jnp.asarray(raws), target, pose_prev, pose_prev2, grid, dsc, kind)
        if len(batch) < sync_every:
            # partial tail: rewind the device chain to the real last scan
            pose_prev = packed[len(batch) - 1, :16].reshape(4, 4)
            pose_prev2 = (packed[len(batch) - 2, :16].reshape(4, 4)
                          if len(batch) >= 2 else pre)
        return batch, packed, pose_prev, pose_prev2

    def retire(batch, packed) -> None:
        """Fetch one batch's results and do the lagged host bookkeeping."""
        nonlocal n_conv, last_kf_pos, pose_prev, pose_prev2
        stacked = np.asarray(packed)  # ONE fetch per batch
        for k, i in enumerate(batch):
            pose = stacked[k, :16].reshape(4, 4).astype(np.float64)
            conv = stacked[k, 16] > 0.5
            n_conv += bool(conv)
            if not conv:
                lg.warn("pcr not converge!!")
            est_poses[i] = pose
            mm.set_cur_pose(pose)  # fires the >1 m map-update notify itself
            if np.linalg.norm(pose[:3, 3] - last_kf_pos) > MIN_KF_GAP:
                kf_xyz = mm._host_downsample(
                    np.asarray(streams.scans[i], np.float32))
                mm.put_keyframe(KeyFrame(float(scan_stamps[i]), pose, kf_xyz))
                last_kf_pos = pose[:3, 3].copy()

        # backend pass + rigid correction onto the device chain
        if system.backend is not None and mm.kf_obj.is_event_coming():
            ran = system.backend.optim_once()
            if system.loop_closure is not None and \
                    system.loop_closure.lc_handler_once():
                ran = system.backend.optim_once() or ran
            if ran:
                delta = jnp.asarray(
                    system.backend.last_delta.astype(np.float32))
                pose_prev = _apply_delta(delta, pose_prev)
                pose_prev2 = _apply_delta(delta, pose_prev2)

        if mm.update_pending():
            mm.update_map()

    # double-buffered drive: batch N+1 is dispatched BEFORE batch N is
    # fetched, so device execution overlaps the fetch round-trip. Note the
    # backend correction applied in retire() reaches the chain one batch
    # late — the in-flight batch was dispatched with pre-correction poses,
    # matching the classic path where corrections land between scans.
    si = 1
    pending = None
    while si < n_scans or pending is not None:
        tt.tic()
        fresh = None
        if si < n_scans:
            fresh = dispatch(si, pose_prev, pose_prev2)
            batch, packed, pose_prev, pose_prev2 = fresh
            si = batch[-1] + 1
        if pending is not None:
            retire(pending[0], pending[1])
            dt = tt.toc()
            for _ in pending[0]:
                timers.add("odometry", dt / len(pending[0]))
            if progress:
                lg.info("scan %d/%d", pending[0][-1] + 1, n_scans)
        pending = (fresh[0], fresh[1]) if fresh is not None else None

    wall = tt_all.elapsed()
    with mm.kf_obj.lock:
        kf_count = len(mm.kf_obj.keyframes)
    return SlamResult(
        stamps=scan_stamps,
        poses=np.stack(est_poses),
        timers=timers,
        wall_time=wall,
        keyframe_count=kf_count,
        converged_frac=n_conv / max(n_scans, 1),
    )
