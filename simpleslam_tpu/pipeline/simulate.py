"""Synthetic LiDAR world + sensor simulation (deterministic test/bench data).

The reference benchmarks on two private rosbags (BASELINE.md) that are not
redistributable, so the framework ships a simulator producing the same kind
of workload: a park/street-scale world of planar structures, a planar robot
trajectory, a spinning multi-beam LiDAR (Velodyne-16-like), and wheel + IMU
streams with realistic noise. Everything is seeded numpy on the host — the
simulator is a data source, never on the device path.

Conventions (matched to the reference pipeline):
- The SLAM body frame is the lidar frame with z clamped to 0 by the planar
  constraint (trans::SixDof2Mobile applied per scan); the sensor rides
  ``lidar_height`` (config tf.lidar_height = 2.0) above ground, so ground
  points appear near z = -lidar_height in scans — exactly the geometry
  ScanContext compensates with its +LIDAR_HEIGHT shift (ScanContext.cpp:163).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

from ..ops import geometry as geo


@dataclass
class Rect:
    """Axis-aligned rectangular plane patch.

    axis: normal axis (0=x, 1=y, 2=z); offset: plane coordinate along axis;
    bounds: (umin, umax, vmin, vmax) over the two remaining axes in order.
    """

    axis: int
    offset: float
    bounds: Tuple[float, float, float, float]


@dataclass
class World:
    rects: List[Rect] = field(default_factory=list)

    def as_arrays(self):
        axis = np.array([r.axis for r in self.rects], np.int32)
        off = np.array([r.offset for r in self.rects], np.float32)
        bounds = np.array([r.bounds for r in self.rects], np.float32)
        return axis, off, bounds


def make_world(seed: int = 0, extent: float = 120.0, n_buildings: int = 24) -> World:
    """Ground plane + randomly placed box 'buildings' + boundary walls."""
    rng = np.random.default_rng(seed)
    w = World()
    e = extent
    w.rects.append(Rect(2, 0.0, (-e, e, -e, e)))  # ground z=0
    # boundary walls, 6 m tall
    w.rects.append(Rect(0, -e, (-e, e, 0.0, 6.0)))
    w.rects.append(Rect(0, e, (-e, e, 0.0, 6.0)))
    w.rects.append(Rect(1, -e, (-e, e, 0.0, 6.0)))
    w.rects.append(Rect(1, e, (-e, e, 0.0, 6.0)))
    for _ in range(n_buildings):
        cx, cy = rng.uniform(-e * 0.8, e * 0.8, size=2)
        if abs(cx) < 12 and abs(cy) < 12:
            continue  # keep the start area clear
        sx, sy = rng.uniform(4, 14, size=2)
        h = rng.uniform(3, 12)
        x0, x1 = cx - sx / 2, cx + sx / 2
        y0, y1 = cy - sy / 2, cy + sy / 2
        # four vertical faces (u-axis is the lower remaining axis: for axis=0
        # faces, u=y, v=z; for axis=1 faces, u=x, v=z)
        w.rects.append(Rect(0, x0, (y0, y1, 0.0, h)))
        w.rects.append(Rect(0, x1, (y0, y1, 0.0, h)))
        w.rects.append(Rect(1, y0, (x0, x1, 0.0, h)))
        w.rects.append(Rect(1, y1, (x0, x1, 0.0, h)))
        w.rects.append(Rect(2, h, (x0, x1, y0, y1)))  # roof
    return w


_OTHER_AXES = {0: (1, 2), 1: (0, 2), 2: (0, 1)}


def simulate_scan(world: World, sensor_pose: np.ndarray, n_az: int = 900,
                  n_el: int = 16, min_range: float = 0.8, max_range: float = 80.0,
                  noise: float = 0.01, rng: Optional[np.random.Generator] = None) -> np.ndarray:
    """Ray-cast one spinning-LiDAR scan. Returns (n, 3) points in sensor frame.

    sensor_pose: (4, 4) world-from-sensor. Elevation fan -15..+15 deg
    (VLP-16-like); rays hitting nothing in [min_range, max_range] are dropped.
    """
    az = np.linspace(0, 2 * np.pi, n_az, endpoint=False)
    el = np.deg2rad(np.linspace(-15.0, 15.0, n_el))
    azg, elg = np.meshgrid(az, el, indexing="ij")
    d_sensor = np.stack(
        [np.cos(elg) * np.cos(azg), np.cos(elg) * np.sin(azg), np.sin(elg)], axis=-1
    ).reshape(-1, 3)

    R = sensor_pose[:3, :3]
    o = sensor_pose[:3, 3]
    d_world = d_sensor @ R.T  # (Nr, 3)

    axis, off, bounds = world.as_arrays()
    nr = d_world.shape[0]
    np_l = len(axis)
    # t for each ray/plane: (o + t d)[axis] = off
    d_ax = d_world[:, axis]  # (Nr, Np)
    o_ax = o[axis][None, :]  # (1, Np)
    with np.errstate(divide="ignore", invalid="ignore"):
        t = (off[None, :] - o_ax) / d_ax
    t = np.where(np.abs(d_ax) < 1e-9, np.inf, t)
    t = np.where((t >= min_range) & (t <= max_range), t, np.inf)
    # in-bounds test on the two remaining axes (inf t lanes masked out below;
    # compute with a finite stand-in to keep inf*0 NaNs out)
    t_fin = np.where(np.isfinite(t), t, 0.0)
    hit = o[None, None, :] + t_fin[:, :, None] * d_world[:, None, :]  # (Nr, Np, 3)
    u_ax = np.array([_OTHER_AXES[a][0] for a in axis])
    v_ax = np.array([_OTHER_AXES[a][1] for a in axis])
    u = np.take_along_axis(hit, u_ax[None, :, None].repeat(nr, 0), axis=2)[:, :, 0]
    v = np.take_along_axis(hit, v_ax[None, :, None].repeat(nr, 0), axis=2)[:, :, 0]
    ok = (
        np.isfinite(t)
        & (u >= bounds[None, :, 0]) & (u <= bounds[None, :, 1])
        & (v >= bounds[None, :, 2]) & (v <= bounds[None, :, 3])
    )
    t = np.where(ok, t, np.inf)
    tmin = t.min(axis=1)
    valid = np.isfinite(tmin)
    pts_world = o[None, :] + tmin[valid, None] * d_world[valid]
    pts_sensor = (pts_world - o) @ R
    if noise > 0:
        rng = rng or np.random.default_rng(0)
        pts_sensor = pts_sensor + rng.normal(size=pts_sensor.shape) * noise
    return pts_sensor.astype(np.float32)


def make_trajectory(n_scans: int = 200, dt: float = 0.1, speed: float = 1.5,
                    radius: float = 40.0, loop: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    """Planar circular(ish) trajectory: returns (stamps (n,), poses (n, 4, 4)).

    Poses are body poses on the ground plane (z = 0), yaw tangent to the
    path — the geometry the reference's planar clamp assumes.
    """
    stamps = np.arange(n_scans) * dt
    arc = speed * stamps
    if loop:
        theta = arc / radius
        x = radius * np.sin(theta)
        y = radius * (1 - np.cos(theta))
        yaw = theta
    else:
        x = arc
        y = np.zeros_like(arc)
        yaw = np.zeros_like(arc)
    poses = np.tile(np.eye(4, dtype=np.float64), (n_scans, 1, 1))
    c, s = np.cos(yaw), np.sin(yaw)
    poses[:, 0, 0] = c
    poses[:, 0, 1] = -s
    poses[:, 1, 0] = s
    poses[:, 1, 1] = c
    poses[:, 0, 3] = x
    poses[:, 1, 3] = y
    return stamps, poses


def sensor_from_body(body_pose: np.ndarray, lidar_height: float = 2.0) -> np.ndarray:
    """World-from-sensor pose: body pose lifted by the lidar mast height."""
    sp = body_pose.copy()
    sp[2, 3] += lidar_height
    return sp


@dataclass
class SensorStreams:
    """Simulated sensor bundle for one sequence (the 'rosbag')."""

    scan_stamps: np.ndarray          # (S,)
    scans: List[np.ndarray]          # S x (n_i, 3) sensor-frame points
    gt_poses: np.ndarray             # (S, 4, 4) body ground truth
    wheel_stamps: np.ndarray         # (W,)
    wheel_poses: np.ndarray          # (W, 4, 4) wheel-integrated odometry (drifty)
    imu_stamps: np.ndarray           # (I,)
    imu_quats: np.ndarray            # (I, 4) (w, x, y, z) orientation (drifty yaw)


def simulate_sequence(world: World, n_scans: int = 200, dt: float = 0.1,
                      speed: float = 1.5, radius: float = 40.0,
                      lidar_height: float = 2.0, seed: int = 0,
                      wheel_rate: float = 20.0, imu_rate: float = 100.0,
                      scan_noise: float = 0.01,
                      n_az: int = 900, n_el: int = 16) -> SensorStreams:
    rng = np.random.default_rng(seed)
    stamps, poses = make_trajectory(n_scans, dt, speed, radius)
    scans = [
        simulate_scan(world, sensor_from_body(poses[i], lidar_height),
                      n_az=n_az, n_el=n_el, noise=scan_noise, rng=rng)
        for i in range(n_scans)
    ]

    duration = stamps[-1] + dt
    # wheel odometry: integrate gt planar motion with multiplicative slip noise
    wn = int(duration * wheel_rate)
    w_stamps = np.arange(wn) / wheel_rate
    gt_xyyaw = _interp_planar(stamps, poses, w_stamps)
    wheel_xyyaw = gt_xyyaw.copy()
    d = np.diff(gt_xyyaw, axis=0, prepend=gt_xyyaw[:1])
    slip = 1.0 + rng.normal(0, 0.01, size=(wn, 1))
    noise_yaw = rng.normal(0, 0.002, size=wn)
    wheel_xyyaw = np.cumsum(d * np.concatenate([slip, slip, np.ones((wn, 1))], 1), axis=0)
    wheel_xyyaw[:, 2] += np.cumsum(noise_yaw) * 0.02 + gt_xyyaw[0, 2]
    wheel_xyyaw[:, :2] += gt_xyyaw[0, :2]
    wheel_poses = _planar_to_pose(wheel_xyyaw)

    # imu: orientation with slow yaw drift + noise
    inn = int(duration * imu_rate)
    i_stamps = np.arange(inn) / imu_rate
    gt_i = _interp_planar(stamps, poses, i_stamps)
    yaw = gt_i[:, 2] + np.cumsum(rng.normal(0, 1e-4, size=inn)) + rng.normal(0, 5e-4, size=inn)
    quats = np.stack(
        [np.cos(yaw / 2), np.zeros_like(yaw), np.zeros_like(yaw), np.sin(yaw / 2)], axis=1
    )
    return SensorStreams(stamps, scans, poses, w_stamps, wheel_poses, i_stamps, quats)


def _interp_planar(stamps: np.ndarray, poses: np.ndarray, t: np.ndarray) -> np.ndarray:
    """Interpolate (x, y, yaw) of body poses at times t (yaw unwrapped)."""
    x = np.interp(t, stamps, poses[:, 0, 3])
    y = np.interp(t, stamps, poses[:, 1, 3])
    yaw_src = np.unwrap(np.arctan2(poses[:, 1, 0], poses[:, 0, 0]))
    yaw = np.interp(t, stamps, yaw_src)
    return np.stack([x, y, yaw], axis=1)


def _planar_to_pose(xyyaw: np.ndarray) -> np.ndarray:
    n = xyyaw.shape[0]
    poses = np.tile(np.eye(4), (n, 1, 1))
    c, s = np.cos(xyyaw[:, 2]), np.sin(xyyaw[:, 2])
    poses[:, 0, 0] = c
    poses[:, 0, 1] = -s
    poses[:, 1, 0] = s
    poses[:, 1, 1] = c
    poses[:, 0, 3] = xyyaw[:, 0]
    poses[:, 1, 3] = xyyaw[:, 1]
    return poses


# ---------------------------------------------------------------------------
# trajectory metrics (evo-style APE/RPE, the reference's evaluation protocol)
# ---------------------------------------------------------------------------

def ate_rmse(gt: np.ndarray, est: np.ndarray, align: bool = True) -> float:
    """Absolute trajectory error RMSE over translations (optionally SE(3)
    aligned by Umeyama without scale — evo's default APE protocol)."""
    g = gt[:, :3, 3]
    e = est[:, :3, 3]
    if align and len(g) >= 3:
        e = _umeyama_align(e, g)
    return float(np.sqrt(np.mean(np.sum((g - e) ** 2, axis=1))))


def rpe_rmse(gt: np.ndarray, est: np.ndarray, delta: int = 1) -> float:
    """Relative pose error RMSE over translation of per-delta increments."""
    errs = []
    for i in range(len(gt) - delta):
        g_rel = np.linalg.inv(gt[i]) @ gt[i + delta]
        e_rel = np.linalg.inv(est[i]) @ est[i + delta]
        d = np.linalg.inv(g_rel) @ e_rel
        errs.append(np.sum(d[:3, 3] ** 2))
    return float(np.sqrt(np.mean(errs))) if errs else 0.0


def _umeyama_align(src: np.ndarray, dst: np.ndarray) -> np.ndarray:
    mu_s, mu_d = src.mean(0), dst.mean(0)
    cov = (dst - mu_d).T @ (src - mu_s) / len(src)
    U, _, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    return (src - mu_s) @ R.T + mu_d
