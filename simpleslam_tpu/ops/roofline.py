"""Analytic roofline model for the registration hot kernel.

The reference's per-stage tictoc discipline (common/time/tictoc.hpp:29-62,
sprinkled at every boundary) told its authors where CPU time went; the TPU
equivalent must additionally say what the *chip* is doing — device-execute vs
link-transfer vs host-idle — and whether the device time is anywhere near the
hardware's speed of light. This module provides the FLOP/byte counts for the
LOAM batch step so the bench can report an MFU estimate and an HBM-bandwidth
utilization alongside the measured device time.

Cost structure after the round-4 redesign: per candidate GATHER (~once per
scan) each of the N query points reads ONE pre-merged slab row of W f32
lanes from HBM (voxel.MergedDenseVoxelMap) and the 5-NN/plane-fit chain
does ~45 VPU flops per candidate ONCE; each GN ITERATION then costs only
~300 per-query flops against the frozen planes (loam.fit_planes /
plane_normal_equations). There is no meaningful MXU work — the model
exists to locate the kernel against the HBM bound, not to flatter it.

Peaks are TPU v5e (the bench chip): 197 TFLOP/s bf16 MXU (f32 work measured
against the same number states an upper bound on MFU honestly — f32 peak is
lower), 819 GB/s HBM.
"""

from __future__ import annotations

from typing import Dict

V5E_PEAK_FLOPS = 197e12  # bf16 MXU peak (upper bound for any precision)
V5E_HBM_BW = 819e9       # bytes/s

# VPU flops per (query, candidate) lane of the normal-equation chain:
# d2 (8: sub+mul+add x3 lanes fused) + 5 argmin rounds (~5x4: min, cmp,
# cumsum lane, select) + centroid/scatter/eigen accumulation (~15) + masked
# residual/einsum contributions (~2). Order-of-magnitude deliberate: the
# conclusion (memory-bound by >100x) is insensitive to +-2x here.
_FLOPS_PER_CAND = 45
# per-query flops independent of candidates: point transform, 3x3 symeig,
# J row, 6x6 outer products (~250)
_FLOPS_PER_QUERY = 250


def loam_batch_cost(n_queries: int, slab_rows: int, lane_width: int,
                    slab_pts: int, n_scans: int, mean_iters: float,
                    mean_gathers: float) -> Dict[str, float]:
    """FLOPs and HBM bytes of one streamed registration batch.

    n_queries: padded query points per scan (the scan-row capacity)
    slab_rows: HBM rows gathered per query (1 for the merged gather)
    lane_width: f32 lanes per gathered row (8 * slab_pts * 3 merged)
    slab_pts: points stored per VOXEL (tpu.loam_slab_size)
    mean_iters / mean_gathers: measured per-scan GN iterations and gather
    refreshes. The candidate-axis flops are paid per GATHER (fit_planes);
    iterations pay only the per-query frozen-plane work.
    """
    cand_pts = 8 * slab_pts
    gather_bytes = (n_scans * mean_gathers * n_queries
                    * slab_rows * lane_width * 4.0)
    flops = n_scans * n_queries * (
        mean_gathers * cand_pts * _FLOPS_PER_CAND
        + mean_iters * _FLOPS_PER_QUERY)
    return {"flops": flops, "hbm_bytes": gather_bytes,
            "cand_pts_per_query": float(cand_pts)}


def utilization(cost: Dict[str, float], device_s: float) -> Dict[str, float]:
    """MFU / HBM utilization / speed-of-light fraction for a measured time."""
    if device_s <= 0:
        return {"mfu": 0.0, "hbm_util": 0.0, "sol_frac": 0.0}
    mfu = cost["flops"] / device_s / V5E_PEAK_FLOPS
    hbm = cost["hbm_bytes"] / device_s / V5E_HBM_BW
    sol_time = max(cost["flops"] / V5E_PEAK_FLOPS,
                   cost["hbm_bytes"] / V5E_HBM_BW)
    return {
        "mfu": round(mfu, 6),
        "hbm_util": round(hbm, 4),
        "sol_frac": round(sol_time / device_s, 4),
    }
