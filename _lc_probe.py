"""Probe: find a sim config where a full mapping run triggers loop closure
and measurably benefits from it. Runs on CPU."""
import sys

import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np  # noqa: E402

from simpleslam_tpu.pipeline import app, simulate as sim  # noqa: E402
from simpleslam_tpu.pipeline.streamed import run_streamed  # noqa: E402
from simpleslam_tpu.utils.config import Params  # noqa: E402
from simpleslam_tpu.utils.logging import Logger  # noqa: E402
import logging  # noqa: E402

Logger.get_instance().set_level(logging.WARNING)

n_scans = int(sys.argv[1]) if len(sys.argv) > 1 else 150
radius = float(sys.argv[2]) if len(sys.argv) > 2 else 6.0
speed = float(sys.argv[3]) if len(sys.argv) > 3 else 3.0
n_az = int(sys.argv[4]) if len(sys.argv) > 4 else 720
n_el = int(sys.argv[5]) if len(sys.argv) > 5 else 12
noise = float(sys.argv[6]) if len(sys.argv) > 6 else 0.01
exclude = int(sys.argv[7]) if len(sys.argv) > 7 else 12

world = sim.make_world(seed=2)
streams = sim.simulate_sequence(world, n_scans=n_scans, seed=2, radius=radius,
                                speed=speed, n_az=n_az, n_el=n_el,
                                scan_noise=noise)

for lc_on in (False, True):
    Params.load({
        "mode": "lo",
        "backend": {"enable": True, "lc": {"enable": lc_on}},
        "frontend": {"pcr": "loam"},
        "backend": {"enable": True,
                    "lc": {"enable": lc_on, "historySubmapRange": 1,
                           "fitnessThreshold": 0.3},
                    "context": {"used": "scancontext",
                                "scancontext": {"numExcludeRecent": exclude,
                                                "numCandidatesFromTree": 5,
                                                "scDistThres": 0.4,
                                                "buildTreeGap": 10,
                                                "searchRatio": 0.1}}},
    })
    system = app.SlamSystem()
    res = run_streamed(system, streams)
    ate = sim.ate_rmse(streams.gt_poses, res.poses, align=False)
    lc_edges = 0
    if system.backend is not None:
        ei = np.asarray(system.backend.edge_i)
        ej = np.asarray(system.backend.edge_j)
        lc_edges = int(np.sum(np.abs(ej - ei) > 5))
    print(f"lc={lc_on} ate={ate:.4f} conv={res.converged_frac:.2f} "
          f"kf={res.keyframe_count} lc_edges={lc_edges}")
