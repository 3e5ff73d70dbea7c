import sys, logging
import jax; jax.config.update("jax_platforms", "cpu")
import numpy as np
from simpleslam_tpu.pipeline import app, simulate as sim
from simpleslam_tpu.pipeline.streamed import run_streamed
from simpleslam_tpu.utils.config import Params
from simpleslam_tpu.utils.logging import Logger
Logger.get_instance().set_level(logging.ERROR)

for radius, speed, n in [(6,1.5,40),(12,1.5,40),(6,3.0,40),(40,1.5,40)]:
    world = sim.make_world(seed=2)
    streams = sim.simulate_sequence(world, n_scans=n, seed=2, radius=radius, speed=speed)
    Params.load({"mode":"lo","backend":{"enable":False},"frontend":{"pcr":"loam"}})
    res = run_streamed(app.SlamSystem(), streams)
    ate = sim.ate_rmse(streams.gt_poses, res.poses, align=False)
    print(f"r={radius} v={speed} n={n}: conv={res.converged_frac:.2f} ate={ate:.3f} kf={res.keyframe_count}")
