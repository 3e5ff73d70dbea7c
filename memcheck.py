"""Long-run runtime sanity: the XLA analogue of the reference's memcheck.

The reference pairs a valgrind leak-check with a bounded-run app mode
(``/root/reference/memcheck.sh:13-14``, ``app/main.cpp:143-150``). For a JAX
runtime the equivalent failure modes are:

- **recompilation leaks**: a shape/dtype/static-arg drift that makes XLA
  recompile per scan (each compile is seconds and caches forever — the
  steady state must be ZERO new compilations);
- **host memory growth**: python-side bookkeeping that accumulates per scan
  beyond the expected keyframe store;
- **device buffer growth**: arrays kept alive per scan instead of being
  donated/replaced (HBM OOM after hours).

This harness maps one long sequence through the streamed executor in
segments with one SlamSystem, and after each segment records: new XLA
compilations (via the ``jax_log_compiles`` logger), host RSS, and live
device arrays. Steady-state segments must show zero compiles, bounded RSS
growth, and a plateaued device-array count.

Usage: python memcheck.py [n_segments] [scans_per_segment] [--out FILE]
Prints one JSON line (and writes it to --out for the artifact record);
exit code 0 iff all checks pass.
"""

from __future__ import annotations

import json
import logging
import sys


class _CompileCounter(logging.Handler):
    """Counts XLA compile events logged under jax_log_compiles."""

    def __init__(self) -> None:
        super().__init__(level=logging.DEBUG)
        self.count = 0

    def emit(self, record: logging.LogRecord) -> None:
        msg = record.getMessage()
        if "Compiling" in msg or "compile" in msg.lower():
            self.count += 1


def _rss_mb() -> float:
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS:"):
                return int(line.split()[1]) / 1024.0
    return float("nan")


def run_memcheck(n_segments: int = 4, scans_per_segment: int = 48,
                 seed: int = 0) -> dict:
    import jax

    jax.config.update("jax_log_compiles", True)
    counter = _CompileCounter()
    for name in ("jax._src.interpreters.pxla", "jax._src.compiler",
                 "jax._src.dispatch"):
        lg = logging.getLogger(name)
        lg.addHandler(counter)
        lg.setLevel(logging.DEBUG)

    from simpleslam_tpu.pipeline import app, simulate as sim
    from simpleslam_tpu.pipeline.streamed import run_streamed
    from simpleslam_tpu.utils.config import Params
    from simpleslam_tpu.utils.logging import Logger

    Logger.get_instance().set_level(logging.ERROR)
    Params.load({"mode": "lo",
                 "backend": {"enable": True, "lc": {"enable": False}},
                 "frontend": {"pcr": "loam"}})

    n = n_segments * scans_per_segment
    world = sim.make_world(seed=seed)
    streams = sim.simulate_sequence(world, n_scans=n, seed=seed)

    def segment(lo, hi):
        sl = slice(lo, hi)
        return sim.SensorStreams(
            streams.scan_stamps[sl], streams.scans[sl], streams.gt_poses[sl],
            streams.wheel_stamps[:0], streams.wheel_poses[:0],
            streams.imu_stamps[:0], streams.imu_quats[:0])

    system = app.SlamSystem()
    segments = []
    for s in range(n_segments):
        c0 = counter.count
        run_streamed(system, segment(s * scans_per_segment,
                                     (s + 1) * scans_per_segment))
        segments.append({
            "segment": s,
            "new_compiles": counter.count - c0,
            "rss_mb": round(_rss_mb(), 1),
            "live_device_arrays": len(jax.live_arrays()),
        })

    # -- checks ---------------------------------------------------------------
    steady = segments[2:]
    compiles_ok = all(s["new_compiles"] == 0 for s in steady)
    rss_growth = segments[-1]["rss_mb"] - segments[1]["rss_mb"]
    # expected per-segment host growth: keyframe clouds kept on the host
    # mirror (~8k pts * 12 B * ~7 kf/segment ~ 1 MB) + noise, PLUS the
    # allocator's high-water drift from registration-target generations
    # (each rebuild allocates a fresh merged map before the old generation
    # frees; on CPU the arena rarely returns pages, so high-water can step
    # up by about one map footprint before plateauing). Bound = 80 MB
    # noise headroom + one target-map footprint from the live config.
    from simpleslam_tpu.utils.config import Params as _P

    _tpu = _P.get_instance()["tpu"]
    _dims = [max(int(d) // 2, 1) for d in _tpu["dense_grid_dims"]]
    _map_mb = (_dims[0] * _dims[1] * _dims[2]
               * 8 * int(_tpu.get("loam_slab_size", 24)) * 3 * 2) / 1e6
    rss_ok = rss_growth < 80.0 + _map_mb
    arr_growth = (segments[-1]["live_device_arrays"]
                  - segments[1]["live_device_arrays"])
    # device stores are preallocated; only O(1) handles per segment may vary
    arrays_ok = arr_growth <= 16

    return {
        "metric": "memcheck",
        "segments": segments,
        "steady_state_compiles_ok": compiles_ok,
        "rss_growth_mb": round(rss_growth, 1),
        "rss_ok": rss_ok,
        "device_array_growth": arr_growth,
        "device_arrays_ok": arrays_ok,
        "ok": bool(compiles_ok and rss_ok and arrays_ok),
    }


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    n_segments = int(args[0]) if args else 4
    per = int(args[1]) if len(args) > 1 else 48
    out = run_memcheck(n_segments, per)
    line = json.dumps(out)
    print(line)
    if "--out" in sys.argv:
        with open(sys.argv[sys.argv.index("--out") + 1], "w") as f:
            f.write(line + "\n")
    return 0 if out["ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
