"""Distributed scaling: pose-graph solve + dp registration, 1 vs N hosts.

BASELINE.md target: ">=80 % scaling efficiency of pose-graph solve to
N >= 2 hosts". This harness measures it as honestly as this container
allows (CPU only; the TPU tunnel exposes a single chip):

- each simulated host is one OS process with its own XLA CPU client,
  **pinned to its own physical core** (taskset) so N hosts really have N
  cores of compute — without pinning, N processes share the same cores and
  any "speedup" is fiction;
- cross-host reductions ride jax.distributed gRPC. A measured probe
  (parallel/_collective_probe.py) puts one cross-process psum at ~3 ms —
  vs ~25 us over real ICI and ~14 us in-process — i.e. the harness's
  collective latency is ~100x a pod slice's. The LM+PCG solve issues one
  psum per CG iteration (~1 + iters*(3 + cg) total), so its *measured*
  wall-clock efficiency here is collective-latency-bound, not
  compute-bound. The bench therefore reports BOTH:
    measured_efficiency  = t1 / (N * tN)              (raw wall clock)
    compute_efficiency   = t1 / (N * (tN - n_coll*per_psum))
  where the second subtracts the probed collective latency — the quantity
  that carries to ICI, where n_coll * 25 us is negligible. The
  registration benchmark needs no such correction: its collective budget
  is <= 8 psums per solve, so its measured number is meaningful as-is.

Usage: python benchmarks/bench_scaling.py [K] [reps]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from simpleslam_tpu.parallel import multihost as mh  # noqa: E402

PG_WORKER = "simpleslam_tpu.parallel.workers:posegraph_worker"
REG_WORKER = "simpleslam_tpu.parallel.workers:registration_worker"
PROBE = "simpleslam_tpu.parallel._collective_probe:psum_probe"


def run(worker: str, n_hosts: int, payload: dict, pin: bool = True) -> dict:
    res = mh.run_hosts(n_hosts, worker, payload, devices_per_host=1,
                       pin_cores=pin, timeout=1200.0)
    times = res[0]["times_s"]
    out = {"n_hosts": n_hosts, "best_s": round(min(times), 4),
           "mean_s": round(sum(times) / len(times), 4)}
    for k in ("cost0", "cost", "converged", "pose_err"):
        if k in res[0]:
            out[k] = round(res[0][k], 4) if isinstance(res[0][k], float) \
                else res[0][k]
    return out


def main() -> int:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    n_cores = os.cpu_count() or 1
    n_max = min(2, n_cores)

    lm_iters, cg_iters = 6, 32
    pg_payload = {"k": k, "k_cap": k, "e_cap": 4 * k, "n_lc": k // 2,
                  "max_iters": lm_iters, "cg_iters": cg_iters, "reps": reps,
                  "drift": 0.05}
    out = {"metric": "distributed_scaling", "k": k, "edges": k + k // 2,
           "n_cores": n_cores}

    # --- collective latency probe (pinned, cross-process) -------------------
    probe = mh.run_hosts(n_max, PROBE, {"rows": k // n_max, "iters": 50},
                         devices_per_host=1, pin_cores=True, timeout=300.0)
    per_psum = probe[0]["per_psum_s"]
    out["per_psum_ms"] = round(per_psum * 1e3, 3)

    # --- pose-graph solve ----------------------------------------------------
    pg = {}
    pg["1"] = run(PG_WORKER, 1, pg_payload)
    pg[str(n_max)] = run(PG_WORKER, n_max, pg_payload)
    n_coll = 1 + lm_iters * (3 + cg_iters)  # cost0 + per-LM (cost+grad+diag) + CG
    t1, tn = pg["1"]["best_s"], pg[str(n_max)]["best_s"]
    coll_s = n_coll * per_psum
    pg["n_collectives"] = n_coll
    pg["collective_s"] = round(coll_s, 4)
    pg["measured_efficiency"] = round(t1 / (n_max * tn), 3)
    pg["compute_efficiency"] = round(t1 / (n_max * max(tn - coll_s, 1e-9)), 3)
    out["posegraph"] = pg

    # --- dp registration ------------------------------------------------------
    reg_payload = {"n_src": 131072, "n_map": 16384, "reps": reps}
    reg = {}
    reg["1"] = run(REG_WORKER, 1, reg_payload)
    reg[str(n_max)] = run(REG_WORKER, n_max, reg_payload)
    r1, rn = reg["1"]["best_s"], reg[str(n_max)]["best_s"]
    reg["measured_efficiency"] = round(r1 / (n_max * rn), 3)
    out["registration"] = reg

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
