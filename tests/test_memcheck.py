"""Runtime-sanity harness test (memcheck.sh / valgrind analogue).

Asserts the streamed executor reaches an XLA steady state: zero new
compilations after warmup segments, bounded host RSS growth, plateaued live
device-array count (the JAX equivalents of a memory leak).
"""

import pytest


@pytest.mark.slow
def test_memcheck_steady_state():
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from memcheck import run_memcheck

    out = run_memcheck(n_segments=3, scans_per_segment=32)
    assert out["steady_state_compiles_ok"], out
    assert out["rss_ok"], out
    assert out["device_arrays_ok"], out
