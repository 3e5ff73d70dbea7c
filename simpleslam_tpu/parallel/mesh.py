"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("dp",)) -> Mesh:
    """1-D (or factored 2-D) device mesh over the first ``n_devices`` devices.

    With two axis names the device count is factored as evenly as possible
    (e.g. 8 -> 2 x 4) so both axes exercise real collectives.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if len(axis_names) == 1:
        return Mesh(np.array(devs), axis_names=tuple(axis_names))
    assert len(axis_names) == 2
    a = _largest_factor_leq_sqrt(n)
    return Mesh(np.array(devs).reshape(a, n // a), axis_names=tuple(axis_names))


def _largest_factor_leq_sqrt(n: int) -> int:
    best = 1
    f = 1
    while f * f <= n:
        if n % f == 0:
            best = f
        f += 1
    return best
