"""Device mesh construction and multi-host initialization.

TPU-native replacement for a distributed "backend": topology = a
``jax.sharding.Mesh`` with named axes; communication = XLA collectives
inserted by GSPMD (pjit) or written explicitly (shard_map + psum). Axes
used across the framework:

  * ``dp`` — data parallel over graphs in a batch;
  * ``ep`` — edge parallel over the edge set of one large graph
    (the map graph / scale-up benchmarks).
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh


def maybe_initialize_distributed() -> None:
    """Initialize multi-host JAX when launched under a pod launcher.

    No-op on a single host. Controller discovery uses the standard JAX env
    (COORDINATOR_ADDRESS etc.); call once at program start before any jax op.
    """
    if os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get("COORDINATOR_ADDRESS"):
        jax.distributed.initialize()


def make_mesh(
    dp: int | None = None,
    ep: int = 1,
    *,
    devices: list | None = None,
) -> Mesh:
    """Build a ('dp', 'ep') mesh over the available devices.

    ``dp=None`` uses all remaining devices after ``ep``. ICI-friendly
    ordering: jax.devices() order already follows the physical torus on TPU,
    so contiguous ep groups ride ICI neighbors.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        if n % ep:
            raise ValueError(f"{n} devices not divisible by ep={ep}")
        dp = n // ep
    if dp * ep != n:
        raise ValueError(f"dp({dp}) * ep({ep}) != devices({n})")
    arr = np.array(devices).reshape(dp, ep)
    return Mesh(arr, axis_names=("dp", "ep"))
