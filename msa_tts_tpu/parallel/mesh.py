"""Device-mesh construction for SPMD training.

The reference has no distributed training (SURVEY.md §2.8); this layer is
the TPU-native capability that replaces it: a ``jax.sharding.Mesh`` over
ICI with named axes

  * ``dp``   — data parallel (batch / shot axis),
  * ``task`` — task parallel (meta-learning speaker axis).

All collectives are implicit: the step functions are ordinary jitted
programs and GSPMD inserts ``psum``/``all_gather`` along the mesh axes
from the input/output shardings declared in sharding.py.  The same mesh
extends to multi-slice (DCN) by adding an outer axis — no code changes
in the step functions.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def make_mesh(dp: int | None = None, task: int = 1, devices=None) -> Mesh:
    """Create a ``(dp, task)`` mesh.  ``dp=None`` uses all remaining
    devices for data parallelism."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        if n % task != 0:
            raise ValueError(f"{n} devices not divisible by task={task}")
        dp = n // task
    if dp * task > n:
        raise ValueError(
            f"mesh {dp}x{task} needs {dp * task} devices, have {n}"
        )
    grid = np.asarray(devices[: dp * task]).reshape(dp, task)
    return Mesh(grid, axis_names=("dp", "task"))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, task=1)
