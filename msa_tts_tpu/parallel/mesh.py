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


def make_mesh(dp: int | None = None, task: int = 1, tp: int = 1,
              devices=None) -> Mesh:
    """Create a ``(dp, task)`` mesh — or ``(dp, task, tp)`` when a
    tensor-parallel degree > 1 is requested.  ``dp=None`` uses all
    remaining devices for data parallelism.

    ``tp`` is the innermost axis (fastest-varying over the device
    order) so tensor-parallel collectives — the per-step all_gathers
    GSPMD inserts for the sharded LSTM/projection weights — ride
    adjacent-chip ICI links while dp/task gradient psums span the
    slower outer dimension.  With tp=1 the mesh stays 2-axis, so every
    existing ``P("dp"/"task")`` spec (and shard_map over the 2-D meta
    layout) is unchanged."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    tp = int(tp or 1)
    if dp is None:
        if n % (task * tp) != 0:
            raise ValueError(
                f"{n} devices not divisible by task={task} x tp={tp}"
            )
        dp = n // (task * tp)
    if dp * task * tp > n:
        raise ValueError(
            f"mesh {dp}x{task}x{tp} needs {dp * task * tp} devices, "
            f"have {n}"
        )
    if tp == 1:
        grid = np.asarray(devices[: dp * task]).reshape(dp, task)
        return Mesh(grid, axis_names=("dp", "task"))
    grid = np.asarray(devices[: dp * task * tp]).reshape(dp, task, tp)
    return Mesh(grid, axis_names=("dp", "task", "tp"))


def single_device_mesh() -> Mesh:
    return make_mesh(dp=1, task=1)
