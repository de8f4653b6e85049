"""Sequence-mask and padding utilities (static-shape, jit-friendly)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def sequence_mask(lengths, max_len: int, xp=jnp):
    """Boolean mask ``(B, max_len)``; True for valid positions ``t < len``.

    (The reference's ``get_mask_from_lengths`` returns the *inverted* mask —
    True at padding; see msa_tts/models/modules_tacotron2nv/modules.py:40-45.
    We use valid=True and invert at the call sites that need padding masks.)
    """
    ids = xp.arange(max_len)
    return ids[None, :] < xp.asarray(lengths)[:, None]


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = -1,
                    value: float = 0.0) -> np.ndarray:
    """Pad ``axis`` of a numpy array up to the next multiple of ``multiple``."""
    size = x.shape[axis]
    target = ((size + multiple - 1) // multiple) * multiple
    if target == size:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (0, target - size)
    return np.pad(x, pads, constant_values=value)


def pad_axis_to(x: np.ndarray, target: int, axis: int = -1,
                value: float = 0.0) -> np.ndarray:
    """Pad ``axis`` of a numpy array up to exactly ``target`` elements."""
    size = x.shape[axis]
    if size > target:
        raise ValueError(f"axis size {size} exceeds target {target}")
    if size == target:
        return x
    pads = [(0, 0)] * x.ndim
    pads[axis if axis >= 0 else x.ndim + axis] = (0, target - size)
    return np.pad(x, pads, constant_values=value)
