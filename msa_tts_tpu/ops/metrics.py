"""Quality metrics.

Mel-cepstral distortion with the reference's constant
``K = 10/ln(10)·sqrt(2)`` and per-utterance length masking
(reference: msa_tts/utils/metrics.py:4-22).  The batch variant is
implemented as a masked, fully vectorized jnp computation so it can run
inside the jitted train step (the reference syncs to host numpy every
step instead).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

MCD_K = 10.0 / math.log(10.0) * math.sqrt(2.0)


def mcd(C, C_hat, xp=jnp):
    """MCD between two (T, D) mel-cepstra."""
    dist = xp.sqrt(xp.sum((C - C_hat) ** 2, axis=-1))
    return MCD_K * xp.mean(dist)


def mcd_batch(output, mel, mel_len, xp=jnp):
    """Masked batch MCD.

    ``output``/``mel``: (B, T, D); ``mel_len``: (B,).  Per-utterance MCD is
    averaged over valid frames only, then averaged over the batch —
    identical to the reference's per-item list comprehension.
    """
    output = xp.asarray(output)
    mel = xp.asarray(mel)
    mel_len = xp.asarray(mel_len)
    T = output.shape[1]
    valid = (xp.arange(T)[None, :] < mel_len[:, None]).astype(output.dtype)
    dist = xp.sqrt(xp.sum((mel - output) ** 2, axis=-1))  # (B, T)
    per_item = xp.sum(dist * valid, axis=1) / xp.maximum(
        mel_len.astype(output.dtype), 1.0
    )
    return MCD_K * xp.mean(per_item)


def mcd_batch_np(output, mel, mel_len):
    """Host/numpy twin of :func:`mcd_batch` (same signature as reference)."""
    return float(mcd_batch(output, mel, mel_len, xp=np))
