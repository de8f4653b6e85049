"""Host-side batch-shape quantization shared by the serving vocoder
paths (serving.py Griffin-Lim, vocoders/hifigan.py) — one policy so the
two cannot silently diverge."""

from __future__ import annotations

import numpy as np


def pow2_bucket(n: int) -> int:
    """Smallest power of two >= n (bounds the XLA compile count)."""
    return 1 << (max(n, 1) - 1).bit_length()


def pad_mel_batch(
    mels, frame_multiple: int = 32, fill: str = "floor"
) -> np.ndarray:
    """Stack variably-sized ``(n_mels, T_i)`` mels into one
    ``(Bp, n_mels, T_max)`` array: frame counts quantized to
    ``frame_multiple``, batch rows padded to a power-of-two bucket by
    repeating the last mel.  Callers slice row ``i`` of the result back
    to its own length.

    ``fill``: ``"floor"`` pads each mel with its own silence floor
    (right for iterative spectral inversion — Griffin-Lim); ``"zero"``
    pads with literal zeros, which makes a purely-convolutional
    consumer's padded run match its unpadded run exactly — the conv's
    implicit zero padding and the explicit zero frames are the same
    numbers (HiFiGAN.inference_batch)."""
    if fill not in ("floor", "zero"):
        # a typo ("zeros") silently falling back to floor fill would
        # quietly break a conv consumer's zero-fill exactness contract
        raise ValueError(f"unknown fill {fill!r}: expected 'floor' or 'zero'")
    arr = [np.asarray(m) for m in mels]
    B = len(arr)
    Bp = pow2_bucket(B)
    t_max = max(m.shape[1] for m in arr)
    t_max = (
        (t_max + frame_multiple - 1) // frame_multiple
    ) * frame_multiple
    padded = [
        np.pad(
            m, ((0, 0), (0, t_max - m.shape[1])),
            constant_values=0.0 if fill == "zero" else float(m.min()),
        )
        for m in arr
    ]
    padded += [padded[-1]] * (Bp - B)
    return np.stack(padded)
