"""Kernel-backend resolution shared by serving, the inference drivers
and the vocoders: ``auto`` → the whole-loop Pallas kernels on real TPU
hardware, the XLA paths everywhere else (CPU tests, interpret mode,
GPU)."""

from __future__ import annotations

import jax


def on_tpu() -> bool:
    """True when any visible device is a TPU (incl. the axon relay,
    whose devices stringify as 'TPU v5 lite' with a non-tpu platform
    tag)."""
    return any(
        "tpu" in str(getattr(d, "platform", "")).lower()
        or "tpu" in str(d).lower()
        for d in jax.devices()
    )


def resolve_kernel_backend(choice: str | None) -> str:
    """Map a ``pallas`` / ``xla`` / ``auto`` (default) choice to the
    backend to use on this host.

    Anything other than those three (or None) raises: a typo like
    ``"Pallas"`` silently falling back to platform detection would make
    the operator believe the kernel is forced on while the XLA path
    runs."""
    if choice is not None:
        choice = str(choice).lower()
    if choice in ("pallas", "xla"):
        return choice
    if choice not in (None, "auto"):
        raise ValueError(
            f"unknown kernel backend {choice!r}: expected 'pallas', "
            "'xla' or 'auto'"
        )
    return "pallas" if on_tpu() else "xla"
