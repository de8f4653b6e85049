"""msa_tts_tpu — TPU-native few-shot speaker-adaptation TTS framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``HamedHemati/MetaSpeakerAdaptation-TTS`` (speaker-conditioned Tacotron-2
acoustic model; joint / MAML / Reptile / continual-learning trainers;
few-shot adaptation inference; Griffin-Lim / WaveRNN / HiFi-GAN vocoders).

Design stance (TPU-first, not a port):
  * pure-functional models — parameters are explicit pytrees, all state
    (attention recursions, RNN carries, batch-norm statistics) is threaded
    through ``lax.scan`` carries rather than held on module objects;
  * static shapes everywhere — length-bucketed batches, masked scans;
  * meta-learning = ``jax.grad`` through a scanned inner loop, ``vmap``
    over the task (speaker) axis, sharded over the ICI mesh with ``pjit``;
  * hot kernels (fused LSTM cell, attention step) available as Pallas
    TPU kernels with pure-XLA fallbacks.
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("MSA_PLATFORM"):
    # Explicit platform override (e.g. MSA_PLATFORM=cpu for hermetic CPU
    # runs in environments whose sitecustomize pins JAX to a TPU plugin).
    import jax as _jax

    try:
        _jax.config.update("jax_platforms", _os.environ["MSA_PLATFORM"])
    except Exception:
        pass
