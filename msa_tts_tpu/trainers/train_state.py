"""Re-export of the optimizer core (kept for import-path stability;
the implementation lives in msa_tts_tpu.optim to avoid a circular
import between the meta engine and the trainers package)."""

from ..optim import TrainState, clip_by_global_norm, make_optimizer

__all__ = ["TrainState", "clip_by_global_norm", "make_optimizer"]
