from ..ops.audio import griffin_lim, griffinlim_logmelspec
from .denoiser import AudioDenoiser, reduce_noise
from .hifigan import HiFiGAN, generator_apply, init_generator
from .wavernn import WaveRNN, get_wavernn, init_wavernn, wavernn_forward

__all__ = [
    "griffin_lim",
    "griffinlim_logmelspec",
    "AudioDenoiser",
    "reduce_noise",
    "HiFiGAN",
    "generator_apply",
    "init_generator",
    "WaveRNN",
    "get_wavernn",
    "init_wavernn",
    "wavernn_forward",
]
