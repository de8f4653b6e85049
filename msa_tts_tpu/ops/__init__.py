from . import audio, masking, metrics, rnn  # noqa: F401
