"""Vocoder-trainer convergence: on a tiny budget, training must
measurably reduce the WaveRNN NLL and the HiFi-GAN mel-L1 component,
and trained HiFi-GAN reconstruction must beat the untrained generator.

Full-budget curves (with reconstruction mel-L1 for both vocoders) live
in benchmarks/vocoder_convergence.py; these tests assert the same
direction of travel cheaply enough for CI.  The reference ships only
vocoder inference (msa_tts/utils/wavernn/wavernn.py:95) — the trainers
are beyond-reference capability, so this is their quality gate.
"""

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "benchmarks"),
)

pytestmark = pytest.mark.slow


def test_wavernn_training_reduces_nll(tmp_path):
    from vocoder_convergence import run_wavernn

    row = run_wavernn(str(tmp_path), n_steps=60)
    assert row["nll_last"] < row["nll_first"] - 0.3, row


def test_hifigan_training_reduces_mel_l1(tmp_path):
    from vocoder_convergence import run_hifigan

    row = run_hifigan(str(tmp_path), n_steps=60)
    assert row["mel_loss_last"] < row["mel_loss_first"] * 0.8, row
    # reconstruction of held-out audio must improve over the untrained
    # generator (the end-to-end proof, not just the training loss)
    assert row["recon_mel_l1_trained"] < row["recon_mel_l1_init"], row
