"""Every shipped example config must parse and produce a buildable
model configuration — these are the files a new user copies first."""

import glob
import os

import pytest

import jax

from msa_tts_tpu.config import load_params
from msa_tts_tpu.models import config_from_params, init_tacotron2nv
from msa_tts_tpu.optim import make_optimizer
from msa_tts_tpu.utils.g2p.char_list import N_SYMBOLS

ROOT = os.path.join(os.path.dirname(os.path.dirname(__file__)), "examples")
CONFIGS = sorted(glob.glob(os.path.join(ROOT, "*", "params.yml")))


@pytest.mark.parametrize(
    "path", CONFIGS, ids=[os.path.basename(os.path.dirname(c)) for c in CONFIGS]
)
def test_example_config_loads_and_builds(path):
    params = load_params(path)
    mp = dict(params["model"])
    mp["n_mel_channels"] = params["audio_params"]["n_mels"]
    mp["n_symbols"] = N_SYMBOLS
    mp.setdefault("num_speakers", 1)
    cfg = config_from_params(mp)
    assert cfg.n_mel_channels == params["audio_params"]["n_mels"]
    # optimizer blocks parse (incl. reference-style stringified values)
    for key in ("optim", "optim_inner", "optim_outer"):
        if key in params:
            make_optimizer(params[key])
    # the model is buildable at a shrunken copy of the config (full
    # dims would cost ~30 s of init per example on this host)
    tiny = config_from_params(dict(
        mp, symbols_embedding_dim=16, encoder_embedding_dim=16,
        attention_rnn_dim=16, decoder_rnn_dim=16, prenet_dim=8,
        postnet_embedding_dim=16,
        attention_params=dict(mp["attention_params"], attention_dim=8),
    ))
    init_tacotron2nv(jax.random.PRNGKey(0), tiny)


def test_examples_exist_for_every_method():
    names = {os.path.basename(os.path.dirname(c)) for c in CONFIGS}
    assert {
        "baseline", "maml", "reptile", "continual_er", "continual_erkd",
        "continual_er_reg", "continual_ewc", "cumulative",
    } <= names
