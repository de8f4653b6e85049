"""End-to-end inference driver tests: train briefly, then adapt+synthesize
through the Inference / InferCumulative APIs."""

import glob
import os

import numpy as np
import pytest

from msa_tts_tpu.dataloaders.synthetic import (
    make_synthetic_corpus,
    synthetic_params,
)


@pytest.fixture(scope="module")
def experiment(tmp_path_factory):
    """A tiny trained baseline experiment on a synthetic corpus."""
    from msa_tts_tpu.trainers.baseline import JointTrainer

    root = str(tmp_path_factory.mktemp("infer_corpus"))
    make_synthetic_corpus(
        root, n_speakers=2, utterances_per_speaker=5, seed=0,
        min_dur=0.25, max_dur=0.4,
    )
    params = synthetic_params(
        root, n_speakers=2, batch_size=3, n_epochs=1,
        model_overrides={"max_decoder_steps": 15},
    )
    params["use_tensorboard"] = False
    params["plot_examples"] = False
    trainer = JointTrainer(**params)
    trainer.run()
    trainer._save_checkpoint("checkpoint_0.ckpt")
    return root, params, trainer


def test_inference_end_to_end(experiment):
    from msa_tts_tpu.infer import Inference

    root, params, trainer = experiment
    infer_params = dict(params)
    infer_params.update(
        checkpoint_id="0",
        speaker="spk00",
        input_text="hello world",
        language="en-us",
        convert_mode="text_to_phone_to_idx",
        batch_size="2",
        n_inner_test="1",
        vocoder="griffinlim",
        spk_emb_path=os.path.join(root, "spk_emb.pkl"),
        track_higher_grads=False,
    )
    inf = Inference(**infer_params)
    inf.make_inference()

    out = inf.path_manager.inference_path
    wavs = glob.glob(os.path.join(out, "spk00_*.wav"))
    assert wavs, f"no wav written in {out}"
    import scipy.io.wavfile as wavfile

    sr, data = wavfile.read(wavs[0])
    assert sr == params["audio_params"]["sample_rate"]
    assert len(data) > 100
    assert glob.glob(os.path.join(out, "spk00_*_attn.png"))
    assert glob.glob(os.path.join(out, "spk00_*_mel.png"))
    npys = glob.glob(os.path.join(out, "spk00_*.npy"))
    assert npys
    mel = np.load(npys[0])
    assert mel.shape[0] == params["audio_params"]["n_mels"]


@pytest.mark.slow
def test_inference_landscape_plots(experiment):
    from msa_tts_tpu.infer import Inference

    root, params, trainer = experiment
    infer_params = dict(params)
    infer_params["model"] = dict(params["model"])
    # shrink for the landscape grid evaluation
    infer_params.update(
        checkpoint_id="0",
        speaker="spk00,spk01",
        input_text="ab",
        batch_size="2",
        n_inner_test="1",
        vocoder="griffinlim",
        spk_emb_path=os.path.join(root, "spk_emb.pkl"),
        plot_loss_landscapes=True,
        track_higher_grads=False,
        experiment_name="synthetic_landscape",
    )
    # reuse trained output dir structure: copy checkpoint
    import shutil

    src_dir = trainer.path_manager.checkpoints_path
    from msa_tts_tpu.utils.paths import PathManager

    out_path = os.path.join(
        infer_params["output_path"], infer_params["method"],
        "synthetic_landscape",
    )
    pm = PathManager(out_path)
    shutil.copy(
        os.path.join(src_dir, "checkpoint_0.ckpt"),
        os.path.join(pm.checkpoints_path, "checkpoint_0.ckpt"),
    )
    inf = Inference(**infer_params)
    # patch down the landscape cost: tiny grid
    import msa_tts_tpu.infer as I

    orig_plane = I.random_plane
    I.random_plane = lambda f, p, distance=10, steps=16, **kw: orig_plane(
        f, p, distance=1.0, steps=3, **kw
    )
    try:
        inf.make_inference()
    finally:
        I.random_plane = orig_plane
    out = inf.path_manager.inference_path
    assert glob.glob(os.path.join(out, "*loss_surface.png"))
    assert glob.glob(os.path.join(out, "loss_linearinterp_*.png"))


@pytest.mark.slow
def test_infer_cumulative(experiment, tmp_path):
    """Run a 2-speaker ER stream then batch-synthesize the sentence list
    for every seen speaker from the per-task checkpoints."""
    from msa_tts_tpu.trainers.continual_er import ExperienceReplayTrainer
    from msa_tts_tpu.infer_cumulative import InferCumulative

    root, params, _ = experiment
    cl_params = dict(params)
    cl_params["dataset_train"] = dict(params["dataset_train"])
    cl_params.update(
        method="continual_er",
        experiment_name="er_for_infer",
        speaker_seed=5,
        num_initial_speakers=0,
        n_max_epochs=1,
        test_interval=1,
        early_stopping=False,
        buffer_sample_size=1,
        use_tensorboard=False,
        plot_examples=False,
    )
    t = ExperienceReplayTrainer(**cl_params)
    t.run()

    sent_file = str(tmp_path / "sents.txt")
    with open(sent_file, "w") as f:
        f.write("hello there\ngood morning\n")

    ic_params = dict(cl_params)
    ic_params.update(
        spk_emb_path=os.path.join(root, "spk_emb.pkl"),
        input_text_file=sent_file,
        vocoder="griffinlim",
        checkpoint_id="all",
        max_workers="1",
    )
    ic = InferCumulative(**ic_params)
    ic.run()
    wavs = glob.glob(
        os.path.join(ic.path_manager.inference_path, "*.wav")
    )
    # ckpt0 → 1 speaker × 2 sents; ckpt1 → 2 speakers × 2 sents = 6 total
    assert len(wavs) == 6

    # WaveRNN vocoding path: all sentences vocoded in one batched
    # sample scan (generate_batch); random weights — plumbing, not audio
    import jax
    from msa_tts_tpu.vocoders.wavernn import WaveRNN, WaveRNNConfig

    hop = params["audio_params"]["hop_length"]
    wcfg = WaveRNNConfig(
        mode="MOL", n_mels=params["audio_params"]["n_mels"], rnn_dims=16,
        fc_dims=16, compute_dims=8, res_out_dims=8, res_blocks=1,
        hop_length=hop, sample_rate=22050, pad=2,
        upsample_factors=(4, 8, hop // 32),
    )
    voc = WaveRNN(cfg=wcfg, rng=jax.random.PRNGKey(0), gen_dtype=None)
    ic2 = InferCumulative(**dict(ic_params, vocoder="wavernn"))
    ic2._load_vocoder = lambda: (
        "wavernn", voc, {"target": 400, "overlap": 100}, None
    )
    for w in wavs:
        os.remove(w)
    ic2.run()
    wavs2 = glob.glob(
        os.path.join(ic2.path_manager.inference_path, "*.wav")
    )
    assert len(wavs2) == 6


def test_cli_values_yaml_coerced(monkeypatch):
    """--key value CLI overrides must reach params with params.yml
    types: a string --infer_seed crashes PRNGKey, a string
    --speaker_seed shuffles the continual stream differently than
    training (breaking checkpoint lookup), and the string 'false' is
    truthy."""
    import sys

    from msa_tts_tpu.infer import get_cmd_params

    monkeypatch.setattr(sys, "argv", [
        "prog", "--infer_seed", "1", "--speaker_seed", "0",
        "--plot_loss_landscapes", "false", "--n_inner_test", "5",
        "--speaker", "A,B", "--input_text", "hello there",
        "--lr", "1e-3",
    ])
    out = get_cmd_params()
    assert out["infer_seed"] == 1 and isinstance(out["infer_seed"], int)
    assert out["speaker_seed"] == 0
    assert out["plot_loss_landscapes"] is False
    assert out["n_inner_test"] == 5
    assert out["speaker"] == "A,B"
    assert out["input_text"] == "hello there"
    # "1e-3" is a string under YAML-1.1 (needs a dot before the
    # exponent); the config.literal fallback coerces it to the float
    assert out["lr"] == pytest.approx(1e-3)
    assert isinstance(out["lr"], float)

    from msa_tts_tpu.infer_cumulative import get_cmd_params as gc2

    monkeypatch.setattr(sys, "argv", ["prog", "--speaker_seed", "3"])
    assert gc2()["speaker_seed"] == 3
