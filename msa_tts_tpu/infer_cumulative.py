"""Continual-stream inference driver.

Reference: msa_tts/infer_cumulative.py — for each per-task checkpoint
``best_{itr}_{speaker}`` of a continual run, synthesize a sentence list
for every speaker seen up to that point, vocode (WaveRNN + denoiser in
the reference; any vocoder here) and save wavs under ``inference/``.

TPU redesign: the reference parallelizes with a ``ProcessPoolExecutor``
of model replicas (infer_cumulative.py:156-191); here every sentence for
a target speaker is synthesized in ONE batched compiled ``infer`` call —
batching on the MXU replaces host process fan-out.

Usage: ``python -m msa_tts_tpu.infer_cumulative --params_path <dir>
[--key value ...]`` (or ``EXPERIMENT_PATH`` env var).
"""

from __future__ import annotations

import os
import pickle
import random
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .config import experiment_path_from_env, load_params
from .models import config_from_params, init_tacotron2nv, tacotron2nv_infer
from .ops.audio import griffinlim_logmelspec, save_wav
from .ops.masking import pad_axis_to
from .utils.checkpoint import load_checkpoint, restore_like
from .utils.g2p import Grapheme2Phoneme, N_SYMBOLS
from .utils.paths import PathManager


class InferCumulative:
    def __init__(self, **params):
        self.params = params
        output_path = os.path.join(
            params["output_path"], params["method"], params["experiment_name"]
        )
        self.path_manager = PathManager(output_path)

        self.all_speakers = list(params["dataset_train"]["speakers_list"])
        if "joint_training" not in params:
            random.Random(params.get("speaker_seed", 0)).shuffle(
                self.all_speakers
            )
        print(self.all_speakers)

        mp = dict(params["model"])
        mp["num_speakers"] = 1
        mp["n_symbols"] = N_SYMBOLS
        mp["n_mel_channels"] = params["audio_params"]["n_mels"]
        for k in ("freeze_charemb", "freeze_encoder", "freeze_decoder"):
            mp[k] = params.get(k, False)
        params["model"] = mp
        self.cfg = config_from_params(mp)
        self.speaker_emb_type = mp["speaker_emb_type"]

        self.model_params, self.model_state = init_tacotron2nv(
            jax.random.PRNGKey(0), self.cfg
        )
        from .utils.backend import resolve_kernel_backend

        db = resolve_kernel_backend(self.params.get("decode_backend"))
        self._infer_jit = jax.jit(
            lambda p, s, i, il, sv, rng: tacotron2nv_infer(
                p, s, self.cfg, i, il, sv, rng, decoder_backend=db
            )
        )

    # ----------------------------------------------------------- loading
    def _load_stream_checkpoint(self, name: str):
        path = os.path.join(self.path_manager.checkpoints_path, name)
        if os.path.exists(path + ".ckpt") or path.endswith(".ckpt"):
            path = path if path.endswith(".ckpt") else path + ".ckpt"
            raw = load_checkpoint(path)
            self.model_params = restore_like(
                self.model_params, raw["params"]
            )
            self.model_state = restore_like(
                self.model_state, raw["model_state"]
            )
        else:
            from .utils.torch_import import load_torch_checkpoint

            path = path if path.endswith(".pt") else path + ".pt"
            self.model_params, self.model_state = load_torch_checkpoint(
                path, self.cfg
            )
        print(f"Loading checkpoint from  {path}")

    def _load_vocoder(self):
        vocoder = self.params.get("vocoder", "griffinlim")
        if vocoder == "wavernn":
            from .vocoders.wavernn import get_wavernn

            params_voc = load_params(self.params["vocoder_params_path"])
            wavernn = get_wavernn(None, **params_voc)
            denoiser = None
            noise_profile = self.params.get("noise_profile_path")
            if noise_profile and os.path.exists(noise_profile):
                from .vocoders.denoiser import AudioDenoiser

                denoiser = AudioDenoiser(noise_profile)
            return ("wavernn", wavernn, params_voc, denoiser)
        return ("griffinlim", None, None, None)

    # ---------------------------------------------------------- synthesis
    def _infer_for_speaker(self, step: int, ref_speaker: str,
                           target_speaker: str, vocoder_bundle):
        """Synthesize the whole sentence list for ``target_speaker`` in
        one batched compiled call."""
        print(f"Inferring from {ref_speaker} to {target_speaker}.")
        seqs = []
        for sent in self.sent_list:
            seq, _ = self.g2p.convert(
                inp=sent,
                language=self.params.get("language", "en-us"),
                convert_mode=self.params.get(
                    "convert_mode", "text_to_phone_to_idx"
                ),
            )
            seqs.append(np.asarray(seq, np.int32))
        max_len = ((max(len(s) for s in seqs) + 15) // 16) * 16
        inputs = np.stack([pad_axis_to(s, max_len) for s in seqs])
        in_lens = np.asarray([len(s) for s in seqs], np.int32)

        emb = self.speaker_embeddings[target_speaker]
        vec = emb["mean"] if isinstance(emb, dict) else emb
        spk = np.broadcast_to(
            np.asarray(vec, np.float32)[None, :],
            (len(seqs), len(vec)),
        )

        mel, mel_lengths, _ = self._infer_jit(
            self.model_params,
            self.model_state,
            jnp.asarray(inputs),
            jnp.asarray(in_lens),
            jnp.asarray(spk),
            jax.random.PRNGKey(0),
        )
        mel = np.asarray(mel)
        mel_lengths = np.asarray(mel_lengths)

        kind, wavernn, params_voc, denoiser = vocoder_bundle
        r = self.cfg.n_frames_per_step
        mels = [
            mel[i, :, : max(int(mel_lengths[i]) * r, r)]
            for i in range(len(self.sent_list))
        ]
        if kind == "wavernn":
            # all sentences' folds in ONE sample scan (generate_batch)
            wavs = wavernn.generate_batch(
                mels, target=params_voc["target"],
                overlap=params_voc["overlap"], verbose=False,
            )
            if denoiser is not None:
                wavs = [denoiser.denoise(w) for w in wavs]
        else:
            wavs = [
                np.asarray(
                    griffinlim_logmelspec(
                        jnp.asarray(m), self.params["audio_params"]
                    )
                )
                for m in mels
            ]
        for i, wav in enumerate(wavs):
            fname = (
                f"{step}_{ref_speaker}_to_{target_speaker}_sent{i}.wav"
            )
            save_wav(
                os.path.join(self.path_manager.inference_path, fname),
                wav,
                self.params["audio_params"]["sample_rate"],
            )

    # --------------------------------------------------------------- run
    def run(self):
        self.speakers_so_far = []
        with open(self.params["spk_emb_path"], "rb") as f:
            self.speaker_embeddings = pickle.load(f)
        self.g2p = Grapheme2Phoneme()
        with open(self.params["input_text_file"]) as f:
            self.sent_list = [s.strip() for s in f if s.strip()]

        vocoder_bundle = self._load_vocoder()
        num_initial = int(self.params.get("num_initial_speakers", 0))
        checkpoint_id = str(self.params.get("checkpoint_id", "all"))

        for spk_itr, speaker in enumerate(self.all_speakers):
            if "joint_training" not in self.params:
                self.speakers_so_far.append(speaker)
                if checkpoint_id != "all" and str(spk_itr) != checkpoint_id:
                    print("Skipping speaker ", spk_itr)
                    continue
                ckpt_name = f"best_{spk_itr + num_initial}_{speaker}"
            else:
                ckpt_name = f"checkpoint_{checkpoint_id}"
                self.speakers_so_far = self.all_speakers

            self._load_stream_checkpoint(ckpt_name)

            for itr_t, target in enumerate(self.speakers_so_far):
                print(
                    f"\n\nInferring for speaker {target}:"
                    f" {itr_t}/{len(self.speakers_so_far)}"
                )
                self._infer_for_speaker(
                    spk_itr, speaker, target, vocoder_bundle
                )
            if "joint_training" in self.params:
                break


def get_cmd_params() -> dict:
    """``--key value`` CLI params, YAML-coerced (a string
    ``--speaker_seed 0`` would shuffle the stream differently than the
    int-seeded training shuffle and break checkpoint lookup)."""
    from .infer import coerce_cli_value

    args = sys.argv[1:]
    assert len(args) % 2 == 0, "arguments must be --key value pairs"
    out = {}
    for i in range(1, len(args), 2):
        out[args[i - 1].lstrip("-")] = coerce_cli_value(args[i])
    return out


def main(cmd_params: dict):
    experiment_path = experiment_path_from_env(
        cmd_params.pop("params_path", None)
    )
    params = load_params(os.path.join(experiment_path, "params.yml"))
    params.update(cmd_params)
    InferCumulative(**params).run()


if __name__ == "__main__":
    main(get_cmd_params())

