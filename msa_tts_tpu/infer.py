"""Few-shot adaptation inference driver.

Reference: msa_tts/infer.py — load a trained checkpoint, and for each
requested speaker: k inner-loop adaptation steps on their support set,
autoregressive mel synthesis from free text, vocoding (Griffin-Lim /
WaveRNN+denoiser / HiFi-GAN), wav + attention/mel plots + .npy dumps in
``inference/``; optional loss-landscape plots.  Invocation matches the
reference's shell contract: ``EXPERIMENT_PATH=<dir> python -m
msa_tts_tpu.infer --speaker A,B --input_text "..." [--key value ...]``.

TPU redesign: adaptation is the jitted differentiable inner loop from
meta/inner_loop.py (k SGD steps as one compiled scan), synthesis is the
compiled ``lax.while_loop`` decoder, and Griffin-Lim runs on device.
"""

from __future__ import annotations

import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from .analysis.landscapes import linear_interpolation, random_plane
from .config import experiment_path_from_env, load_params
from .dataloaders.loader_meta import get_dataloader as get_dataloader_meta
from .meta.maml import make_metatest_fn
from .models import config_from_params, tacotron2nv_infer
from .models.loss import tacotron2_loss
from .ops.audio import griffinlim_logmelspec, save_wav
from .optim import make_optimizer
from .utils.checkpoint import load_checkpoint, restore_like
from .utils.g2p import Grapheme2Phoneme, N_SYMBOLS
from .utils.paths import PathManager
from .utils.plot import plot_attention, plot_spectrogram


class Inference:
    def __init__(self, **params):
        self.params = params
        output_path = os.path.join(
            params["output_path"], params["method"], params["experiment_name"]
        )
        self.path_manager = PathManager(output_path)
        self.g2p = Grapheme2Phoneme()

        mp = dict(params["model"])
        mp["n_mel_channels"] = params["audio_params"]["n_mels"]
        mp["n_symbols"] = N_SYMBOLS
        mp["num_speakers"] = 1
        for k in ("freeze_charemb", "freeze_encoder", "freeze_decoder"):
            mp[k] = params.get(k, False)
        params["model"] = mp
        self.cfg = config_from_params(mp)
        self.speaker_emb_type = mp["speaker_emb_type"]
        params["n_inner_test"] = int(params.get("n_inner_test", 1))

        self._init_model()

        # Episodic loader over the meta-test speakers.  Only override
        # the configured shot count when the caller actually passed one
        # (a silent default would change adaptation quality vs the
        # training-time meta-test protocol).
        if "batch_size" in params:
            self.params["dataset_metatest"]["batch_size"] = int(
                params["batch_size"]
            )
        self.params["dataset_metatest"].setdefault("batch_size", 4)
        self.dataloader_metatest, log = get_dataloader_meta(
            "metatest", **self.params
        )
        print(log)

        # Jitted k-step adaptation (replaces higher.innerloop_ctx).
        inner_tx = make_optimizer(params["optim_inner"])
        crit = params["criterion"]

        def loss_fn(p, model_state, batch, rng):
            from .models import tacotron2nv_forward

            outs, new_ms = tacotron2nv_forward(
                p, model_state, self.cfg,
                batch["inputs"], batch["input_lengths"],
                batch["melspecs"], batch["melspec_lengths"],
                batch["speaker_vecs"], rng, train=True,
            )
            loss = tacotron2_loss(
                tuple(outs),
                (batch["melspecs"], batch["stop_labels"]),
                batch["melspec_lengths"],
                n_frames_per_step=self.cfg.n_frames_per_step,
                reduction=crit.get("reduction", "none"),
                pos_weight=float(crit.get("pos_weight", 1.0)),
            )
            return loss, new_ms

        self._loss_fn = loss_fn
        self._metatest = jax.jit(
            make_metatest_fn(loss_fn, inner_tx, params["n_inner_test"])
        )
        from .utils.backend import resolve_kernel_backend

        db = resolve_kernel_backend(self.params.get("decode_backend"))
        self._infer_jit = jax.jit(
            lambda p, s, i, il, sv, rng: tacotron2nv_infer(
                p, s, self.cfg, i, il, sv, rng, decoder_backend=db
            )
        )

    # ------------------------------------------------------------ model
    def _init_model(self):
        from .models import init_tacotron2nv

        self.model_params, self.model_state = init_tacotron2nv(
            jax.random.PRNGKey(0), self.cfg
        )
        ckpt_id = self.params["checkpoint_id"]
        ckpt_dir = self.path_manager.checkpoints_path
        path_ckpt = os.path.join(ckpt_dir, f"checkpoint_{ckpt_id}.ckpt")
        path_pt = os.path.join(ckpt_dir, f"checkpoint_{ckpt_id}.pt")
        if os.path.exists(path_ckpt):
            raw = load_checkpoint(path_ckpt)
            self.model_params = restore_like(
                self.model_params, raw["params"]
            )
            self.model_state = restore_like(
                self.model_state, raw["model_state"]
            )
            print(f"Loaded model checkpoint from {path_ckpt}")
        elif os.path.exists(path_pt):
            from .utils.torch_import import load_torch_checkpoint

            self.model_params, self.model_state = load_torch_checkpoint(
                path_pt, self.cfg
            )
            print(f"Loaded reference checkpoint from {path_pt}")
        else:
            raise FileNotFoundError(
                f"no checkpoint_{ckpt_id}.ckpt/.pt under {ckpt_dir}"
            )

    # -------------------------------------------------------- synthesis
    def generate_melspec(self, adapted_params, model_state, speaker):
        """Phonemize the input text and synthesize a mel for ``speaker``
        (reference infer.py:171-198)."""
        seq, _ = self.g2p.convert(
            inp=self.params["input_text"],
            language=self.params.get("language", "en-us"),
            convert_mode=self.params.get(
                "convert_mode", "text_to_phone_to_idx"
            ),
        )
        inputs = jnp.asarray(np.asarray(seq, np.int32)[None, :])
        in_len = jnp.asarray([len(seq)])

        if not hasattr(self, "_spk_emb_cache"):
            # one unpickle for the whole inference run, not one per
            # synthesized speaker (the file holds ALL speakers)
            with open(self.params["spk_emb_path"], "rb") as f:
                self._spk_emb_cache = pickle.load(f)
        emb = self._spk_emb_cache
        vec = emb[speaker]["mean"] if isinstance(emb[speaker], dict) \
            else emb[speaker]
        spk_vec = jnp.asarray(np.asarray(vec, np.float32)[None, :])

        mel, mel_lengths, attn = self._infer_jit(
            adapted_params, model_state, inputs, in_len, spk_vec,
            jax.random.PRNGKey(self.params.get("infer_seed", 0)),
        )
        n_steps = max(int(mel_lengths[0]), 1)
        r = self.cfg.n_frames_per_step
        mel = np.asarray(mel)[0, :, : n_steps * r]
        attn = np.asarray(attn)[0, :n_steps, : int(in_len[0])]
        print(f"postnet_outputs: {mel.shape}")
        print(f"attn_weights: {attn.shape}")
        return mel, attn

    # --------------------------------------------------------- vocoding
    def _vocoder_bundle(self):
        """Load the configured vocoder (and denoiser) ONCE: per-speaker
        reloads would re-read the checkpoint and re-jit the generation
        pipeline for every synthesized speaker."""
        if hasattr(self, "_voc_cache"):
            return self._voc_cache
        vocoder = self.params.get("vocoder", "griffinlim")
        bundle = {"name": vocoder}
        if vocoder == "wavernn":
            from .vocoders.wavernn import get_wavernn

            params_voc = load_params(self.params["vocoder_params_path"])
            bundle["wavernn"] = get_wavernn(None, **params_voc)
            bundle["params_voc"] = params_voc
            noise_profile = self.params.get(
                "noise_profile_path",
                "experiments/files/noise_profiles/noise_prof1.wav",
            )
            if os.path.exists(noise_profile):
                from .vocoders.denoiser import AudioDenoiser

                bundle["denoiser"] = AudioDenoiser(noise_profile)
        elif vocoder == "hifigan":
            from .vocoders.hifigan import HiFiGAN

            bundle["hifigan"] = HiFiGAN(
                self.params["vocoder_params_path"],
                self.params["vocoder_ckpt_path"],
            )
        elif vocoder != "griffinlim":
            raise ValueError(f"unknown vocoder: {vocoder}")
        self._voc_cache = bundle
        return bundle

    def _vocode(self, melspec: np.ndarray) -> np.ndarray:
        bundle = self._vocoder_bundle()
        if bundle["name"] == "griffinlim":
            wav = griffinlim_logmelspec(
                jnp.asarray(melspec), self.params["audio_params"]
            )
            return np.asarray(wav)
        if bundle["name"] == "wavernn":
            params_voc = bundle["params_voc"]
            wav = bundle["wavernn"].generate(
                melspec[None],
                True,
                params_voc["target"],
                params_voc["overlap"],
            )
            if "denoiser" in bundle:
                wav = bundle["denoiser"].denoise(wav)
            return np.asarray(wav)
        return np.asarray(bundle["hifigan"].inference(melspec))

    # ------------------------------------------------------- landscapes
    def plot_loss_landscape(self, adapted_params, model_state, batch,
                            speaker):
        print(f"Plotting loss landscape for speaker {speaker}")
        rng = jax.random.PRNGKey(1)

        def loss_of(p):
            loss, _ = self._loss_fn(p, model_state, batch, rng)
            return loss

        STEPS = 16
        surface = random_plane(
            loss_of, adapted_params, distance=10, steps=STEPS,
            normalization="filter",
        )
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        fig = plt.figure()
        ax = plt.axes(projection="3d")
        X, Y = np.meshgrid(
            np.arange(surface.shape[1]), np.arange(surface.shape[0])
        )
        ax.plot_surface(X, Y, surface, cmap="viridis", edgecolor="none")
        ax.set_title("Surface Plot of Loss Landscape")
        fig.savefig(
            os.path.join(
                self.path_manager.inference_path,
                f"{speaker}_loss_surface.png",
            )
        )
        plt.close(fig)

    def plot_linear_interpolation(self, plot_inputs):
        print("Plotting linear interpolation")
        STEPS = 32
        spk1, spk2 = self.params["speaker"][:2]
        p1, batch1, ms1 = plot_inputs[spk1]
        p2, batch2, ms2 = plot_inputs[spk2]
        rng = jax.random.PRNGKey(1)

        def mk_loss(batch, ms):
            return lambda p: self._loss_fn(p, ms, batch, rng)[0]

        loss_12 = linear_interpolation(mk_loss(batch1, ms1), p1, p2, STEPS)
        loss_21 = np.flip(
            linear_interpolation(mk_loss(batch2, ms2), p2, p1, STEPS)
        )
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        xs = [i / STEPS for i in range(STEPS)]
        plt.figure()
        plt.plot(xs, loss_12, "b")
        plt.plot(xs, loss_21, "r")
        plt.title("Linear Interpolation of Loss")
        plt.xlabel("Interpolation Coefficient")
        plt.ylabel("Loss")
        plt.savefig(
            os.path.join(
                self.path_manager.inference_path,
                f"loss_linearinterp_{spk1}_to_{spk2}"
                f"_ckpt{self.params['checkpoint_id']}.png",
            )
        )
        plt.close()

    # ------------------------------------------------------------- main
    def make_inference(self):
        speakers = self.params["speaker"]
        if isinstance(speakers, str):
            speakers = speakers.split(",")
        self.params["speaker"] = speakers

        plot_inputs = {}
        rng = jax.random.PRNGKey(self.params.get("adapt_seed", 0))

        for itr_b, meta_batch in enumerate(self.dataloader_metatest):
            for spk, episode in meta_batch.items():
                if spk not in speakers:
                    continue
                print(f"Speaker: {spk}")
                support = unpack_task_batch_single(
                    episode["train"], self.speaker_emb_type
                )
                query = unpack_task_batch_single(
                    episode["test"], self.speaker_emb_type
                )
                k = jax.random.fold_in(rng, itr_b)
                qloss, adapted, ms, inner_losses = self._metatest(
                    self.model_params, self.model_state, support, query, k
                )
                for i, il in enumerate(np.asarray(inner_losses)):
                    print(
                        f"{i}/{self.params['n_inner_test']}, loss: {il}"
                    )
                plot_inputs[spk] = (adapted, support, ms)

                print("Generating melspec ...")
                melspec, attn_weights = self.generate_melspec(
                    adapted, ms, spk
                )

                filename = (
                    spk
                    + "_"
                    + self.params["input_text"][:10].lower().replace(" ", "_")
                    + f"_ckpt{self.params['checkpoint_id']}"
                )
                plot_attention(
                    attn_weights,
                    os.path.join(
                        self.path_manager.inference_path, filename + "_attn"
                    ),
                )
                plot_spectrogram(
                    melspec,
                    os.path.join(
                        self.path_manager.inference_path, filename + "_mel"
                    ),
                )

                print("Generating wav ...")
                wav = self._vocode(melspec)
                save_wav(
                    os.path.join(
                        self.path_manager.inference_path, filename + ".wav"
                    ),
                    wav,
                    self.params["audio_params"]["sample_rate"],
                )
                np.save(
                    os.path.join(
                        self.path_manager.inference_path, filename + ".npy"
                    ),
                    melspec,
                )

        if self.params.get("plot_loss_landscapes", False):
            for spk in speakers:
                if spk in plot_inputs:
                    adapted, support, ms = plot_inputs[spk]
                    self.plot_loss_landscape(adapted, ms, support, spk)
            if len(speakers) >= 2 and all(
                s in plot_inputs for s in speakers[:2]
            ):
                self.plot_linear_interpolation(plot_inputs)


def unpack_task_batch_single(batch, speaker_emb_type: str) -> dict:
    """Single-task Batch → jit-ready dict."""
    return {
        "inputs": batch.inputs,
        "input_lengths": batch.input_lengths,
        "melspecs": batch.mels,
        "melspec_lengths": batch.mel_lengths,
        "speaker_vecs": batch.speaker_vecs(speaker_emb_type),
        "stop_labels": batch.stop_labels,
    }


# ---------------------------------------------------------------- CLI


def coerce_cli_value(v: str):
    """Coerce one ``--key value`` CLI string so overrides get the same
    types params.yml would give them: ``--infer_seed 1`` must reach
    PRNGKey as an int and ``--plot_loss_landscapes false`` must be the
    boolean False, not a truthy string.  YAML-1.1 first (the exact
    loader params.yml goes through), then ``config.literal`` for the
    numeric spellings YAML leaves as strings (``1e-3`` — PyYAML's float
    resolver wants a dot before the exponent).  Anything else stays a
    plain string (speaker lists like ``A,B``, free text)."""
    import yaml

    from .config import literal

    try:
        parsed = yaml.safe_load(v)
    except yaml.YAMLError:
        parsed = None
    if parsed is None and v.strip() not in ("null", "~", ""):
        parsed = v
    if isinstance(parsed, str):
        lit = literal(parsed)
        # take literal()'s result only when it found a real value —
        # ast/float on free text returns the string unchanged anyway
        return lit if not isinstance(lit, str) else parsed
    return parsed


def get_cmd_params() -> dict:
    """``--key value`` free-form CLI params (reference infer.py:378-393),
    values YAML-coerced to params.yml types."""
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
    print(f"Experiment path: {experiment_path}")
    params = load_params(os.path.join(experiment_path, "params.yml"))
    params.update(cmd_params)
    if "audio_params_path" in params:
        params["audio_params"] = load_params(params["audio_params_path"])
    Inference(**params).make_inference()


if __name__ == "__main__":
    main(get_cmd_params())

