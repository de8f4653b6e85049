"""WaveRNN vocoder trainer (capability the reference lacks — it consumes
externally-trained WaveRNN checkpoints; msa_tts/utils/helpers.py:7-17).

Teacher-forced MoL (or Gaussian) training on (mel, waveform) pairs drawn
from the same corpus/metafile layout as the acoustic model.  One jitted
step; sequence windows are cropped to a fixed length for static shapes.
The MelResNet batch-norms run with frozen (initial) statistics — the
conditioning network's normalization is treated as fixed preprocessing,
which keeps the step a pure function of params.

Entry point: ``python -m msa_tts_tpu.trainers.wavernn_train
--params_path <dir>`` with a params.yml carrying the WaveRNN section
(rnn_dims/fc_dims/... as in the reference vocoder params) plus the usual
``dataset_train``/``audio_params``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import save_params
from ..dataloaders.loader_default import build_datasets
from ..ops.audio import load_wav
from ..utils.checkpoint import save_checkpoint
from ..utils.logging_utils import MetricsLogger
from ..utils.paths import PathManager
from ..vocoders.wavernn import (
    config_from_params,
    discretized_mix_logistic_loss,
    gaussian_loss,
    init_wavernn,
    wavernn_forward,
)


class WaveRNNTrainer:
    def __init__(self, **params):
        self.params = params
        output_path = os.path.join(
            params["output_path"], params.get("method", "wavernn"),
            params["experiment_name"],
        )
        self.path_manager = PathManager(output_path)
        save_params(params, os.path.join(output_path, "params.yml"))
        self.logger = MetricsLogger(
            self.path_manager.logs_path,
            use_tensorboard=params.get("use_tensorboard", True),
        )

        self.cfg = config_from_params(**params)
        self.seq_len = int(params.get("seq_len", 1280))
        hop = self.cfg.hop_length
        assert self.seq_len % hop == 0, "seq_len must be a hop multiple"
        self.mel_win = self.seq_len // hop + 2 * self.cfg.pad

        self._load_corpus()
        rng = jax.random.PRNGKey(params.get("model_seed", 0))
        self.model_params, self.model_state = init_wavernn(rng, self.cfg)
        self.tx = optax.adam(float(params.get("lr", 1e-4)))
        self.opt_state = self.tx.init(self.model_params)

        # optional SPMD: ``parallel: {dp: N}`` shards the batch axis
        # over an ICI mesh; params/opt replicated, grad psum by GSPMD
        from ..parallel.sharding import DpShard

        self.shard = DpShard.from_params(params)
        if self.shard is not None:
            self.model_params = self.shard.replicate(self.model_params)
            self.model_state = self.shard.replicate(self.model_state)
            self.opt_state = self.shard.replicate(self.opt_state)

        self._step_jit = jax.jit(self._step, donate_argnums=(0, 1))
        self.step_global = 0

    # ------------------------------------------------------------- data
    def _load_corpus(self):
        """The dataset caches mels; waveform targets are loaded lazily
        per item via ``Item.audio_path``."""
        dataset_train, _, _ = build_datasets(**self.params)
        self.dataset = dataset_train
        self._wav_cache: dict[str, np.ndarray | None] = {}

    def _sample_batch(self, rng: np.random.Generator, batch_size: int):
        """Random fixed-length (mel window, waveform segment) batch."""
        cfg = self.cfg
        hop = cfg.hop_length
        mels, wavs = [], []
        while len(mels) < batch_size:
            it = self.dataset.items[
                rng.integers(0, len(self.dataset.items))
            ]
            if it.item_id not in self._wav_cache:
                try:
                    w = load_wav(
                        it.audio_path,
                        target_sample_rate=self.params["audio_params"][
                            "sample_rate"
                        ],
                    )
                    # it.mel was computed from the TRIMMED waveform
                    # (dataset.py); apply the same slice or mel frame 0
                    # and wav sample 0 are offset by the leading silence
                    if it.trim is not None:
                        w = w[it.trim[0] : it.trim[1]]
                    self._wav_cache[it.item_id] = w
                except (FileNotFoundError, TypeError):
                    self._wav_cache[it.item_id] = None
            wav_full = self._wav_cache[it.item_id]
            if wav_full is None:
                continue
            n_frames = it.mel.shape[1]
            if n_frames <= self.mel_win + 1:
                continue
            start = int(
                rng.integers(cfg.pad, n_frames - self.mel_win + cfg.pad)
            )
            mel_slice = it.mel[:, start - cfg.pad : start - cfg.pad + self.mel_win]
            wav_start = (start) * hop
            seg = wav_full[wav_start : wav_start + self.seq_len + 1]
            if len(seg) < self.seq_len + 1:
                continue
            mels.append(mel_slice)
            wavs.append(seg)
        return (
            jnp.asarray(np.stack(mels)),
            jnp.asarray(np.stack(wavs, dtype=np.float32)),
        )

    # ------------------------------------------------------------- step
    def _step(self, params, opt_state, mels, wav):
        x_in = wav[:, :-1]
        y = wav[:, 1:, None]

        def loss_fn(p):
            logits = wavernn_forward(
                p, self.model_state, self.cfg, x_in, mels, train=False
            )
            if self.cfg.mode == "MOL":
                return discretized_mix_logistic_loss(logits, y)
            return gaussian_loss(logits, y)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = self.tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # -------------------------------------------------------------- run
    def run(self):
        params = self.params
        rng = np.random.default_rng(params.get("train_seed", 0))
        batch_size = int(params.get("batch_size", 16))
        n_steps = int(params.get("n_steps", 1000))
        for step in range(1, n_steps + 1):
            mels, wav = self._sample_batch(rng, batch_size)
            if self.shard is not None:
                mels, wav = self.shard.put_batch(mels, wav)
            self.model_params, self.opt_state, loss = self._step_jit(
                self.model_params, self.opt_state, mels, wav
            )
            loss = float(loss)
            self.step_global += 1
            if step % params.get("tb_log_interval", 10) == 0:
                self.logger.log_scalars(
                    {"train/nll": (loss, self.step_global)}
                )
            if step % params.get("print_interval", 10) == 0:
                print(f"| step {step}/{n_steps} :: nll {loss:#.4}")
            if step % params.get("ckpt_save_step_interval", 500) == 0:
                self._save()
        self._save()
        return loss

    def _save(self):
        save_checkpoint(
            os.path.join(
                self.path_manager.checkpoints_path,
                f"wavernn_{self.step_global}.ckpt",
            ),
            {
                "params": self.model_params,
                "model_state": self.model_state,
                "opt_state": self.opt_state,
                "step": self.step_global,
            },
        )


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    WaveRNNTrainer(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
