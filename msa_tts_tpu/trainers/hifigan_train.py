"""HiFi-GAN vocoder trainer (capability the reference lacks — it ships
discriminators unused and consumes externally-trained generators;
msa_tts/utils/hifigan/).

Standard HiFi-GAN recipe: generator vs Multi-Period + Multi-Scale
discriminators with LSGAN losses, feature matching (×2) and mel-spectrum
L1 (×45), AdamW(0.8, 0.99).  Discriminator and generator updates run as
one jitted step; the mel loss recomputes the "ap2" log-mel of generated
audio on device.

Entry point: ``python -m msa_tts_tpu.trainers.hifigan_train
--params_path <dir>`` (params.yml with a ``hifigan`` section using the
standard config keys, plus ``dataset_train``/``audio_params`` for the
corpus — audio_processor must be "ap2").
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
from ..ops.audio import load_wav, melspec_ap2
from ..utils.checkpoint import save_checkpoint
from ..utils.logging_utils import MetricsLogger
from ..utils.paths import PathManager
from ..vocoders.hifigan import generator_apply, init_generator
from ..vocoders.hifigan_discriminators import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    init_mpd,
    init_msd,
    mpd_apply,
    msd_apply,
)


class HiFiGANTrainer:
    def __init__(self, **params):
        self.params = params
        output_path = os.path.join(
            params["output_path"], params.get("method", "hifigan"),
            params["experiment_name"],
        )
        self.path_manager = PathManager(output_path)
        save_params(params, os.path.join(output_path, "params.yml"))
        self.logger = MetricsLogger(
            self.path_manager.logs_path,
            use_tensorboard=params.get("use_tensorboard", True),
        )

        self.h = dict(params["hifigan"])
        ap = params["audio_params"]
        self.hop = ap["hop_size"]
        total_up = int(np.prod(self.h["upsample_rates"]))
        assert total_up == self.hop, (
            f"upsample_rates product {total_up} != hop_size {self.hop}"
        )
        self.segment_size = int(params.get("segment_size", 8192))
        assert self.segment_size % self.hop == 0
        self.mel_frames = self.segment_size // self.hop

        self._load_corpus()
        rng = jax.random.PRNGKey(params.get("model_seed", 0))
        k_g, k_p, k_s = jax.random.split(rng, 3)
        n_mels = ap["n_mels"]
        self.gen_params = init_generator(k_g, self.h, n_mels=n_mels)
        self.disc_params = {"mpd": init_mpd(k_p), "msd": init_msd(k_s)}

        lr = float(params.get("lr", 2e-4))
        self.tx_g = optax.adamw(lr, b1=0.8, b2=0.99, weight_decay=0.0)
        self.tx_d = optax.adamw(lr, b1=0.8, b2=0.99, weight_decay=0.0)
        self.opt_g = self.tx_g.init(self.gen_params)
        self.opt_d = self.tx_d.init(self.disc_params)

        # optional SPMD: ``parallel: {dp: N}`` shards the batch axis
        # over an ICI mesh; params/opts replicated, grad psums by GSPMD
        from ..parallel.sharding import DpShard

        self.shard = DpShard.from_params(params)
        if self.shard is not None:
            for attr in ("gen_params", "disc_params", "opt_g", "opt_d"):
                setattr(self, attr,
                        self.shard.replicate(getattr(self, attr)))

        self._step_jit = jax.jit(self._step, donate_argnums=(0, 1, 2, 3))
        self.step_global = 0

    # ------------------------------------------------------------- data
    def _load_corpus(self):
        dataset_train, _, _ = build_datasets(**self.params)
        self.dataset = dataset_train
        self._wav_cache: dict[str, np.ndarray | None] = {}

    def _sample_batch(self, rng: np.random.Generator, batch_size: int):
        ap = self.params["audio_params"]
        mels, wavs = [], []
        while len(mels) < batch_size:
            it = self.dataset.items[
                rng.integers(0, len(self.dataset.items))
            ]
            if it.item_id not in self._wav_cache:
                try:
                    w = load_wav(
                        it.audio_path, target_sample_rate=ap["sample_rate"]
                    )
                    # keep the dataset's silence trim: the generator
                    # should train on the same speech region the rest of
                    # the pipeline featurizes (mels here are recomputed
                    # from the segment, so this is consistency, not the
                    # alignment requirement wavernn_train has)
                    if it.trim is not None:
                        w = w[it.trim[0] : it.trim[1]]
                    self._wav_cache[it.item_id] = w
                except (FileNotFoundError, TypeError):
                    self._wav_cache[it.item_id] = None
            wav = self._wav_cache[it.item_id]
            if wav is None or len(wav) < self.segment_size + 1:
                continue
            start = int(rng.integers(0, len(wav) - self.segment_size))
            start = (start // self.hop) * self.hop
            seg = wav[start : start + self.segment_size]
            _, _, mel = melspec_ap2(seg[None, :], ap, xp=np)
            mels.append(mel[0][:, : self.mel_frames])
            wavs.append(seg)
        return (
            jnp.asarray(np.stack(mels).astype(np.float32)),
            jnp.asarray(np.stack(wavs).astype(np.float32)),
        )

    # ------------------------------------------------------------- step
    def _step(self, gen_params, disc_params, opt_g, opt_d, mels, wav):
        ap = self.params["audio_params"]
        y = wav[:, None, :]  # (B, 1, T)

        # ---- discriminator update
        y_hat = generator_apply(gen_params, self.h, mels)[:, None, :]
        y_hat_sg = jax.lax.stop_gradient(y_hat)

        def d_loss_fn(dp):
            r_p, g_p, _, _ = mpd_apply(dp["mpd"], y, y_hat_sg)
            l_p, _, _ = discriminator_loss(r_p, g_p)
            r_s, g_s, _, _ = msd_apply(dp["msd"], y, y_hat_sg)
            l_s, _, _ = discriminator_loss(r_s, g_s)
            return l_p + l_s

        d_loss, d_grads = jax.value_and_grad(d_loss_fn)(disc_params)
        d_updates, opt_d = self.tx_d.update(d_grads, opt_d, disc_params)
        disc_params = optax.apply_updates(disc_params, d_updates)

        # ---- generator update (fresh discriminators)
        def g_loss_fn(gp):
            y_g = generator_apply(gp, self.h, mels)[:, None, :]
            _, _, mel_g = melspec_ap2(y_g[:, 0, :], ap, xp=jnp)
            mel_loss = jnp.mean(
                jnp.abs(mel_g[:, :, : self.mel_frames] - mels)
            ) * 45.0
            _, g_p, f_rp, f_gp = mpd_apply(disc_params["mpd"], y, y_g)
            _, g_s, f_rs, f_gs = msd_apply(disc_params["msd"], y, y_g)
            adv_p, _ = generator_loss(g_p)
            adv_s, _ = generator_loss(g_s)
            fm = feature_loss(f_rp, f_gp) + feature_loss(f_rs, f_gs)
            return adv_p + adv_s + fm + mel_loss, mel_loss

        (g_loss, mel_loss), g_grads = jax.value_and_grad(
            g_loss_fn, has_aux=True
        )(gen_params)
        g_updates, opt_g = self.tx_g.update(g_grads, opt_g, gen_params)
        gen_params = optax.apply_updates(gen_params, g_updates)

        return gen_params, disc_params, opt_g, opt_d, {
            "loss_d": d_loss,
            "loss_g": g_loss,
            "loss_mel": mel_loss,
        }

    # -------------------------------------------------------------- run
    def run(self):
        params = self.params
        rng = np.random.default_rng(params.get("train_seed", 0))
        batch_size = int(params.get("batch_size", 16))
        n_steps = int(params.get("n_steps", 1000))
        metrics = {}
        for step in range(1, n_steps + 1):
            mels, wav = self._sample_batch(rng, batch_size)
            if self.shard is not None:
                mels, wav = self.shard.put_batch(mels, wav)
            (
                self.gen_params,
                self.disc_params,
                self.opt_g,
                self.opt_d,
                metrics,
            ) = self._step_jit(
                self.gen_params, self.disc_params, self.opt_g,
                self.opt_d, mels, wav,
            )
            self.step_global += 1
            if step % params.get("tb_log_interval", 10) == 0:
                self.logger.log_scalars(
                    {
                        f"train/{k}": (float(v), self.step_global)
                        for k, v in metrics.items()
                    }
                )
            if step % params.get("print_interval", 10) == 0:
                print(
                    f"| step {step}/{n_steps} :: "
                    + " ".join(
                        f"{k}={float(v):#.4}" for k, v in metrics.items()
                    )
                )
            if step % params.get("ckpt_save_step_interval", 500) == 0:
                self._save()
        self._save()
        return {k: float(v) for k, v in metrics.items()}

    def _save(self):
        save_checkpoint(
            os.path.join(
                self.path_manager.checkpoints_path,
                f"hifigan_{self.step_global}.ckpt",
            ),
            {
                "generator": self.gen_params,
                "discriminators": self.disc_params,
                "opt_g": self.opt_g,
                "opt_d": self.opt_d,
                "step": self.step_global,
            },
        )


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    HiFiGANTrainer(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
