"""Reptile meta-trainer.

Reference: msa_tts/reptile.py (first-order meta-learning, outer step
−(θ_T−θ₀) applied per speaker).  ``reptile_mode: sequential`` (default)
reproduces the per-speaker update order inside one compiled scan;
``batched`` averages directions across vmapped tasks.  Entry point:
``python -m msa_tts_tpu.trainers.reptile --params_path <dir>``.
"""

from __future__ import annotations

import argparse
import os

import jax

from ..meta.reptile import make_reptile_step
from .metatrainer import MetaTrainer


class Reptile(MetaTrainer):
    def _init_criterion_optimizer(self):
        super()._init_criterion_optimizer()
        clip = (
            float(self.params.get("grad_clip_thresh", 1.0))
            if self.params.get("clip_grad_norm", False)
            else None
        )
        step_fn = make_reptile_step(
            self._meta_loss_fn(),
            self.inner_tx,
            self.outer_tx,
            int(self.params.get("n_inner_train", 1)),
            mode=self.params.get("reptile_mode", "sequential"),
            clip_thresh=clip,
        )
        self._reptile_step_jit = jax.jit(step_fn, donate_argnums=(0,))

    def run(self):
        self.step_global = 0
        rng = jax.random.PRNGKey(self.params.get("train_seed", 1234))
        done, _ = self._try_resume_epoch()
        self._start_watchdog()
        for epoch in range(1, self.params["n_epochs"] + 1):
            rng, k_train, k_meta = jax.random.split(rng, 3)
            if epoch <= done:
                self.dataloader_metatrain.skip_epoch()
                if epoch % self.params.get(
                        "metatest_epoch_interval", 1) == 0:
                    self.dataloader_metatest.skip_epoch()
                continue
            if not self._metatrain(epoch, k_train):
                print(f"[preemption] stopping mid-epoch {epoch}; "
                      "resume replays it from the last saved state")
                break
            saved = epoch % self.params.get(
                "ckpt_save_epoch_interval", 1) == 0
            if saved:
                self._save_checkpoint()
                self._save_epoch_state(epoch)
            if self._preempt_requested():
                if not saved:
                    self._save_checkpoint()
                    self._save_epoch_state(epoch)
                print(f"[preemption] stopping after epoch {epoch}")
                break
            if epoch % self.params.get("metatest_epoch_interval", 1) == 0:
                print("Meta-test phase ...")
                self._metatest(epoch, k_meta)
        self._stop_watchdog()
        self._finish_checkpoints()

    def _metatrain(self, epoch: int, rng) -> bool:
        """Returns False when preempted before the epoch completed."""
        for itr_b, (speakers, sup, qry) in enumerate(
            self._iter_episodes_prefetched(self.dataloader_metatrain)
        ):
            if self._preempt_requested():
                return False
            self.train_state, metrics = self._reptile_step_jit(
                self.train_state, sup, qry, jax.random.fold_in(rng, itr_b)
            )
            self._heartbeat()
            logs = {"train/loss": (float(metrics.loss), self.step_global)}
            for i, spk in enumerate(speakers):
                logs[f"train/loss_{spk}"] = (
                    float(metrics.task_losses[i]),
                    self.step_global,
                )
                print(
                    f"| Epoch: {epoch}, itr: {self.step_global}, spk:{spk}"
                    f" ::  step loss: {float(metrics.task_losses[i]):#.4}"
                )
            self.log_writer(logs)
            # Reference counts one global step per speaker in Reptile
            # (reptile.py:92); keep one per meta-batch × K for parity.
            self.step_global += len(speakers)
        return True


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    Reptile(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
