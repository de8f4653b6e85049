"""MAML meta-trainer (second-order or first-order).

Reference: msa_tts/maml.py.  ``track_higher_grads: true`` → second-order
MAML (gradients w.r.t. θ₀ through the inner loop); ``false`` → FOMAML
(gradients w.r.t. the adapted params).  The task loop runs vmapped in a
single jitted step — see meta/maml.py.  Entry point:
``python -m msa_tts_tpu.trainers.maml --params_path <dir>``.
"""

from __future__ import annotations

import argparse
import os

import jax

from ..meta.maml import make_maml_step
from .metatrainer import MetaTrainer


class MAML(MetaTrainer):
    def _init_criterion_optimizer(self):
        super()._init_criterion_optimizer()
        clip = (
            float(self.params.get("grad_clip_thresh", 1.0))
            if self.params.get("clip_grad_norm", False)
            else None
        )
        step_fn = make_maml_step(
            self._meta_loss_fn(),
            self.inner_tx,
            self.outer_tx,
            int(self.params.get("n_inner_train", 1)),
            second_order=bool(self.params.get("track_higher_grads", True)),
            clip_thresh=clip,
            remat=bool(self.params.get("maml_remat", True)),
        )
        self._maml_step_jit = jax.jit(step_fn, donate_argnums=(0,))

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
            self.train_state, metrics = self._maml_step_jit(
                self.train_state, sup, qry, jax.random.fold_in(rng, itr_b)
            )
            self._heartbeat()
            loss = float(metrics.loss)
            logs = {
                "train/loss": (loss, self.step_global),
                "train/grad_norm": (
                    float(metrics.grad_norm),
                    self.step_global,
                ),
            }
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
            self.step_global += 1
        return True


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    MAML(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
