"""Joint multi-speaker trainer ("baseline" method).

Reference behavior (msa_tts/baseline.py): epoch loop of teacher-forced
training over all speakers, per-epoch test pass with best-checkpoint
tracking, periodic checkpoints, optional periodic meta-test (k-step
adaptation on held-out speakers).  Entry point:
``python -m msa_tts_tpu.trainers.baseline --params_path <dir>``.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from ..dataloaders.loader_default import get_dataloader
from ..dataloaders.loader_meta import TaskBatch, get_dataloader as get_dataloader_meta
from ..meta.maml import make_metatest_fn
from ..trainers.train_state import make_optimizer
from ..utils.plot import plot_spec_attn_example
from .base import TrainerBase


def unpack_task_batch(tb: TaskBatch, speaker_emb_type: str) -> dict:
    """TaskBatch → jit-ready dict with leading task axis."""
    return {
        "inputs": tb.inputs,
        "input_lengths": tb.input_lengths,
        "melspecs": tb.mels,
        "melspec_lengths": tb.mel_lengths,
        "speaker_vecs": tb.speaker_vecs(speaker_emb_type),
        "stop_labels": tb.stop_labels,
    }


class JointTrainer(TrainerBase):
    def _init_dataloaders(self):
        print("\nInitializing train/test loaders")
        log_ds = ""
        (
            self.dataloader_train,
            self.dataloader_test,
            logs_tr,
        ) = get_dataloader(**self.params)
        log_ds += "Train:\n\n" + logs_tr + "\n\n\n"

        if self.params.get("do_metatest", False):
            print("\nInitializing meta-test loaders")
            self.dataloader_metatest, logs_mts = get_dataloader_meta(
                "metatest", **self.params
            )
            log_ds += "Meta-Test:\n\n" + logs_mts

        with open(
            os.path.join(self.path_manager.output_path, "dataset_details.txt"),
            "w",
        ) as f:
            f.write(log_ds)

    def _num_speakers(self) -> int:
        return len(self.dataloader_train.dataset.speaker_to_id)

    def _init_criterion_optimizer(self):
        super()._init_criterion_optimizer()
        if self.params.get("do_metatest", False):
            inner_tx = make_optimizer(self.inner_optim_cfg)

            def loss_fn(params, model_state, batch, rng):
                loss, (_, new_ms) = self._loss_for_batch(
                    params, model_state, batch, rng, train=True
                )
                return loss, new_ms

            metatest = make_metatest_fn(
                loss_fn, inner_tx, int(self.params.get("n_inner_test", 1))
            )
            self._metatest_jit = jax.jit(
                jax.vmap(metatest, in_axes=(None, None, 0, 0, 0))
            )

    # ------------------------------------------------------------- run
    def run(self):
        self.step_global = 0
        self.best_test_loss = float("inf")
        rng = jax.random.PRNGKey(self.params.get("train_seed", 1234))
        done, extra = self._try_resume_epoch()
        if extra is not None:
            self.best_test_loss = extra.get(
                "best_test_loss", float("inf")
            )
        self._start_watchdog()
        for epoch in range(1, self.params["n_epochs"] + 1):
            # advance the rng stream even for skipped epochs so the
            # resumed run draws the same keys as an uninterrupted one
            rng, k_train, k_test, k_meta = jax.random.split(rng, 4)
            if epoch <= done:
                # keep the stateful samplers aligned with the data order
                # an uninterrupted run would have seen
                self.dataloader_train.skip_epoch()
                if self.params.get("do_metatest", False) and epoch % \
                        self.params.get("metatest_epoch_interval", 1) == 0:
                    self.dataloader_metatest.skip_epoch()
                continue
            if not self._train(epoch, k_train):
                # preempted mid-epoch: the partial epoch cannot be part
                # of a bit-identical resume, so exit on the last saved
                # state (resume replays this epoch from its start)
                print(f"[preemption] stopping mid-epoch {epoch}; "
                      "resume replays it from the last saved state")
                break
            self._test(epoch, k_test)
            saved = epoch % self.params.get(
                "ckpt_save_epoch_interval", 1) == 0
            if saved:
                self._save_checkpoint()
                self._save_epoch_state(
                    epoch, {"best_test_loss": self.best_test_loss}
                )
            if self._preempt_requested():
                if not saved:  # epoch IS complete — persist it
                    self._save_checkpoint()
                    self._save_epoch_state(
                        epoch, {"best_test_loss": self.best_test_loss}
                    )
                print(f"[preemption] stopping after epoch {epoch}")
                break
            if self.params.get("do_metatest", False):
                if epoch % self.params.get("metatest_epoch_interval", 1) == 0:
                    print("Meta-test phase ...")
                    self._metatest(epoch, k_meta)
        self._stop_watchdog()
        self._finish_checkpoints()

    # ----------------------------------------------------------- train
    def _train(self, epoch: int, rng) -> bool:
        """Returns False when preempted before the epoch completed."""
        print(f"===== Training epoch {epoch}")
        profile_dir = self.params.get("profile_dir")
        if profile_dir and epoch == int(self.params.get("profile_epoch", 1)):
            from ..utils.profiling import trace

            with trace(profile_dir):
                return self._train_epoch(epoch, rng)
        return self._train_epoch(epoch, rng)

    def _train_epoch(self, epoch: int, rng) -> bool:
        n_batches = len(self.dataloader_train)
        last = None
        # keep `prefetch` batches uploading while the device computes
        from ..dataloaders.prefetch import prefetch_to_device

        batches = (
            self._unpack_batch(b) for b in self.dataloader_train
        )
        n_prefetch = int(self.params.get("prefetch", 2))
        if n_prefetch > 0:
            batches = prefetch_to_device(batches, size=n_prefetch)
        for itr, inputs in enumerate(batches, 1):
            if self._preempt_requested():
                return False
            step_rng = jax.random.fold_in(rng, itr)
            self.train_state, metrics, outs = self._train_step_jit(
                self.train_state, inputs, step_rng
            )
            self._heartbeat()
            loss = float(metrics["loss"])
            mcd = float(metrics["mcd"])
            if self.step_global % self.params.get("tb_log_interval", 10) == 0:
                self.log_writer(
                    {
                        "train/loss": (loss, self.step_global),
                        "train/mcd": (mcd, self.step_global),
                        "train/grad_norm": (
                            float(metrics["grad_norm"]),
                            self.step_global,
                        ),
                    }
                )
            print(
                f"| Epoch: {epoch} - {self.step_global}, itr: {itr}/"
                f"{n_batches} ::  step loss: {loss:#.4} | mcd: {mcd:#.4} "
            )
            self.step_global += 1
            last = (inputs, outs)

        if last is not None and self.params.get("plot_examples", True):
            self._plot_example(last, f"train-{self.step_global // 1000}K")
        return True

    def _plot_example(self, last, name: str):
        inputs, outs = last
        idx = -1
        mel_post = np.asarray(outs[1][idx])
        attn = np.asarray(outs[3][idx])
        mel_gt = np.asarray(inputs["melspecs"][idx])
        plot_spec_attn_example(
            mel_post,
            mel_gt,
            attn,
            os.path.join(self.path_manager.examples_path, name),
            length_mel=int(inputs["melspec_lengths"][idx]),
            length_attn=int(inputs["input_lengths"][idx]),
        )

    # ------------------------------------------------------------ test
    def _test(self, epoch: int, rng):
        print(f"===== Testing epoch {epoch}")
        loss_total = 0.0
        mcd_total = 0.0
        n = 0
        for itr, batch in enumerate(self.dataloader_test, 1):
            inputs = self._unpack_batch(batch)
            self.train_state, metrics, _ = self._eval_step_jit(
                self.train_state, inputs, jax.random.fold_in(rng, itr)
            )
            self._heartbeat()
            loss_total += float(metrics["loss"])
            mcd_total += float(metrics["mcd"])
            n += 1
        if n == 0:
            return
        loss_total /= n
        mcd_total /= n

        if loss_total < self.best_test_loss:
            self.best_test_loss = loss_total
            self._save_checkpoint("checkpoint_best.ckpt")

        self.log_writer(
            {
                "test/loss": (loss_total, self.step_global),
                "test/mcd": (mcd_total, self.step_global),
            }
        )
        print(
            f"| Epoch: {epoch}, itr: {self.step_global} ::  loss_total:"
            f" {loss_total:#.4} | mcd_total: {mcd_total:#.4} "
        )

    # -------------------------------------------------------- metatest
    def _metatest(self, epoch: int, rng):
        for itr_b, (speakers, support, query) in enumerate(
            self.dataloader_metatest.iter_stacked()
        ):
            K = len(speakers)
            keys = jax.random.split(jax.random.fold_in(rng, itr_b), K)
            sup = unpack_task_batch(support, self.speaker_emb_type)
            qry = unpack_task_batch(query, self.speaker_emb_type)
            qlosses, adapted, ms, _ = self._metatest_jit(
                self.train_state.params,
                self.train_state.model_state,
                sup,
                qry,
                keys,
            )
            self._heartbeat()
            for i, spk in enumerate(speakers):
                loss_test = float(qlosses[i])
                self.log_writer(
                    {f"test/loss_{spk}": (loss_test, self.step_global)}
                )
                print(
                    f"| Epoch: {epoch}, itr: {self.step_global}, spk:{spk}"
                    f" ::  step loss: {loss_test:#.4}"
                )


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    JointTrainer(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
