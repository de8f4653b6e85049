"""Shared scaffolding for continual (sequential per-speaker) trainers.

Reference protocol (msa_tts/continual_er.py): shuffle the speaker list
with ``speaker_seed``, optionally pre-train on ``num_initial_speakers``,
then for each speaker in the stream: fresh dataloaders + fresh
optimizer, train up to ``n_max_epochs`` with early stopping on the
task's test loss, save ``best_{itr}_{speaker}`` checkpoint, and evaluate
the model on every speaker seen so far (backward-transfer matrix pickled
to ``cumutest.pkl``).

TPU redesign: the whole corpus is feature-cached once at startup; a
"task dataloader" is a view over cached items, so the stream never
re-reads audio.  The replay buffer is a list of cached items sampled
with a seeded RNG.
"""

from __future__ import annotations

import dataclasses
import os
import pickle
import random

import jax
import numpy as np

from ..dataloaders.dataset import Item, TTSDataset
from ..dataloaders.loader_default import DataLoader
from ..dataloaders.metafile import parse_metafile, split_speakers
from ..utils.plot import plot_spec_attn_example
from .base import TrainerBase


class ContinualTrainerBase(TrainerBase):
    def __init__(self, **params):
        self.all_speakers = list(params["dataset_train"]["speakers_list"])
        random.Random(params.get("speaker_seed", 0)).shuffle(
            self.all_speakers
        )
        self._buffer_rng = np.random.default_rng(
            params.get("buffer_seed", params.get("speaker_seed", 0))
        )
        super().__init__(**params)

    # ------------------------------------------------------------ data
    def _init_dataloaders(self):
        """Cache the full corpus once; per-task loaders are views."""
        params = self.params
        ds_cfg = params["dataset_train"]
        utts = parse_metafile(
            os.path.join(ds_cfg["dataset_path"], ds_cfg["meta_file"])
        )
        splits, logs = split_speakers(
            utts,
            self.all_speakers,
            total_duration_per_spk=ds_cfg.get("total_duration_per_spk", -1),
            perc_train=ds_cfg.get("perc_train", 0.9),
            seed=params.get("dataset_random_seed", 0),
        )
        common = dict(
            dataset_path=ds_cfg["dataset_path"],
            audio_folder=ds_cfg.get("audio_folder", "wavs"),
            trim_margin_silence=ds_cfg.get("trim_margin_silence", False),
            ref_level_db=ds_cfg.get("ref_level_db", 26),
            audio_processor=params.get("audio_processor", "ap"),
            audio_params=params["audio_params"],
        )
        self.dataset_train_all = TTSDataset(splits, "train", **common)
        self.dataset_test_all = TTSDataset(splits, "test", **common)
        with open(
            os.path.join(self.path_manager.output_path, "dataset_details.txt"),
            "w",
        ) as f:
            f.write("Train:\n\n" + logs)

    def _num_speakers(self) -> int:
        # The reference pins num_speakers to 1 for continual streams
        # (continual_er.py:111) — conditioning comes from d-vectors.
        return 1

    def _task_items(self, speakers: list[str], mode: str) -> list[Item]:
        ds = (
            self.dataset_train_all if mode == "train" else self.dataset_test_all
        )
        return [it for it in ds.items if it.speaker in speakers]

    def _make_loader(self, items: list[Item], *, batch_size=None,
                     shuffle=True, seed=0) -> DataLoader:
        params = self.params
        return DataLoader(
            items,
            batch_size=batch_size or params["dataset_train"]["batch_size"],
            shuffle=shuffle,
            seed=seed,
            reduction_factor=params["model"]["n_frames_per_step"],
            text_pad_multiple=params.get("text_pad_multiple", 16),
            mel_pad_multiple=params.get("mel_pad_multiple", 32),
        )

    # -------------------------------------------------------- buffer ops
    def _sample_items(self, items: list[Item], n: int) -> list[Item]:
        n = min(n, len(items))
        idx = self._buffer_rng.permutation(len(items))[:n]
        return [items[i] for i in idx]

    # ---------------------------------------------------------- training
    def _train_task(self, speaker: str, spk_itr: int, items: list[Item],
                    rng) -> bool:
        """Epoch loop with early stopping on the task test loss
        (reference continual_er.py:273-313).  Returns False when
        preempted before the task completed."""
        params = self.params
        loader = self._make_loader(items, seed=spk_itr)
        test_items = self._task_items([speaker], "test")
        test_loader = self._make_loader(
            test_items, shuffle=False, seed=spk_itr
        )

        speaker_losses: list[float] = []
        last = None
        for epoch in range(1, params.get("n_max_epochs", 1) + 1):
            for itr, batch in enumerate(loader, 1):
                if batch.inputs.shape[0] == 1:
                    continue  # reference skips singleton batches (:279-280)
                if self._preempt_requested():
                    return False
                inputs = self._unpack_batch(batch)
                step_rng = jax.random.fold_in(rng, self.step_global)
                self.train_state, metrics, outs = self._task_step(
                    self.train_state, inputs, step_rng
                )
                self._heartbeat()
                loss = float(metrics["loss"])
                mcd = float(metrics["mcd"])
                print(
                    f"|Speaker {spk_itr}/{len(self.all_speakers)}: Epoch "
                    f"{epoch} - {self.step_global}, itr {itr}/{len(loader)} "
                    f"::  step loss: {loss:#.4} | mcd: {mcd:#.4}"
                )
                if (
                    self.step_global
                    % params.get("tb_log_interval", 10) == 0
                ):
                    self.log_writer(
                        {
                            "train/loss": (loss, self.step_global),
                            "train/mcd": (mcd, self.step_global),
                        }
                    )
                self.step_global += 1
                last = (inputs, outs)

            if epoch % params.get("test_interval", 1) == 0:
                loss_test = self._test_task(epoch, speaker, test_loader, rng)
                speaker_losses.append(loss_test)
                if params.get("early_stopping", False):
                    k = params.get("early_stopping_steps", 3)
                    if len(speaker_losses) > k and speaker_losses[
                        -k - 1
                    ] < min(speaker_losses[-k:]):
                        print("Early stopping")
                        break

        if last is not None and params.get("plot_examples", True):
            inputs, outs = last
            idx = -1
            plot_spec_attn_example(
                np.asarray(outs[1][idx]),
                np.asarray(inputs["melspecs"][idx]),
                np.asarray(outs[3][idx]),
                os.path.join(
                    self.path_manager.examples_path,
                    f"{spk_itr}_train-spk{speaker}",
                ),
                length_mel=int(inputs["melspec_lengths"][idx]),
                length_attn=int(inputs["input_lengths"][idx]),
            )
        return True

    def _task_step(self, state, inputs, rng):
        """The jitted optimization step for the current task (overridden
        by EWC to add the penalty)."""
        return self._train_step_jit(state, inputs, rng)

    def _test_task(self, epoch: int, speaker: str, test_loader, rng) -> float:
        loss_total, mcd_total, n = 0.0, 0.0, 0
        for itr, batch in enumerate(test_loader, 1):
            inputs = self._unpack_batch(batch)
            self.train_state, metrics, _ = self._eval_step_jit(
                self.train_state, inputs, jax.random.fold_in(rng, itr)
            )
            self._heartbeat()
            loss_total += float(metrics["loss"])
            mcd_total += float(metrics["mcd"])
            n += 1
        if n == 0:
            return float("inf")
        loss_total /= n
        mcd_total /= n
        self.log_writer(
            {
                f"test/loss_{speaker}": (loss_total, self.step_global),
                f"test/mcd_{speaker}": (mcd_total, self.step_global),
            }
        )
        print(
            f"| Epoch: {epoch}, itr: {self.step_global} ::  loss_total:"
            f" {loss_total:#.4} | mcd_total: {mcd_total:#.4} "
        )
        return loss_total

    # --------------------------------------------------- cumulative test
    def _test_cumulative(self, speaker: str, spk_itr: int, rng) -> None:
        print("-" * 20, "Cumulative Testing")
        self.cumutest_dict[spk_itr] = {"speaker": speaker, "losses": {}}
        for test_speaker in self.speakers_so_far:
            test_loader = self._make_loader(
                self._task_items([test_speaker], "test"), shuffle=False
            )
            loss_total, n = 0.0, 0
            last = None
            for itr, batch in enumerate(test_loader, 1):
                inputs = self._unpack_batch(batch)
                self.train_state, metrics, outs = self._eval_step_jit(
                    self.train_state, inputs, jax.random.fold_in(rng, itr)
                )
                self._heartbeat()
                loss_total += float(metrics["loss"])
                n += 1
                last = (inputs, outs)
            loss_total = loss_total / max(n, 1)
            print(
                f"| Speaker: {test_speaker}, itr: {self.step_global} ::"
                f"  loss_total: {loss_total:#.4}"
            )
            self.cumutest_dict[spk_itr]["losses"][test_speaker] = loss_total
            if last is not None and self.params.get("plot_examples", True):
                inputs, outs = last
                idx = -1
                plot_spec_attn_example(
                    np.asarray(outs[1][idx]),
                    np.asarray(inputs["melspecs"][idx]),
                    np.asarray(outs[3][idx]),
                    os.path.join(
                        self.path_manager.examples_path,
                        f"cumTest_{spk_itr}_spk-{speaker}"
                        f"_to_spk-{test_speaker}",
                    ),
                    length_mel=int(inputs["melspec_lengths"][idx]),
                    length_attn=int(inputs["input_lengths"][idx]),
                )
        with open(
            os.path.join(self.path_manager.examples_path, "cumutest.pkl"),
            "wb",
        ) as f:
            pickle.dump(self.cumutest_dict, f)
        print("-" * 30 + "\n")

    # ------------------------------------------------------------ resume
    # The reference only leaves per-task ``best_{itr}_{spk}`` checkpoints
    # behind (continual_er.py:185-187) — a dead multi-hour stream restarts
    # from speaker 0.  Here the full stream state (position, replay
    # buffer, RNGs, cumutest matrix, train state incl. optimizer) is
    # persisted after every task, and ``resume: true`` restarts at task k
    # bit-identically (tested in test_continual_trainers.py).

    _STREAM_STATE = "stream_state.pkl"
    _STREAM_CKPT = "stream_last.ckpt"

    def _stream_extras(self) -> dict:
        """Method-specific picklable stream state.  The replay buffer is
        serialized as (item_id, soft_mel) pairs — items are re-bound to
        the feature cache on restore (EWC's Fisher needs no saving: it is
        recomputed at task start from the restored buffer + params)."""
        extras = {}
        if hasattr(self, "buffer"):
            extras["buffer"] = [
                (it.item_id, it.soft_mel) for it in self.buffer
            ]
        return extras

    def _restore_stream_extras(self, extras: dict) -> None:
        if "buffer" in extras:
            by_id = {it.item_id: it for it in self.dataset_train_all.items}
            buf = []
            for item_id, soft_mel in extras["buffer"]:
                it = by_id[item_id]
                if soft_mel is not None:
                    it = dataclasses.replace(
                        it, soft_mel=np.asarray(soft_mel)
                    )
                buf.append(it)
            self.buffer = buf

    def _save_stream_state(self, next_spk_itr: int, rng) -> None:
        import copy

        # Snapshot every mutable container NOW: the async writer may
        # pickle after the next task has already appended speakers /
        # advanced the buffer rng, and a state newer than its
        # next_spk_itr breaks bit-identical resume.
        payload = {
            "next_spk_itr": next_spk_itr,
            "all_speakers": list(self.all_speakers),
            "speakers_so_far": list(self.speakers_so_far),
            "cumutest_dict": copy.deepcopy(self.cumutest_dict),
            "step_global": self.step_global,
            "rng": np.asarray(rng),
            "buffer_rng": copy.deepcopy(self._buffer_rng),
            "extras": self._stream_extras(),
        }
        path = os.path.join(
            self.path_manager.checkpoints_path, self._STREAM_STATE
        )
        # ONE atomic file: the full-fidelity checkpoint rides inside the
        # stream pickle as msgpack bytes, so a kill can never pair a
        # newer checkpoint with an older stream position.
        if self.params.get("async_checkpoint", True):
            if not hasattr(self, "_async_ckpt"):
                from ..utils.checkpoint import AsyncCheckpointer

                self._async_ckpt = AsyncCheckpointer()
            self._async_ckpt.save_pickle(
                path, payload, ckpt_payload=self._ckpt_payload()
            )
            return
        from ..utils.checkpoint import serialize_payload

        payload["ckpt"] = serialize_payload(self._ckpt_payload())
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, path)

    def _try_resume(self):
        """Returns ``(next_spk_itr, rng)`` when resuming, else None."""
        if not self.params.get("resume", False):
            return None
        from ..utils.checkpoint import wait_all_checkpoints

        wait_all_checkpoints()
        path = os.path.join(
            self.path_manager.checkpoints_path, self._STREAM_STATE
        )
        if not os.path.exists(path):
            print("resume requested but no stream state found; "
                  "starting fresh")
            return None
        with open(path, "rb") as f:
            d = pickle.load(f)
        if d["all_speakers"] != self.all_speakers:
            raise ValueError(
                "stream state speaker order does not match this config "
                "(speaker_seed / speakers_list changed?)"
            )
        if d.get("ckpt") is not None:
            from ..utils.checkpoint import deserialize_payload

            self.restore_raw(deserialize_payload(d["ckpt"]))
        else:  # legacy two-file layout
            self.restore(
                os.path.join(
                    self.path_manager.checkpoints_path, self._STREAM_CKPT
                )
            )
        self.step_global = int(d["step_global"])
        self.speakers_so_far = list(d["speakers_so_far"])
        self.cumutest_dict = dict(d["cumutest_dict"])
        self._buffer_rng = d["buffer_rng"]
        self._restore_stream_extras(d["extras"])
        rng = jax.numpy.asarray(d["rng"])
        print(
            f"Resuming continual stream at task {d['next_spk_itr']} "
            f"(step {self.step_global})"
        )
        return d["next_spk_itr"], rng

    # ------------------------------------------------------------- hooks
    def _reset_optimizer(self, speaker: str | None = None):
        """Fresh optimizer per task (reference re-inits per speaker)."""
        from .train_state import make_optimizer

        self.tx = make_optimizer(self.params["optim"])
        self.train_state = self.train_state._replace(
            opt_state=self.tx.init(self.train_state.params)
        )
        self._train_step_jit = jax.jit(self._train_step, donate_argnums=(0,))

    def _task_train_items(self, speaker: str, spk_itr: int) -> list[Item]:
        """Items to train on for this task (method-specific)."""
        raise NotImplementedError

    def _initial_task_items(self, speakers: list[str]) -> list[Item]:
        """Items for the optional initial-finetune phase (spk_itr 0);
        method-specific side effects (e.g. buffer seeding) happen here."""
        return self._task_items(speakers, "train")

    def _post_task(self, speaker: str, spk_itr: int) -> None:
        """Hook after a task finishes (e.g. Fisher recomputation)."""

    # --------------------------------------------------------------- run
    def run(self):
        self.step_global = 0
        self.speakers_so_far: list[str] = []
        self.cumutest_dict: dict = {}
        rng = jax.random.PRNGKey(self.params.get("train_seed", 1234))
        num_initial = self.params.get("num_initial_speakers", 0)

        resumed = self._try_resume()
        self._start_watchdog()
        if resumed is not None:
            start_itr, rng = resumed
        else:
            start_itr = num_initial
            if num_initial > 0:
                initial_speakers = self.all_speakers[:num_initial]
                items = self._initial_task_items(initial_speakers)
                rng, k = jax.random.split(rng)
                if not self._train_task(initial_speakers[0], 0, items, k):
                    print("[preemption] initial-finetune phase abandoned; "
                          "resume restarts it")
                    self._stop_watchdog()
                    self._finish_checkpoints()
                    return
                self._save_checkpoint(f"best_0_{initial_speakers[0]}.ckpt")
                self._save_stream_state(num_initial, rng)
        for spk_itr, speaker in enumerate(self.all_speakers, num_initial):
            if spk_itr < start_itr:
                continue
            if self._preempt_requested():
                print(f"[preemption] stopping before task {spk_itr} "
                      f"({speaker}); resume continues there")
                break
            self.speakers_so_far.append(speaker)
            self._reset_optimizer(speaker)
            items = self._task_train_items(speaker, spk_itr)
            rng, k1, k2 = jax.random.split(rng, 3)
            if not self._train_task(speaker, spk_itr, items, k1):
                # preempted mid-task: the stream state saved after the
                # previous task stands; resume restarts this task and
                # replays it bit-identically
                print(f"[preemption] task {spk_itr} ({speaker}) abandoned "
                      "mid-stream; resume restarts it")
                break
            self._save_checkpoint(f"best_{spk_itr}_{speaker}.ckpt")
            self._post_task(speaker, spk_itr)
            self._test_cumulative(speaker, spk_itr, k2)
            self._save_stream_state(spk_itr + 1, rng)
        self._stop_watchdog()
        self._finish_checkpoints()
