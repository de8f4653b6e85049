"""Shared scaffolding for the meta-trainers (MAML, Reptile).

Mirrors the reference ``MetaTrainer`` responsibilities
(msa_tts/metatrainer.py:14-162): paths/logging, meta-train and meta-test
episodic loaders, model, inner + outer optimizers, checkpointing.
"""

from __future__ import annotations

import os

import jax
import numpy as np

from ..dataloaders.loader_meta import get_dataloader as get_dataloader_meta
from ..meta.maml import make_metatest_fn
from ..ops.metrics import mcd_batch
from ..utils.plot import plot_spec_attn_example
from .base import TrainerBase
from .train_state import make_optimizer


class MetaTrainer(TrainerBase):
    def _init_dataloaders(self):
        print("\nInitializing meta-train loaders")
        self.dataloader_metatrain, logs_mtr = get_dataloader_meta(
            "metatrain", **self.params
        )
        print("\nInitializing meta-test loaders")
        self.dataloader_metatest, logs_mts = get_dataloader_meta(
            "metatest", **self.params
        )
        with open(
            os.path.join(self.path_manager.output_path, "dataset_details.txt"),
            "w",
        ) as f:
            f.write(
                "Meta-Train:\n\n" + logs_mtr
                + "\n\n\nMeta-Test:\n\n" + logs_mts
            )

    def _num_speakers(self) -> int:
        return len(self.dataloader_metatrain.ds_support.speaker_to_id)

    def _meta_loss_fn(self):
        def loss_fn(params, model_state, batch, rng):
            loss, (_, new_ms) = self._loss_for_batch(
                params, model_state, batch, rng, train=True
            )
            return loss, new_ms

        return loss_fn

    def _init_criterion_optimizer(self):
        super()._init_criterion_optimizer()
        # Outer optimizer replaces the base `optim`.
        self.outer_tx = make_optimizer(
            self.params.get("optim_outer", self.params["optim"])
        )
        self.inner_tx = make_optimizer(self.inner_optim_cfg)
        self.train_state = self.train_state._replace(
            opt_state=self.outer_tx.init(self.train_state.params)
        )
        metatest = make_metatest_fn(
            self._meta_loss_fn(),
            self.inner_tx,
            int(self.params.get("n_inner_test", 1)),
        )
        self._metatest_jit = jax.jit(
            jax.vmap(metatest, in_axes=(None, None, 0, 0, 0))
        )

    # ------------------------------------------------------- episodes
    def _iter_episodes_prefetched(self, loader):
        """Yield ``(speakers, sup, qry)`` with episodes unpacked and
        device-placed ``prefetch`` meta-batches ahead — the meta flavor
        of the joint trainer's input pipeline (baseline.py).  The train
        loops pull per-step metrics to the host, which blocks until the
        step finishes; without pull-ahead the next episode's unpack +
        upload would run while the device sits idle (~7% of a headline
        step — BENCHMARKS.md footnote on host re-upload)."""
        from .baseline import unpack_task_batch
        from ..dataloaders.prefetch import prefetch_to_device

        def gen():
            for speakers, support, query in loader.iter_stacked():
                sup = self._put_task_batch(
                    unpack_task_batch(support, self.speaker_emb_type)
                )
                qry = self._put_task_batch(
                    unpack_task_batch(query, self.speaker_emb_type)
                )
                yield speakers, sup, qry

        n = int(self.params.get("prefetch", 2))
        if n <= 0:
            return gen()
        # placement already happened in gen(); prefetch only pulls ahead
        return prefetch_to_device(gen(), size=n, put=lambda x: x)

    # -------------------------------------------------------- metatest
    def _metatest(self, epoch: int, rng):
        from .baseline import unpack_task_batch
        from ..models import tacotron2nv_forward

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
                # Forward with the adapted params for MCD + example plots.
                task_params = jax.tree_util.tree_map(
                    lambda x: x[i], adapted
                )
                task_ms = jax.tree_util.tree_map(lambda x: x[i], ms)
                task_qry = {
                    k: v[i] for k, v in qry.items()
                }
                # jitted + shape-cached: the eager forward re-dispatched
                # the whole teacher-forced graph op-by-op per speaker per
                # meta-test batch — a large host stall on TPU
                if not hasattr(self, "_metatest_fwd_jit"):
                    def _fwd(p, ms, i_, il, m, mlen, sv, key):
                        outs, _ = tacotron2nv_forward(
                            p, ms, self.cfg, i_, il, m, mlen, sv, key,
                            train=True,
                        )
                        return outs

                    self._metatest_fwd_jit = jax.jit(_fwd)
                outs = self._metatest_fwd_jit(
                    task_params,
                    task_ms,
                    task_qry["inputs"],
                    task_qry["input_lengths"],
                    task_qry["melspecs"],
                    task_qry["melspec_lengths"],
                    task_qry["speaker_vecs"],
                    keys[i],
                )
                mcd = float(
                    mcd_batch(
                        np.swapaxes(np.asarray(outs[1]), 1, 2),
                        np.swapaxes(np.asarray(task_qry["melspecs"]), 1, 2),
                        np.asarray(task_qry["melspec_lengths"]),
                        xp=np,
                    )
                )
                if self.params.get("plot_examples", True):
                    idx = -1
                    plot_spec_attn_example(
                        np.asarray(outs[1][idx]),
                        np.asarray(task_qry["melspecs"][idx]),
                        np.asarray(outs[3][idx]),
                        os.path.join(
                            self.path_manager.examples_path,
                            f"metatest_epoch-{epoch}_{spk}",
                        ),
                        length_mel=int(task_qry["melspec_lengths"][idx]),
                        length_attn=int(task_qry["input_lengths"][idx]),
                    )
                self.log_writer(
                    {
                        f"test/loss_{spk}": (loss_test, self.step_global),
                        f"test/mcd_{spk}": (mcd, self.step_global),
                    }
                )
                print(
                    f"| Epoch: {epoch}, itr: {self.step_global}, spk:{spk}"
                    f" ::  step loss: {loss_test:#.4} | mcd: {mcd:#.4} "
                )
