"""Continual learning with Elastic Weight Consolidation (EWC).

Reference: msa_tts/continual_ewc.py.  The stream keeps an ER-style
sample buffer but trains each task on the current speaker's data only;
the buffer's role is Fisher estimation: at every new task (after adding
the current speaker's samples) a diagonal Fisher is estimated as the
mean squared gradient over the buffer (:59-82), anchored at the current
params θ*, and the loss gains ``ewc_importance · Σ F_i (θ_i − θ*_i)²``
(:84-89, applied :344-347).  Fisher accumulation here is a jitted scan
over buffer batches.  Entry point:
``python -m msa_tts_tpu.trainers.continual_ewc``.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from .continual_base import ContinualTrainerBase
from .train_state import TrainState, clip_by_global_norm


class EWCTrainer(ContinualTrainerBase):
    def _init_criterion_optimizer(self):
        super()._init_criterion_optimizer()
        self._ewc = None  # (fisher, means) once the stream is past task 0

        def grad_sq(params, model_state, batch, rng):
            def loss_fn(p):
                loss, _ = self._loss_for_batch(
                    p, model_state, batch, rng, train=True
                )
                return loss

            g = jax.grad(loss_fn)(params)
            return jax.tree_util.tree_map(lambda x: x * x, g)

        self._grad_sq_jit = jax.jit(grad_sq)
        # no donation: `means` aliases the params buffers at task start
        self._ewc_step_jit = jax.jit(self._ewc_step)

    # --------------------------------------------------------- EWC math
    def _compute_fisher(self, rng):
        buf_loader = self._make_loader(
            list(self.buffer),
            batch_size=self.params.get(
                "buffer_batch_size", self.params["dataset_train"]["batch_size"]
            ),
            shuffle=bool(self.params.get("buffer_shuffle", True)),
        )
        n = max(len(buf_loader), 1)
        fisher = jax.tree_util.tree_map(
            jnp.zeros_like, self.train_state.params
        )
        for itr, batch in enumerate(buf_loader, 1):
            inputs = self._unpack_batch(batch)
            sq = self._grad_sq_jit(
                self.train_state.params,
                self.train_state.model_state,
                inputs,
                jax.random.fold_in(rng, itr),
            )
            fisher = jax.tree_util.tree_map(
                lambda f, s: f + s / n, fisher, sq
            )
        means = jax.tree_util.tree_map(
            lambda x: x, self.train_state.params
        )
        self._ewc = (fisher, means)

    def _ewc_step(self, state: TrainState, batch: dict, rng, fisher, means):
        importance = float(self.params["ewc_importance"])

        def loss_fn(p):
            loss, (outs, new_ms) = self._loss_for_batch(
                p, state.model_state, batch, rng, train=True
            )
            penalty = sum(
                jnp.sum(f * (x - m) ** 2)
                for f, x, m in zip(
                    jax.tree_util.tree_leaves(fisher),
                    jax.tree_util.tree_leaves(p),
                    jax.tree_util.tree_leaves(means),
                )
            )
            return loss + importance * penalty, (outs, new_ms, loss)

        (total, (outs, new_ms, base_loss)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        if self.params.get("clip_grad_norm", False):
            grads, grad_norm = clip_by_global_norm(
                grads, float(self.params.get("grad_clip_thresh", 1.0))
            )
        else:
            grad_norm = jnp.asarray(0.0)
        updates, new_opt_state = self.tx.update(
            grads, state.opt_state, state.params
        )
        new_params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        from ..ops.metrics import mcd_batch

        mcd = mcd_batch(
            jnp.swapaxes(outs[1], 1, 2),
            jnp.swapaxes(batch["melspecs"], 1, 2),
            batch["melspec_lengths"],
        )
        metrics = {"loss": total, "mcd": mcd, "grad_norm": grad_norm,
                   "base_loss": base_loss}
        return (
            TrainState(new_params, new_ms, new_opt_state, state.step + 1),
            metrics,
            outs,
        )

    def _task_step(self, state, inputs, rng):
        if self._ewc is not None:
            fisher, means = self._ewc
            return self._ewc_step_jit(state, inputs, rng, fisher, means)
        return self._train_step_jit(state, inputs, rng)

    # ------------------------------------------------------------ stream
    def _initial_task_items(self, speakers):
        items = self._task_items(speakers, "train")
        self.buffer = self._sample_items(
            items, self.params["buffer_sample_size"]
        )
        return items

    def _task_train_items(self, speaker: str, spk_itr: int):
        current = self._task_items([speaker], "train")
        if not hasattr(self, "buffer"):
            self.buffer = self._sample_items(
                current, self.params["buffer_sample_size"]
            )
            return current
        # t > 0: extend the buffer with the current speaker's samples,
        # then (re)estimate the Fisher anchored at the current params
        # (reference continual_ewc.py:320-325).
        self.buffer = list(self.buffer) + self._sample_items(
            current, self.params["buffer_sample_size"]
        )
        print("Computing EWC Fisher matrix")
        self._compute_fisher(jax.random.PRNGKey(spk_itr))
        return current

    def _reset_optimizer(self, speaker: str | None = None):
        super()._reset_optimizer(speaker)
        # the EWC step uses self.tx; re-jit to pick up the fresh optimizer
        # no donation: `means` aliases the params buffers at task start
        self._ewc_step_jit = jax.jit(self._ewc_step)


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    EWCTrainer(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
