"""Continual learning with ER + Knowledge Distillation (soft targets).

Reference: msa_tts/continual_erkd.py — when items enter the replay
buffer, the *current model's* teacher-forced postnet prediction is
cached as their mel target, so later replay distills the old model's
behavior instead of replaying ground truth
(continual_erkd.py:72-83,105-116 via the buffer dataloader's mutable
``melspec`` slot, dataloader_default_buffer.py:93-96).  Our cached
:class:`Item` carries the same slot (``soft_mel``).
Entry point: ``python -m msa_tts_tpu.trainers.continual_erkd``.
"""

from __future__ import annotations

import argparse
import dataclasses
import os

import jax
import numpy as np

from ..dataloaders.collate import collate
from ..models import tacotron2nv_forward
from .continual_base import ContinualTrainerBase


class ExperienceReplayKnowledgeDistillTrainer(ContinualTrainerBase):
    def _soften(self, items):
        """Replace each item's mel target with the current model's
        teacher-forced prediction (truncated to the true length)."""
        out = []
        rng = jax.random.PRNGKey(self.params.get("kd_seed", 7))
        bs = self.params.get("buffer_batch_size",
                             self.params["dataset_train"]["batch_size"])
        for start in range(0, len(items), bs):
            chunk = items[start : start + bs]
            batch = collate(
                chunk,
                reduction_factor=self.cfg.n_frames_per_step,
                sort_by_length=False,
                use_soft_mel=False,
            )
            inputs = self._unpack_batch(batch)
            # jitted + shape-cached: this runs for every buffer chunk at
            # every task boundary — eagerly it re-dispatches the full
            # teacher-forced graph op-by-op each time
            if not hasattr(self, "_soften_fwd_jit"):
                def _fwd(p, ms, i_, il, m, mlen, sv, key):
                    outs, _ = tacotron2nv_forward(
                        p, ms, self.cfg, i_, il, m, mlen, sv, key,
                        train=True,
                    )
                    return outs

                self._soften_fwd_jit = jax.jit(_fwd)
            outs = self._soften_fwd_jit(
                self.train_state.params,
                self.train_state.model_state,
                inputs["inputs"],
                inputs["input_lengths"],
                inputs["melspecs"],
                inputs["melspec_lengths"],
                inputs["speaker_vecs"],
                rng,
            )
            mel_post = np.asarray(outs[1])
            for i, it in enumerate(chunk):
                L = it.mel.shape[1]
                out.append(
                    dataclasses.replace(it, soft_mel=mel_post[i, :, :L])
                )
        return out

    def _initial_task_items(self, speakers):
        items = self._task_items(speakers, "train")
        self.buffer = self._soften(
            self._sample_items(items, self.params["buffer_sample_size"])
        )
        return items

    def _task_train_items(self, speaker: str, spk_itr: int):
        current = self._task_items([speaker], "train")
        if not hasattr(self, "buffer"):
            self.buffer = self._soften(
                self._sample_items(
                    current, self.params["buffer_sample_size"]
                )
            )
            return current
        train_items = current + list(self.buffer)
        self.buffer = list(self.buffer) + self._soften(
            self._sample_items(current, self.params["buffer_sample_size"])
        )
        return train_items


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    ExperienceReplayKnowledgeDistillTrainer(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
