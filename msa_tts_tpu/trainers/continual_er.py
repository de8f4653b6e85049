"""Continual learning with Experience Replay (ER).

Reference: msa_tts/continual_er.py.  A fixed-size-per-task replay
buffer: at the first task the buffer is seeded with
``buffer_sample_size`` random items; at every later task training runs
on (current speaker's data ∪ buffer) and afterwards ``buffer_sample_size``
random items of the current task are appended to the buffer.  Entry
point: ``python -m msa_tts_tpu.trainers.continual_er --params_path <dir>``.
"""

from __future__ import annotations

import argparse
import os

from .continual_base import ContinualTrainerBase


class ExperienceReplayTrainer(ContinualTrainerBase):
    def _initial_task_items(self, speakers):
        items = self._task_items(speakers, "train")
        self.buffer = self._sample_items(
            items, self.params["buffer_sample_size"]
        )
        return items

    def _task_train_items(self, speaker: str, spk_itr: int):
        current = self._task_items([speaker], "train")
        if not hasattr(self, "buffer"):
            # First task seeds the buffer and trains on its own data only
            # (reference continual_er.py:261-263).
            self.buffer = self._sample_items(
                current, self.params["buffer_sample_size"]
            )
            return current
        train_items = current + list(self.buffer)
        self.buffer = list(self.buffer) + self._sample_items(
            current, self.params["buffer_sample_size"]
        )
        return train_items


def main(args):
    from ..config import load_params

    params = load_params(os.path.join(args.params_path, "params.yml"))
    ExperienceReplayTrainer(**params).run()


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--params_path", type=str, required=True)
    main(parser.parse_args())
