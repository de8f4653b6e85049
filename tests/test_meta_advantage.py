"""The framework's reason to exist, asserted: a Reptile-meta-trained
initialization adapts to held-out speakers in a few gradient steps
better than a joint-trained initialization on the same data/steps
(benchmarks/meta_advantage.py runs the full protocol incl. MAML and the
reference cross-check; this test pins the core claim on a small budget).
"""

import os
import sys

import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def test_reptile_init_beats_joint_init_at_low_k():
    from benchmarks import meta_advantage as M

    train_spk, test_spk = M.build_corpus(seed=0)
    cfg, st_rep, _ = M.meta_train("reptile", train_spk, 150, seed=0)
    cfg, st_joint, _ = M.joint_train(train_spk, 150, seed=0)

    for k in (1, 5):
        rep_l, rep_m = M.adapt_eval(cfg, st_rep, test_spk, k)
        joi_l, joi_m = M.adapt_eval(cfg, st_joint, test_spk, k)
        # meta-init must adapt measurably better, loss AND MCD
        assert rep_l.mean() < joi_l.mean() - 0.1, (
            f"k={k}: reptile {rep_l.mean():.3f} !< joint "
            f"{joi_l.mean():.3f} - 0.1"
        )
        assert rep_m.mean() < joi_m.mean(), f"k={k} MCD"
