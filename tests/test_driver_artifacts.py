"""Bitrot protection for the driver-facing artifacts: __graft_entry__
and bench.py must keep compiling and running."""

import sys

import jax
import numpy as np
import pytest


def test_graft_entry_compiles():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_bench_run_jax_smoke(monkeypatch):
    """bench.run_jax must execute end to end (shrunk dims on CPU)."""
    import bench

    monkeypatch.setattr(bench, "K", 2)
    monkeypatch.setattr(bench, "S", 2)
    monkeypatch.setattr(bench, "T_IN", 12)
    monkeypatch.setattr(bench, "T_MEL", 16)
    monkeypatch.setattr(bench, "FRAMES_PER_STEP", 2 * 2 * 16 * 2)
    monkeypatch.setattr(bench, "SCAN_UNROLL", 2)
    dims = dict(bench.MODEL_DIMS)
    for k in (
        "symbols_embedding_dim", "encoder_embedding_dim",
        "attention_rnn_dim", "decoder_rnn_dim", "prenet_dim",
        "postnet_embedding_dim",
    ):
        dims[k] = 32
    dims["encoder_n_convolutions"] = 2
    dims["postnet_n_convolutions"] = 3
    monkeypatch.setattr(bench, "MODEL_DIMS", dims)
    attn = dict(bench.ATTN)
    attn["attention_dim"] = 32
    attn["attention_location_n_filters"] = 4
    attn["attention_location_kernel_size"] = 7
    monkeypatch.setattr(bench, "ATTN", attn)

    result = bench.run_jax(n_steps=1)
    assert np.isfinite(result["loss"])
    assert result["frames_per_sec"] > 0
