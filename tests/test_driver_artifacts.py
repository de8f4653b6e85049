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


@pytest.mark.slow
def test_graft_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)


@pytest.mark.slow
def test_graft_dryrun_multichip_driver_env():
    """Run dryrun_multichip exactly as the driver does: a FRESH interpreter
    with no conftest platform pinning, so the sitecustomize default backend
    (axon TPU in the dev image) is what __graft_entry__ itself must defeat.

    Round 1 shipped a dryrun that passed in-process (conftest had already
    pinned CPU) but failed in the driver env because jax.devices() ran
    before the platform switch (MULTICHIP_r01.json rc=1). This subprocess
    variant is the regression guard for that exact failure mode."""
    import os
    import subprocess

    env = dict(os.environ)
    # Undo everything the conftest/test env pre-arranged so the child
    # starts the way the driver starts.
    env.pop("JAX_PLATFORMS", None)
    env.pop("MSA_PLATFORM", None)
    flags = env.get("XLA_FLAGS", "")
    flags = " ".join(
        f for f in flags.split()
        if "xla_force_host_platform_device_count" not in f
    )
    if flags:
        env["XLA_FLAGS"] = flags
    else:
        env.pop("XLA_FLAGS", None)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8)"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, (
        f"driver-env dryrun failed\nstdout:\n{proc.stdout}\n"
        f"stderr:\n{proc.stderr[-2000:]}"
    )
    assert "dryrun_multichip joint OK" in proc.stdout


@pytest.mark.slow
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
