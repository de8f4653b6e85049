"""Test configuration: force JAX onto a virtual 8-device CPU platform so
sharding/collective tests run hermetically and fast without TPU hardware.

Note: in the dev image ``jax`` is pre-imported at interpreter startup (a
sitecustomize registers the TPU plugin), so setting ``JAX_PLATFORMS`` via
the environment is not enough — we must override through ``jax.config``
before the first backend initialization."""

import os

platform = os.environ.get("MSA_TESTS_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = platform
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if platform == "cpu" and "xla_backend_optimization_level" not in flags:
    # The smoke tier is compile-bound on XLA:CPU's LLVM backend (the
    # models are tiny, the scan/while graphs are not).  Tests verify
    # numerics, not CPU speed — dropping the LLVM optimization level
    # roughly halves per-test wall time (measured: 31 s → 12 s for the
    # forward+grad jit) without changing float semantics (no fast-math
    # involved).  MSA_TESTS_PLATFORM != cpu leaves flags alone.
    flags += (" --xla_backend_optimization_level=0"
              " --xla_llvm_disable_expensive_passes=true")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", platform)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture
def np_rng():
    return np.random.default_rng(0)


# --------------------------------------------------------- duration budget
# CI-fashion per-test duration assertion for the smoke tier: with
# MSA_TEST_BUDGET_S set (e.g. 30), any non-slow test whose
# setup+call+teardown exceeds the budget FAILS the session at the end,
# so smoke-tier regressions surface as red instead of silent bloat.
_durations: dict = {}


def pytest_runtest_logreport(report):
    if "slow" in getattr(report, "keywords", {}):
        return  # budget governs the smoke tier only
    if report.when in ("setup", "call", "teardown"):
        _durations[report.nodeid] = (
            _durations.get(report.nodeid, 0.0) + report.duration
        )


def pytest_sessionfinish(session, exitstatus):
    budget = os.environ.get("MSA_TEST_BUDGET_S")
    if not budget:
        return
    budget_s = float(budget)
    over = {
        nid: d for nid, d in _durations.items() if d > budget_s
    }
    if over:
        tr = session.config.pluginmanager.get_plugin("terminalreporter")
        for nid, d in sorted(over.items(), key=lambda kv: -kv[1]):
            tr.write_line(
                f"[budget] {nid} took {d:.1f}s > {budget_s:.0f}s",
                red=True,
            )
        session.exitstatus = 1
