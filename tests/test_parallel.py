"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from msa_tts_tpu.meta.maml import make_maml_step
from msa_tts_tpu.optim import TrainState
from msa_tts_tpu.parallel import (
    make_mesh,
    replicate_state,
    shard_batch,
    shard_task_batch,
)


def quad_loss(params, model_state, batch, rng):
    del rng
    return 0.5 * jnp.sum(
        (params["w"][None, :] - batch["target"]) ** 2
    ) / batch["target"].shape[0], model_state


@pytest.fixture(scope="module")
def mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    return make_mesh(dp=2, task=4)


def test_mesh_shape(mesh):
    assert mesh.axis_names == ("dp", "task")
    assert mesh.devices.shape == (2, 4)


def test_sharded_maml_matches_single_device(mesh):
    """The task-sharded MAML step must produce identical parameters to
    the unsharded run (GSPMD inserts the mean-psum; math unchanged)."""
    step = make_maml_step(
        quad_loss, optax.sgd(0.1), optax.sgd(1.0), n_inner=2,
        second_order=True, remat=False,
    )
    K = 8
    w0 = jnp.asarray([3.0, -1.0])
    targets = jnp.asarray(
        np.random.default_rng(0).standard_normal((K, 4, 2)),
        dtype=jnp.float32,
    )
    support = {"target": targets}
    query = {"target": targets + 0.5}

    def run(sharded: bool):
        state = TrainState(
            params={"w": w0}, model_state={},
            opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
        )
        sup, qry = support, query
        if sharded:
            with mesh:
                state = replicate_state(state, mesh)
                sup = shard_task_batch(sup, mesh)
                qry = shard_task_batch(qry, mesh)
                out, metrics = jax.jit(step)(
                    state, sup, qry, jax.random.PRNGKey(0)
                )
        else:
            out, metrics = jax.jit(step)(
                state, sup, qry, jax.random.PRNGKey(0)
            )
        return np.asarray(out.params["w"]), float(metrics.loss)

    w_single, loss_single = run(False)
    w_sharded, loss_sharded = run(True)
    np.testing.assert_allclose(w_sharded, w_single, rtol=1e-6)
    assert loss_sharded == pytest.approx(loss_single, rel=1e-6)


def test_tacotron_forward_sharded_batch(mesh):
    """Full-model forward with the batch sharded over all 8 devices."""
    from msa_tts_tpu.models import tacotron2nv_forward
    import __graft_entry__ as g

    cfg, params, state = g._tiny_model()
    B = 8
    inputs, in_len, mels, mel_len, spk, _ = g._batch(cfg, B=B)

    def fwd(p, s, i, il, m, ml, sv):
        outs, _ = tacotron2nv_forward(
            p, s, cfg, i, il, m, ml, sv, jax.random.PRNGKey(0),
            train=False,
        )
        return outs[1]

    ref = np.asarray(
        jax.jit(fwd)(params, state, inputs, in_len, mels, mel_len, spk)
    )
    with mesh:
        batch = shard_batch(
            {
                "inputs": inputs, "input_lengths": in_len,
                "melspecs": mels, "melspec_lengths": mel_len,
                "speaker_vecs": spk,
            },
            mesh,
        )
        p_r = replicate_state(params, mesh)
        s_r = replicate_state(state, mesh)
        out = jax.jit(fwd)(
            p_r, s_r, batch["inputs"], batch["input_lengths"],
            batch["melspecs"], batch["melspec_lengths"],
            batch["speaker_vecs"],
        )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


# ---------------------------------------------------------------------------
# 2-D (task × dp) sharding via shard_map (parallel/shard_meta.py)
# ---------------------------------------------------------------------------

from msa_tts_tpu.parallel.shard_meta import (  # noqa: E402
    make_sharded_maml_step,
    shard_task_batch_2d,
)


def _episode_quad(K, S, seed=0):
    targets = jnp.asarray(
        np.random.default_rng(seed).standard_normal((K, S, 2)),
        dtype=jnp.float32,
    )
    return {"target": targets}


@pytest.mark.parametrize("dp,task", [(2, 4), (4, 2), (1, 8), (8, 1)])
@pytest.mark.parametrize("second_order", [True, False])
def test_sharded_maml_2d_matches_single_device(dp, task, second_order):
    """The shard_map 2-D (task, dp) MAML step must match the unsharded
    step numerically — including the shapes where GSPMD's conv
    partitioner crashes (task-local shard > 1 with shots sharded)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh2 = make_mesh(dp=dp, task=task)
    K, S = 8, 8  # K_loc = 8/task (can be > 1), S_loc = 8/dp

    ref_step = make_maml_step(
        quad_loss, optax.sgd(0.1), optax.sgd(1.0), n_inner=2,
        second_order=second_order, remat=False,
    )
    sh_step = make_sharded_maml_step(
        quad_loss, optax.sgd(0.1), optax.sgd(1.0), 2, mesh2,
        second_order=second_order, remat=False,
    )

    w0 = jnp.asarray([3.0, -1.0])
    support = _episode_quad(K, S, seed=0)
    query = {"target": _episode_quad(K, S, seed=1)["target"] + 0.5}

    def mkstate():
        return TrainState(
            params={"w": w0}, model_state={},
            opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
        )

    ref_out, ref_m = jax.jit(ref_step)(
        mkstate(), support, query, jax.random.PRNGKey(0)
    )
    with mesh2:
        sup = shard_task_batch_2d(support, mesh2)
        qry = shard_task_batch_2d(query, mesh2)
        st = replicate_state(mkstate(), mesh2)
        sh_out, sh_m = jax.jit(sh_step)(
            st, sup, qry, jax.random.PRNGKey(0)
        )
    np.testing.assert_allclose(
        np.asarray(sh_out.params["w"]), np.asarray(ref_out.params["w"]),
        rtol=1e-5,
    )
    assert float(sh_m.loss) == pytest.approx(float(ref_m.loss), rel=1e-5)
    np.testing.assert_allclose(
        np.asarray(sh_m.task_losses), np.asarray(ref_m.task_losses),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sh_m.inner_losses), np.asarray(ref_m.inner_losses),
        rtol=1e-5,
    )


@pytest.mark.slow
def test_sharded_maml_2d_full_model_crash_shape(mesh):
    """Full Tacotron2 meta step at the exact shape that crashes the
    GSPMD conv partitioner (dp=2, task=4, K=8, S=2 → task-local shard
    2 with shots sharded).  shard_map must compile and produce finite
    loss."""
    import __graft_entry__ as g
    from msa_tts_tpu.models import tacotron2nv_forward
    from msa_tts_tpu.models.loss import tacotron2_loss

    cfg, params, state = g._tiny_model()

    def loss_fn(p, ms, batch, rng):
        outs, new_ms = tacotron2nv_forward(
            p, ms, cfg, batch["inputs"], batch["input_lengths"],
            batch["melspecs"], batch["melspec_lengths"],
            batch["speaker_vecs"], rng, train=True,
        )
        loss = tacotron2_loss(
            tuple(outs), (batch["melspecs"], batch["stop_labels"]),
            batch["melspec_lengths"], reduction="none", pos_weight=1.0,
        )
        return loss, new_ms

    step = make_sharded_maml_step(
        loss_fn, optax.sgd(1e-2), optax.adam(1e-3), 1, mesh,
        second_order=True, clip_thresh=1.0,
    )
    K, S, T_in, T_mel = 8, 2, 12, 16
    inputs, in_len, mels, mel_len, spk, stop = g._batch(
        cfg, B=K * S, T_in=T_in, T_mel=T_mel, seed=0
    )
    episode = {
        "inputs": inputs.reshape(K, S, T_in),
        "input_lengths": in_len.reshape(K, S),
        "melspecs": mels.reshape(K, S, cfg.n_mel_channels, T_mel),
        "melspec_lengths": mel_len.reshape(K, S),
        "speaker_vecs": spk.reshape(K, S, -1),
        "stop_labels": stop.reshape(K, S, T_mel),
    }
    tstate = TrainState(
        params=params, model_state=state,
        opt_state=optax.adam(1e-3).init(params), step=0,
    )
    with mesh:
        tstate = replicate_state(tstate, mesh)
        sup = shard_task_batch_2d(episode, mesh)
        qry = shard_task_batch_2d(episode, mesh)
        new_state, metrics = jax.jit(step)(
            tstate, sup, qry, jax.random.PRNGKey(0)
        )
        jax.block_until_ready(new_state.params)
    assert np.isfinite(float(metrics.loss))
    assert metrics.task_losses.shape == (K,)


@pytest.mark.slow
def test_2d_gspmd_crash_documented():
    """Documents WHY shard_meta.py exists: a plain jitted (GSPMD) meta
    step with episodes device_put at P("task", "dp") and >1 task per
    task-shard fatally aborts XLA's convolution SPMD partitioner
    (convolution_handler.cc Check failure).  Runs in a subprocess since
    the failure is a C++ abort, not an exception.

    If this test starts FAILING (the child exits 0), the XLA bug is
    fixed — consider re-enabling the pure-GSPMD 2-D layout in
    parallel/sharding.py and retiring the shard_map detour."""
    import os
    import subprocess
    import textwrap

    child = textwrap.dedent("""
        import os
        os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
            " --xla_force_host_platform_device_count=8"
        import jax; jax.config.update("jax_platforms", "cpu")
        import optax
        from jax.sharding import NamedSharding, PartitionSpec as P
        import __graft_entry__ as ge
        from msa_tts_tpu.meta.maml import make_maml_step
        from msa_tts_tpu.models import tacotron2nv_forward
        from msa_tts_tpu.models.loss import tacotron2_loss
        from msa_tts_tpu.optim import TrainState
        from msa_tts_tpu.parallel import make_mesh, replicate_state

        cfg, params, state = ge._tiny_model()

        def loss_fn(p, ms, batch, rng):
            outs, new_ms = tacotron2nv_forward(
                p, ms, cfg, batch["inputs"], batch["input_lengths"],
                batch["melspecs"], batch["melspec_lengths"],
                batch["speaker_vecs"], rng, train=True)
            loss = tacotron2_loss(
                tuple(outs), (batch["melspecs"], batch["stop_labels"]),
                batch["melspec_lengths"], reduction="none", pos_weight=1.0)
            return loss, new_ms

        step = make_maml_step(
            loss_fn, optax.sgd(1e-2), optax.adam(1e-3), n_inner=1,
            second_order=True, clip_thresh=1.0)
        K, S, T_in, T_mel = 8, 2, 12, 16
        mesh = make_mesh(dp=2, task=4)
        sh = NamedSharding(mesh, P("task", "dp"))

        def episode(seed):
            i, il, m, ml, sv, st = ge._batch(
                cfg, B=K * S, T_in=T_in, T_mel=T_mel, seed=seed)
            return {
                "inputs": i.reshape(K, S, T_in),
                "input_lengths": il.reshape(K, S),
                "melspecs": m.reshape(K, S, cfg.n_mel_channels, T_mel),
                "melspec_lengths": ml.reshape(K, S),
                "speaker_vecs": sv.reshape(K, S, -1),
                "stop_labels": st.reshape(K, S, T_mel),
            }

        ts = TrainState(params=params, model_state=state,
                        opt_state=optax.adam(1e-3).init(params), step=0)
        with mesh:
            ts = replicate_state(ts, mesh)
            sup = {k: jax.device_put(v, sh) for k, v in episode(1).items()}
            qry = {k: jax.device_put(v, sh) for k, v in episode(2).items()}
            ns, _ = jax.jit(step)(ts, sup, qry, jax.random.PRNGKey(0))
            jax.block_until_ready(ns.params)
        print("GSPMD 2-D OK")
    """)
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    flags = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["XLA_FLAGS"] = flags
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c", child], cwd=repo, env=env,
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode != 0, (
        "XLA's conv partitioner now accepts the 2-D GSPMD layout "
        "(child printed: %s) — the shard_map workaround in "
        "parallel/shard_meta.py may be retirable." % proc.stdout
    )
    assert "convolution_handler" in proc.stderr or "Check failed" in (
        proc.stderr
    ), f"child died for an unexpected reason:\n{proc.stderr[-2000:]}"


# ---------------------------------------------------------------------------
# Broader trainer-family coverage on the mesh
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dp,task", [(2, 4), (4, 2)])
def test_sharded_reptile_2d_matches_single_device(dp, task):
    """Batched-mode Reptile: 2-D shard_map step vs the unsharded step."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from msa_tts_tpu.meta.reptile import make_reptile_step
    from msa_tts_tpu.parallel.shard_meta import make_sharded_reptile_step

    mesh2 = make_mesh(dp=dp, task=task)
    K, S = 8, 8
    ref_step = make_reptile_step(
        quad_loss, optax.sgd(0.1), optax.sgd(0.5), n_inner=2,
        mode="batched", remat=False,
    )
    sh_step = make_sharded_reptile_step(
        quad_loss, optax.sgd(0.1), optax.sgd(0.5), 2, mesh2, remat=False,
    )
    w0 = jnp.asarray([2.0, -3.0])
    support = _episode_quad(K, S, seed=4)
    query = {"target": _episode_quad(K, S, seed=5)["target"] + 0.3}

    def mkstate():
        return TrainState(
            params={"w": w0}, model_state={},
            opt_state=optax.sgd(0.5).init({"w": w0}), step=0,
        )

    ref_out, ref_m = jax.jit(ref_step)(
        mkstate(), support, query, jax.random.PRNGKey(0)
    )
    with mesh2:
        sup = shard_task_batch_2d(support, mesh2)
        qry = shard_task_batch_2d(query, mesh2)
        st = replicate_state(mkstate(), mesh2)
        sh_out, sh_m = jax.jit(sh_step)(
            st, sup, qry, jax.random.PRNGKey(0)
        )
    np.testing.assert_allclose(
        np.asarray(sh_out.params["w"]), np.asarray(ref_out.params["w"]),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(sh_m.task_losses), np.asarray(ref_m.task_losses),
        rtol=1e-5,
    )


def _tacotron_loss_fn(cfg):
    from msa_tts_tpu.models import tacotron2nv_forward
    from msa_tts_tpu.models.loss import tacotron2_loss

    def loss_fn(p, ms, batch, rng):
        outs, new_ms = tacotron2nv_forward(
            p, ms, cfg, batch["inputs"], batch["input_lengths"],
            batch["melspecs"], batch["melspec_lengths"],
            batch["speaker_vecs"], rng, train=True,
        )
        loss = tacotron2_loss(
            tuple(outs), (batch["melspecs"], batch["stop_labels"]),
            batch["melspec_lengths"], reduction="none", pos_weight=1.0,
        )
        return loss, new_ms

    return loss_fn


def _joint_batch(cfg, B, seed=0):
    import __graft_entry__ as g

    inputs, in_len, mels, mel_len, spk, stop = g._batch(
        cfg, B=B, T_in=12, T_mel=16, seed=seed
    )
    return {
        "inputs": inputs, "input_lengths": in_len, "melspecs": mels,
        "melspec_lengths": mel_len, "speaker_vecs": spk,
        "stop_labels": stop,
    }


def test_joint_full_train_step_sharded_matches_single(mesh):
    """Full joint training step (loss + grads + adam update), batch
    data-parallel over all 8 devices, vs unsharded — same jitted
    program, so identical rng/dropout; only reduction order may differ."""
    import __graft_entry__ as g

    cfg, params, state = g._tiny_model()
    loss_fn = _tacotron_loss_fn(cfg)
    # sgd, not adam: at step 1 adam's update is ~lr*sign(g), so a
    # reduction-order difference of 1e-8 on a near-zero gradient flips
    # the whole update — that's optimizer noise, not sharding error
    tx = optax.sgd(1e-2)

    def step(tstate, batch, rng):
        def lf(p):
            return loss_fn(p, tstate.model_state, batch, rng)[0]

        loss, grads = jax.value_and_grad(lf)(tstate.params)
        updates, new_opt = tx.update(grads, tstate.opt_state, tstate.params)
        new_params = optax.apply_updates(tstate.params, updates)
        return tstate._replace(params=new_params, opt_state=new_opt), loss

    batch = _joint_batch(cfg, B=8, seed=7)
    mkstate = lambda: TrainState(
        params=params, model_state=state,
        opt_state=tx.init(params), step=0,
    )
    ref_out, ref_loss = jax.jit(step)(
        mkstate(), batch, jax.random.PRNGKey(0)
    )
    with mesh:
        st = replicate_state(mkstate(), mesh)
        sharded = shard_batch(batch, mesh)
        sh_out, sh_loss = jax.jit(step)(
            st, sharded, jax.random.PRNGKey(0)
        )
    assert float(sh_loss) == pytest.approx(float(ref_loss), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_out.params),
        jax.tree_util.tree_leaves(sh_out.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="sharded joint step diverged",
        )


def test_ewc_grad_sq_sharded_matches_single(mesh):
    """EWC's Fisher accumulator (per-batch squared grads) with the
    buffer batch sharded over the mesh vs unsharded."""
    import __graft_entry__ as g

    cfg, params, state = g._tiny_model()
    loss_fn = _tacotron_loss_fn(cfg)

    def grad_sq(p, ms, batch, rng):
        def lf(pp):
            return loss_fn(pp, ms, batch, rng)[0]

        grads = jax.grad(lf)(p)
        return jax.tree_util.tree_map(lambda x: x * x, grads)

    batch = _joint_batch(cfg, B=8, seed=9)
    ref = jax.jit(grad_sq)(params, state, batch, jax.random.PRNGKey(3))
    with mesh:
        p_r = replicate_state(params, mesh)
        s_r = replicate_state(state, mesh)
        sharded = shard_batch(batch, mesh)
        out = jax.jit(grad_sq)(p_r, s_r, sharded, jax.random.PRNGKey(3))
    for a, b in zip(
        jax.tree_util.tree_leaves(ref), jax.tree_util.tree_leaves(out)
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_infer_sharded_batch_matches_single(mesh):
    """Autoregressive synthesis with the batch sharded over all devices
    must reproduce the single-device output exactly (deterministic at
    train=False apart from the always-on prenet dropout, which depends
    only on rng + global shapes — both unchanged under GSPMD)."""
    from msa_tts_tpu.models import tacotron2nv_infer
    import __graft_entry__ as g

    cfg, params, state = g._tiny_model()
    B = 8
    inputs, in_len, _, _, spk, _ = g._batch(cfg, B=B, seed=11)

    def run(p, s, i, il, sv):
        mel, lens, align = tacotron2nv_infer(
            p, s, cfg, i, il, sv, jax.random.PRNGKey(5)
        )
        return mel, lens

    mel_ref, len_ref = jax.jit(run)(params, state, inputs, in_len, spk)
    with mesh:
        sh = shard_batch(
            {"inputs": inputs, "input_lengths": in_len,
             "speaker_vecs": spk}, mesh,
        )
        p_r = replicate_state(params, mesh)
        s_r = replicate_state(state, mesh)
        mel_s, len_s = jax.jit(run)(
            p_r, s_r, sh["inputs"], sh["input_lengths"],
            sh["speaker_vecs"],
        )
    np.testing.assert_array_equal(np.asarray(len_s), np.asarray(len_ref))
    np.testing.assert_allclose(
        np.asarray(mel_s), np.asarray(mel_ref), atol=2e-5
    )


def test_checkpoint_elastic_mesh_reshape(tmp_path):
    """Elastic recovery: a checkpoint written mid-run on a (2,4) mesh
    restores onto (4,2), (8,1), and a single device, and the continued
    run reproduces the original parameters exactly.  Checkpoints are
    host-side numpy msgpack with replicated params, so restore is
    mesh-shape-agnostic — this pins that property."""
    from msa_tts_tpu.utils.checkpoint import (
        load_checkpoint,
        restore_like,
        save_checkpoint,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    step = make_maml_step(
        quad_loss, optax.sgd(0.1), optax.sgd(1.0), n_inner=1,
        second_order=True, remat=False,
    )
    K = 8
    w0 = jnp.asarray([2.0, -3.0])

    def ep(seed):
        return {
            "target": jnp.asarray(
                np.random.default_rng(seed).standard_normal((K, 4, 2)),
                dtype=jnp.float32,
            )
        }

    def fresh_state():
        return TrainState(
            params={"w": w0}, model_state={},
            opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
        )

    path = str(tmp_path / "elastic.ckpt")
    mesh_a = make_mesh(dp=2, task=4)
    with mesh_a:
        st = replicate_state(fresh_state(), mesh_a)
        st, _ = jax.jit(step)(
            st, shard_task_batch(ep(1), mesh_a),
            shard_task_batch(ep(2), mesh_a), jax.random.PRNGKey(0),
        )
        save_checkpoint(
            path,
            {"params": st.params, "opt_state": st.opt_state,
             "step": st.step},
        )
        st, _ = jax.jit(step)(
            st, shard_task_batch(ep(3), mesh_a),
            shard_task_batch(ep(4), mesh_a), jax.random.PRNGKey(1),
        )
        w_ref = np.asarray(st.params["w"])

    def restored_state():
        raw = load_checkpoint(path)
        base = fresh_state()
        return TrainState(
            params=restore_like(base.params, raw["params"]),
            model_state={},
            opt_state=restore_like(base.opt_state, raw["opt_state"]),
            step=int(raw["step"]),
        )

    # reshape to other mesh geometries
    for dp, task in [(4, 2), (8, 1)]:
        mesh_b = make_mesh(dp=dp, task=task)
        with mesh_b:
            st2 = replicate_state(restored_state(), mesh_b)
            st2, _ = jax.jit(step)(
                st2, shard_task_batch(ep(3), mesh_b),
                shard_task_batch(ep(4), mesh_b), jax.random.PRNGKey(1),
            )
        np.testing.assert_allclose(
            np.asarray(st2.params["w"]), w_ref, rtol=1e-6,
            err_msg=f"elastic restore diverged on mesh ({dp},{task})",
        )

    # shrink to a single device (no mesh at all)
    st1, _ = jax.jit(step)(
        restored_state(), ep(3), ep(4), jax.random.PRNGKey(1)
    )
    np.testing.assert_allclose(
        np.asarray(st1.params["w"]), w_ref, rtol=1e-6,
        err_msg="elastic restore diverged on single device",
    )


# ---------------------------------------------------------------------------
# Sharded steps must CARRY the post-adapt model state (BN running stats)
# like the unsharded steps do — not silently keep it frozen at init
# ---------------------------------------------------------------------------

def stateful_quad_loss(params, model_state, batch, rng):
    """quad_loss plus a linear running statistic in the model state (a
    stand-in for BN running means, whose update is linear in the batch
    statistic — so the dp-sharded pmean merge is exact, not approximate)."""
    del rng
    loss = 0.5 * jnp.sum(
        (params["w"][None, :] - batch["target"]) ** 2
    ) / batch["target"].shape[0]
    new_state = {
        "running": 0.9 * model_state["running"]
        + 0.1 * jnp.mean(batch["target"], axis=0)
    }
    return loss, new_state


@pytest.mark.parametrize("dp,task", [(2, 4), (4, 2)])
@pytest.mark.parametrize("kind", ["maml", "reptile"])
def test_sharded_steps_carry_model_state(dp, task, kind):
    """After one sharded MAML/Reptile step the carried model state must
    (a) differ from init and (b) match the unsharded step's merged
    state — the sharded steps previously discarded every task's
    post-adapt state, freezing BN stats for the whole run."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from msa_tts_tpu.meta.reptile import make_reptile_step
    from msa_tts_tpu.parallel.shard_meta import make_sharded_reptile_step

    mesh2 = make_mesh(dp=dp, task=task)
    K, S = 8, 8
    if kind == "maml":
        ref_step = make_maml_step(
            stateful_quad_loss, optax.sgd(0.1), optax.sgd(1.0),
            n_inner=2, second_order=True, remat=False,
        )
        sh_step = make_sharded_maml_step(
            stateful_quad_loss, optax.sgd(0.1), optax.sgd(1.0), 2, mesh2,
            second_order=True, remat=False,
        )
    else:
        ref_step = make_reptile_step(
            stateful_quad_loss, optax.sgd(0.1), optax.sgd(1.0),
            n_inner=2, mode="batched", remat=False,
        )
        sh_step = make_sharded_reptile_step(
            stateful_quad_loss, optax.sgd(0.1), optax.sgd(1.0), 2, mesh2,
            remat=False,
        )

    w0 = jnp.asarray([3.0, -1.0])
    ms0 = {"running": jnp.zeros(2)}
    support = _episode_quad(K, S, seed=0)
    query = {"target": _episode_quad(K, S, seed=1)["target"] + 0.5}

    def mkstate():
        return TrainState(
            params={"w": w0}, model_state=jax.tree_util.tree_map(
                jnp.copy, ms0
            ),
            opt_state=optax.sgd(1.0).init({"w": w0}), step=0,
        )

    ref_out, _ = jax.jit(ref_step)(
        mkstate(), support, query, jax.random.PRNGKey(0)
    )
    with mesh2:
        sup = shard_task_batch_2d(support, mesh2)
        qry = shard_task_batch_2d(query, mesh2)
        st = replicate_state(mkstate(), mesh2)
        sh_out, _ = jax.jit(sh_step)(st, sup, qry, jax.random.PRNGKey(0))

    ref_run = np.asarray(ref_out.model_state["running"])
    sh_run = np.asarray(sh_out.model_state["running"])
    assert not np.allclose(ref_run, np.zeros(2))   # unsharded moved
    assert not np.allclose(sh_run, np.zeros(2))    # sharded moved too
    np.testing.assert_allclose(sh_run, ref_run, rtol=1e-5, atol=1e-7)


def test_tp_sharded_joint_step_matches_single():
    """Tensor parallel (parallel/tp.py): the SAME jitted joint step with
    weights Megatron-sharded over a (dp=2, task=1, tp=4) mesh — LSTM
    gate blocks and projections split on their output axis, batch
    data-parallel over dp — must reproduce the single-device update
    (GSPMD partitions the matmuls and inserts the tp all_gathers; only
    reduction order may differ)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g
    from msa_tts_tpu.parallel import shard_tree_tp, tp_leaf_spec

    tpm = make_mesh(dp=2, task=1, tp=4)
    assert tpm.axis_names == ("dp", "task", "tp")

    cfg, params, state = g._tiny_model()
    loss_fn = _tacotron_loss_fn(cfg)
    tx = optax.sgd(1e-2)

    def step(tstate, batch, rng):
        def lf(p):
            return loss_fn(p, tstate.model_state, batch, rng)[0]

        loss, grads = jax.value_and_grad(lf)(tstate.params)
        updates, new_opt = tx.update(grads, tstate.opt_state, tstate.params)
        new_params = optax.apply_updates(tstate.params, updates)
        return tstate._replace(params=new_params, opt_state=new_opt), loss

    batch = _joint_batch(cfg, B=8, seed=11)
    mkstate = lambda: TrainState(
        params=params, model_state=state,
        opt_state=tx.init(params), step=0,
    )
    ref_out, ref_loss = jax.jit(step)(
        mkstate(), batch, jax.random.PRNGKey(0)
    )
    # the 32-dim toy model still has tp-divisible leaves at min_dim=32;
    # assert at least one leaf actually shards so the test can't pass
    # vacuously on an all-replicated layout
    specs = [
        tp_leaf_spec(tuple(x.shape), 4, min_dim=32)
        for x in jax.tree_util.tree_leaves(params)
    ]
    assert any("tp" in (s or ()) for spec in specs for s in [spec]), specs
    with tpm:
        st = shard_tree_tp(mkstate(), tpm, min_dim=32)
        sharded = shard_batch(batch, tpm)   # P(("dp","task")): tp-replicated
        sh_out, sh_loss = jax.jit(step)(
            st, sharded, jax.random.PRNGKey(0)
        )
    assert float(sh_loss) == pytest.approx(float(ref_loss), rel=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(ref_out.params),
        jax.tree_util.tree_leaves(sh_out.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5,
            err_msg="tp-sharded joint step diverged",
        )


def test_tp_leaf_spec_prefers_largest_divisible_axis():
    from jax.sharding import PartitionSpec as P

    from msa_tts_tpu.parallel import tp_leaf_spec

    # LSTM gate kernel (4H, in): output/gate axis sharded
    assert tp_leaf_spec((128, 48), 4) == P("tp", None)
    # projection (out, in) with both divisible: larger axis wins
    assert tp_leaf_spec((256, 512), 4) == P(None, "tp")
    # small bias: replicated
    assert tp_leaf_spec((48,), 4) == P()
    # non-divisible axis skipped in favor of a divisible one
    assert tp_leaf_spec((129, 256), 4) == P(None, "tp")
    # scalar
    assert tp_leaf_spec((), 4) == P()


def test_tp_shardings_degrade_without_tp_axis():
    """ADVICE r4: a mesh without a tp axis (make_mesh(tp=1) is 2-axis)
    must yield replicated specs, not KeyError — dryrun_multichip(1)
    applies the tp layout unconditionally."""
    from msa_tts_tpu.parallel.tp import shard_tree_tp, tp_shardings

    mesh = make_mesh(dp=1, task=1)
    tree = {"w": jnp.ones((256, 256)), "b": jnp.ones((256,))}
    shardings = tp_shardings(tree, mesh)
    for sh in jax.tree_util.tree_leaves(
        shardings, is_leaf=lambda x: hasattr(x, "spec")
    ):
        assert sh.spec == jax.sharding.PartitionSpec()
    out = shard_tree_tp(tree, mesh)
    np.testing.assert_array_equal(np.asarray(out["w"]), np.asarray(tree["w"]))


def test_dpshard_rejects_tp():
    """ADVICE r4: a vocoder trainer configured with parallel: {tp: M}
    must fail loudly instead of silently building a dp-only mesh."""
    from msa_tts_tpu.parallel.sharding import DpShard

    with pytest.raises(NotImplementedError, match="tp"):
        DpShard.from_params({"parallel": {"dp": 2, "tp": 4}})
    # tp=1 is the "not requested" spelling and must still work
    assert DpShard.from_params({"parallel": {"dp": 2, "tp": 1}}) is not None


def test_put_batch_divisibility_uses_data_axes_not_mesh_size():
    """ADVICE r4: with dp=2,tp=4 a batch of 6 is divisible by the data
    axes (dp·task=2) and must be sharded — gating on mesh.size=8 would
    silently replicate it."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from msa_tts_tpu.parallel.sharding import batch_sharding, replicated

    class _T:
        _put_batch = __import__(
            "msa_tts_tpu.trainers.base", fromlist=["TrainerBase"]
        ).TrainerBase._put_batch
        _data_axes_size = __import__(
            "msa_tts_tpu.trainers.base", fromlist=["TrainerBase"]
        ).TrainerBase._data_axes_size

    t = _T()
    t.mesh = make_mesh(dp=2, task=1, tp=4)
    t._batch_sharding = batch_sharding(t.mesh)
    t._replicated = replicated(t.mesh)
    assert t._data_axes_size == 2
    out = t._put_batch({"x": np.zeros((6, 3), np.float32)})
    assert not out["x"].sharding.is_fully_replicated
    # a genuinely indivisible batch still falls back to replication
    out = t._put_batch({"x": np.zeros((5, 3), np.float32)})
    assert out["x"].sharding.is_fully_replicated
