"""Multi-device sharding tests on the virtual 8-device CPU mesh."""

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
