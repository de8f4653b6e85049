"""Whole-loop Pallas WaveRNN generation kernel (vocoders/pallas_gen.py):
parity against the XLA lax.scan path it replaces on TPU.  Runs in Pallas
interpret mode on CPU — same kernel code, interpreter semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from msa_tts_tpu.vocoders.pallas_gen import (
    make_pallas_generate,
    split_generation_params,
)
from msa_tts_tpu.vocoders.wavernn import (
    WaveRNN,
    WaveRNNConfig,
    _generation_noise,
    _make_generate_scan,
    _mm,
    init_wavernn,
)

CFG = dict(rnn_dims=64, fc_dims=64, res_out_dims=32, n_mels=20,
           res_blocks=2, hop_length=16, pad=2, upsample_factors=(2, 2, 4))


def _inputs(cfg, B, T, seed=1):
    rng = jax.random.PRNGKey(seed)
    mels_up = jax.random.normal(
        jax.random.fold_in(rng, 1), (B, T, cfg.n_mels)
    )
    aux = jax.random.normal(
        jax.random.fold_in(rng, 2), (B, T, cfg.res_out_dims)
    )
    n1, n2 = _generation_noise(cfg, jax.random.fold_in(rng, 3), T, B)
    return mels_up, aux, n1, n2


def _pallas_run(cfg, params, mels_up, aux, n1, n2, chunk):
    """Replicate run_with_noise's hoisted projection, then the kernel."""
    d = cfg.aux_dims
    W_I = params["I"]["weight"]
    if cfg.use_aux_net:
        static_in = jnp.concatenate([mels_up, aux[:, :, :d]], axis=2)
        a_rest = aux[:, :, d:]
    else:
        static_in = mels_up
        a_rest = jnp.zeros(mels_up.shape[:2] + (0,))
    i_static = _mm(static_in, W_I[:, 1:]) + params["I"]["bias"]
    B, T, _ = mels_up.shape
    run = make_pallas_generate(cfg, B, T, chunk=chunk, interpret=True)
    return run(
        split_generation_params(params, cfg),
        jnp.swapaxes(i_static, 0, 1), jnp.swapaxes(a_rest, 0, 1), n1, n2,
    )


@pytest.mark.parametrize("mode", ["MOL", "GAUSS"])
def test_kernel_matches_xla_scan(mode):
    cfg = WaveRNNConfig(mode=mode, **CFG)
    params, _ = init_wavernn(jax.random.PRNGKey(0), cfg)
    B, T = 8, 64
    mels_up, aux, n1, n2 = _inputs(cfg, B, T)
    ref = np.asarray(
        _make_generate_scan(cfg, with_noise=True)(
            params, mels_up, aux, n1, n2
        )
    )
    out = np.asarray(_pallas_run(cfg, params, mels_up, aux, n1, n2, 16))
    assert out.shape == ref.shape == (B, T)
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.slow
def test_kernel_matches_without_aux_net():
    cfg = WaveRNNConfig(use_aux_net=False, **CFG)
    params, _ = init_wavernn(jax.random.PRNGKey(0), cfg)
    B, T = 8, 32
    mels_up, aux, n1, n2 = _inputs(cfg, B, T)
    ref = np.asarray(
        _make_generate_scan(cfg, with_noise=True)(
            params, mels_up, None, n1, n2
        )
    )
    out = np.asarray(_pallas_run(cfg, params, mels_up, aux, n1, n2, 16))
    np.testing.assert_allclose(out, ref, atol=1e-5)


@pytest.mark.slow
def test_generate_batch_backend_parity():
    """End-to-end WaveRNN.generate_batch: the pallas backend (run here
    in interpret mode) must produce the same waveforms as the xla
    backend, including the pad-T-to-chunk-multiple path."""
    from jax.experimental.pallas import tpu as pltpu

    mels = [
        np.random.RandomState(i).randn(20, 9 + i).astype(np.float32)
        for i in range(2)
    ]
    kw = dict(
        target=48, overlap=16, rng=jax.random.PRNGKey(5), verbose=False
    )
    voc_x = WaveRNN(cfg=WaveRNNConfig(**CFG), gen_backend="xla")
    ref = voc_x.generate_batch([m.copy() for m in mels], **kw)
    voc_p = WaveRNN(
        params=voc_x.params, state=voc_x.state,
        cfg=voc_x.cfg, gen_backend="pallas",
    )
    with pltpu.force_tpu_interpret_mode():
        out = voc_p.generate_batch([m.copy() for m in mels], **kw)
    assert voc_p.gen_backend == "pallas"
    for a, b in zip(out, ref):
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-5)


@pytest.mark.slow
def test_row_groups_match_single_group():
    """B beyond row_group runs as an extra grid dimension (independent
    AR chains, weights resident across groups) — results must be
    identical to one big group, including the row-padding path."""
    cfg = WaveRNNConfig(**CFG)
    params, _ = init_wavernn(jax.random.PRNGKey(0), cfg)
    B, T = 10, 32   # row_group=4 → 3 groups, 2 pad rows
    mels_up, aux, n1, n2 = _inputs(cfg, B, T)
    d = cfg.aux_dims
    W_I = params["I"]["weight"]
    static_in = jnp.concatenate([mels_up, aux[:, :, :d]], axis=2)
    i_static = jnp.swapaxes(
        _mm(static_in, W_I[:, 1:]) + params["I"]["bias"], 0, 1
    )
    a_rest = jnp.swapaxes(aux[:, :, d:], 0, 1)
    w = split_generation_params(params, cfg)
    one = make_pallas_generate(cfg, B, T, chunk=16, interpret=True)
    grp = make_pallas_generate(
        cfg, B, T, chunk=16, row_group=4, interpret=True
    )
    ref = np.asarray(one(w, i_static, a_rest, n1, n2))
    out = np.asarray(grp(w, i_static, a_rest, n1, n2))
    assert out.shape == ref.shape == (B, T)
    np.testing.assert_array_equal(out, ref)
