"""Parity tests of NN primitive ops against PyTorch oracles."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msa_tts_tpu.ops import nn as N  # noqa: E402
from msa_tts_tpu.ops import rnn as R  # noqa: E402


def _to_jnp(t):
    return jnp.asarray(t.detach().numpy())


def test_linear_matches_torch(np_rng):
    lin = torch.nn.Linear(16, 8)
    params = {
        "weight": _to_jnp(lin.weight),
        "bias": _to_jnp(lin.bias),
    }
    x = np_rng.standard_normal((4, 16)).astype(np.float32)
    ours = np.asarray(N.linear(params, jnp.asarray(x)))
    theirs = lin(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv1d_matches_torch(np_rng):
    conv = torch.nn.Conv1d(4, 6, kernel_size=5, padding=2)
    params = {
        "weight": _to_jnp(conv.weight),
        "bias": _to_jnp(conv.bias),
    }
    x = np_rng.standard_normal((2, 4, 20)).astype(np.float32)
    ours = np.asarray(N.conv1d(params, jnp.asarray(x), padding=2))
    theirs = conv(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(ours, theirs, atol=1e-5)


def test_conv_transpose1d_matches_torch(np_rng):
    conv = torch.nn.ConvTranspose1d(4, 6, kernel_size=8, stride=4, padding=2)
    params = {
        "weight": _to_jnp(conv.weight),
        "bias": _to_jnp(conv.bias),
    }
    x = np_rng.standard_normal((2, 4, 16)).astype(np.float32)
    ours = np.asarray(
        N.conv_transpose1d(params, jnp.asarray(x), stride=4, padding=2)
    )
    theirs = conv(torch.from_numpy(x)).detach().numpy()
    assert ours.shape == theirs.shape
    np.testing.assert_allclose(ours, theirs, atol=1e-4)


def test_batchnorm_train_matches_torch(np_rng):
    bn = torch.nn.BatchNorm1d(6)
    bn.train()
    params = {"weight": _to_jnp(bn.weight), "bias": _to_jnp(bn.bias)}
    state = {
        "running_mean": jnp.zeros(6),
        "running_var": jnp.ones(6),
    }
    x = np_rng.standard_normal((3, 6, 10)).astype(np.float32)
    ours, new_state = N.batchnorm1d(params, state, jnp.asarray(x), train=True)
    theirs = bn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(new_state["running_mean"]),
        bn.running_mean.numpy(),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(new_state["running_var"]),
        bn.running_var.numpy(),
        atol=1e-4,
    )


def test_batchnorm_eval_matches_torch(np_rng):
    bn = torch.nn.BatchNorm1d(6)
    bn.eval()
    with torch.no_grad():
        bn.running_mean.copy_(torch.arange(6).float() * 0.1)
        bn.running_var.copy_(torch.arange(6).float() * 0.2 + 1.0)
    params = {"weight": _to_jnp(bn.weight), "bias": _to_jnp(bn.bias)}
    state = {
        "running_mean": _to_jnp(bn.running_mean),
        "running_var": _to_jnp(bn.running_var),
    }
    x = np_rng.standard_normal((3, 6, 10)).astype(np.float32)
    ours, _ = N.batchnorm1d(params, state, jnp.asarray(x), train=False)
    theirs = bn(torch.from_numpy(x)).detach().numpy()
    np.testing.assert_allclose(np.asarray(ours), theirs, atol=1e-5)


def test_lstm_cell_matches_torch(np_rng):
    cell = torch.nn.LSTMCell(10, 12)
    params = {
        "weight_ih": _to_jnp(cell.weight_ih),
        "weight_hh": _to_jnp(cell.weight_hh),
        "bias_ih": _to_jnp(cell.bias_ih),
        "bias_hh": _to_jnp(cell.bias_hh),
    }
    x = np_rng.standard_normal((4, 10)).astype(np.float32)
    h0 = np_rng.standard_normal((4, 12)).astype(np.float32)
    c0 = np_rng.standard_normal((4, 12)).astype(np.float32)
    h, c = R.lstm_cell(
        params, jnp.asarray(x), (jnp.asarray(h0), jnp.asarray(c0))
    )
    ht, ct = cell(
        torch.from_numpy(x), (torch.from_numpy(h0), torch.from_numpy(c0))
    )
    np.testing.assert_allclose(np.asarray(h), ht.detach().numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(c), ct.detach().numpy(), atol=1e-5)


def test_bilstm_matches_torch_packed(np_rng):
    """Masked BiLSTM must equal torch's packed-sequence BiLSTM on padded
    variable-length batches (incl. zeros at padding)."""
    lstm = torch.nn.LSTM(8, 5, 1, batch_first=True, bidirectional=True)
    params = {
        "forward": {
            "weight_ih": _to_jnp(lstm.weight_ih_l0),
            "weight_hh": _to_jnp(lstm.weight_hh_l0),
            "bias_ih": _to_jnp(lstm.bias_ih_l0),
            "bias_hh": _to_jnp(lstm.bias_hh_l0),
        },
        "backward": {
            "weight_ih": _to_jnp(lstm.weight_ih_l0_reverse),
            "weight_hh": _to_jnp(lstm.weight_hh_l0_reverse),
            "bias_ih": _to_jnp(lstm.bias_ih_l0_reverse),
            "bias_hh": _to_jnp(lstm.bias_hh_l0_reverse),
        },
    }
    B, T = 3, 9
    lengths = np.array([9, 6, 4])
    x = np_rng.standard_normal((B, T, 8)).astype(np.float32)
    # zero out padding in the input for determinism
    for b, L in enumerate(lengths):
        x[b, L:] = 0.0

    ours = np.asarray(R.bilstm(params, jnp.asarray(x), jnp.asarray(lengths)))

    packed = torch.nn.utils.rnn.pack_padded_sequence(
        torch.from_numpy(x), lengths, batch_first=True
    )
    out, _ = lstm(packed)
    theirs, _ = torch.nn.utils.rnn.pad_packed_sequence(
        out, batch_first=True, total_length=T
    )
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-5)


def test_gru_cell_matches_torch(np_rng):
    cell = torch.nn.GRUCell(7, 9)
    params = {
        "weight_ih": _to_jnp(cell.weight_ih),
        "weight_hh": _to_jnp(cell.weight_hh),
        "bias_ih": _to_jnp(cell.bias_ih),
        "bias_hh": _to_jnp(cell.bias_hh),
    }
    x = np_rng.standard_normal((4, 7)).astype(np.float32)
    h0 = np_rng.standard_normal((4, 9)).astype(np.float32)
    h = R.gru_cell(params, jnp.asarray(x), jnp.asarray(h0))
    ht = cell(torch.from_numpy(x), torch.from_numpy(h0))
    np.testing.assert_allclose(np.asarray(h), ht.detach().numpy(), atol=1e-5)


def test_gru_sequence_matches_torch(np_rng):
    g = torch.nn.GRU(7, 9, batch_first=True)
    params = {
        "weight_ih": _to_jnp(g.weight_ih_l0),
        "weight_hh": _to_jnp(g.weight_hh_l0),
        "bias_ih": _to_jnp(g.bias_ih_l0),
        "bias_hh": _to_jnp(g.bias_hh_l0),
    }
    x = np_rng.standard_normal((2, 11, 7)).astype(np.float32)
    ours = np.asarray(R.gru(params, jnp.asarray(x)))
    theirs, _ = g(torch.from_numpy(x))
    np.testing.assert_allclose(ours, theirs.detach().numpy(), atol=1e-5)


def test_dropout_statistics(rng):
    x = jnp.ones((1000,))
    y = N.dropout(rng, x, 0.5, deterministic=False)
    # inverted dropout preserves expectation
    assert abs(float(y.mean()) - 1.0) < 0.1
    assert float((y == 0).mean()) == pytest.approx(0.5, abs=0.06)
    z = N.dropout(rng, x, 0.5, deterministic=True)
    np.testing.assert_array_equal(np.asarray(z), np.asarray(x))


def test_xavier_gain_init_ranges(rng):
    p = N.init_linear(rng, 100, 100, w_init_gain="tanh")
    bound = (5.0 / 3.0) * np.sqrt(6.0 / 200.0)
    w = np.asarray(p["weight"])
    assert np.abs(w).max() <= bound + 1e-6
    assert np.abs(w).max() > bound * 0.9


def test_mcd_matches_reference_formula(np_rng):
    from msa_tts_tpu.ops import metrics as M

    B, T, D = 3, 12, 8
    out = np_rng.standard_normal((B, T, D)).astype(np.float32)
    mel = np_rng.standard_normal((B, T, D)).astype(np.float32)
    mel_len = np.array([12, 7, 5])

    # Direct transcription of the reference formula as oracle.
    K = 10 / np.log(10) * np.sqrt(2)
    diff = [mel[i, : mel_len[i]] - out[i, : mel_len[i]] for i in range(B)]
    mean_sep = [np.mean(np.sqrt(np.sum(d**2, axis=1))) for d in diff]
    expected = K * sum(mean_sep) / len(mean_sep)

    got = float(M.mcd_batch(out, mel, mel_len))
    assert got == pytest.approx(expected, rel=1e-5)
