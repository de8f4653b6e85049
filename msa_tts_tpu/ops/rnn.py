"""Recurrent cells and masked sequence RNNs as ``lax.scan`` kernels.

TPU-first structure: the input projection ``x @ W_ih^T`` for a whole
sequence is hoisted out of the scan into one large MXU matmul; the scan
body only carries the small recurrent matmul.  Padding is handled by
masking carry updates, which reproduces PyTorch packed-sequence semantics
exactly (zero outputs at padded steps, reverse direction starting at the
last valid frame — cf. the reference encoder's pack_padded_sequence use,
msa_tts/models/modules_tacotron2nv/encoder.py:43-50).

Param layout matches torch (``weight_ih``: (4H, in), gates i,f,g,o for
LSTM; (3H, in), gates r,z,n for GRU).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


# ------------------------------------------------------------------ LSTM

def init_lstm_cell(rng, input_size: int, hidden_size: int,
                   dtype=jnp.float32):
    a = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(rng, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -a, a)
    return {
        "weight_ih": u(ks[0], (4 * hidden_size, input_size)),
        "weight_hh": u(ks[1], (4 * hidden_size, hidden_size)),
        "bias_ih": u(ks[2], (4 * hidden_size,)),
        "bias_hh": u(ks[3], (4 * hidden_size,)),
    }


def lstm_cell(params, x, hc):
    """One LSTM step. ``x``: (B, in); ``hc``: ((B, H), (B, H))."""
    h, c = hc
    gates = (
        x @ params["weight_ih"].T
        + h @ params["weight_hh"].T
        + params["bias_ih"]
        + params["bias_hh"]
    )
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def lstm_cell_precomputed(params, x_proj, hc):
    """LSTM step with the input projection already applied.

    ``x_proj`` = x @ W_ih^T + b_ih + b_hh, shape (B, 4H).
    """
    h, c = hc
    gates = x_proj + h @ params["weight_hh"].T
    i, f, g, o = jnp.split(gates, 4, axis=-1)
    i, f, o = jax.nn.sigmoid(i), jax.nn.sigmoid(f), jax.nn.sigmoid(o)
    g = jnp.tanh(g)
    c_new = f * c + i * g
    h_new = o * jnp.tanh(c_new)
    return h_new, c_new


def _masked_lstm_scan(params, x, lengths, *, reverse: bool):
    """Run a masked LSTM over (B, T, D) → (B, T, H).

    Carry updates are gated on position validity; outputs at padded
    positions are zero.
    """
    B, T, _ = x.shape
    H = params["weight_hh"].shape[1]
    # One big MXU matmul for all input projections.
    x_proj = x @ params["weight_ih"].T + params["bias_ih"] + params["bias_hh"]
    x_proj = jnp.swapaxes(x_proj, 0, 1)  # (T, B, 4H)

    t_idx = jnp.arange(T)
    if reverse:
        x_proj = x_proj[::-1]
        t_idx = t_idx[::-1]
    valid = (t_idx[:, None] < lengths[None, :]).astype(x.dtype)  # (T, B)

    def step(carry, inp):
        h, c = carry
        xp_t, v = inp
        h_new, c_new = lstm_cell_precomputed(params, xp_t, (h, c))
        v = v[:, None]
        h = v * h_new + (1.0 - v) * h
        c = v * c_new + (1.0 - v) * c
        return (h, c), h_new * v

    init = (jnp.zeros((B, H), x.dtype), jnp.zeros((B, H), x.dtype))
    _, outs = jax.lax.scan(step, init, (x_proj, valid))
    if reverse:
        outs = outs[::-1]
    return jnp.swapaxes(outs, 0, 1)  # (B, T, H)


def init_bilstm(rng, input_size: int, hidden_size: int, dtype=jnp.float32):
    k_f, k_b = jax.random.split(rng)
    return {
        "forward": init_lstm_cell(k_f, input_size, hidden_size, dtype),
        "backward": init_lstm_cell(k_b, input_size, hidden_size, dtype),
    }


def bilstm(params, x, lengths):
    """Bidirectional masked LSTM: (B, T, D) → (B, T, 2H)."""
    fwd = _masked_lstm_scan(params["forward"], x, lengths, reverse=False)
    bwd = _masked_lstm_scan(params["backward"], x, lengths, reverse=True)
    return jnp.concatenate([fwd, bwd], axis=-1)


# ------------------------------------------------------------------- GRU

def init_gru_cell(rng, input_size: int, hidden_size: int,
                  dtype=jnp.float32):
    a = 1.0 / math.sqrt(hidden_size)
    ks = jax.random.split(rng, 4)
    u = lambda k, shape: jax.random.uniform(k, shape, dtype, -a, a)
    return {
        "weight_ih": u(ks[0], (3 * hidden_size, input_size)),
        "weight_hh": u(ks[1], (3 * hidden_size, hidden_size)),
        "bias_ih": u(ks[2], (3 * hidden_size,)),
        "bias_hh": u(ks[3], (3 * hidden_size,)),
    }


def gru_cell(params, x, h):
    """One GRU step (torch gate order r, z, n)."""
    gi = x @ params["weight_ih"].T + params["bias_ih"]
    gh = h @ params["weight_hh"].T + params["bias_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def gru(params, x, h0=None):
    """Unidirectional GRU over (B, T, D) → (B, T, H) with one hoisted
    input-projection matmul."""
    B, T, _ = x.shape
    H = params["weight_hh"].shape[1]
    gi = x @ params["weight_ih"].T + params["bias_ih"]  # (B, T, 3H)
    gi = jnp.swapaxes(gi, 0, 1)

    def step(h, gi_t):
        gh = h @ params["weight_hh"].T + params["bias_hh"]
        i_r, i_z, i_n = jnp.split(gi_t, 3, axis=-1)
        h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
        r = jax.nn.sigmoid(i_r + h_r)
        z = jax.nn.sigmoid(i_z + h_z)
        n = jnp.tanh(i_n + r * h_n)
        h_new = (1.0 - z) * n + z * h
        return h_new, h_new

    init = h0 if h0 is not None else jnp.zeros((B, H), x.dtype)
    _, outs = jax.lax.scan(step, init, gi)
    return jnp.swapaxes(outs, 0, 1)
