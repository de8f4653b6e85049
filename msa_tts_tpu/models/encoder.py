"""Tacotron-2 encoder: conv stack + masked bidirectional LSTM.

Reference behavior (msa_tts/models/modules_tacotron2nv/encoder.py):
N × (ConvNorm → BatchNorm1d → ReLU → dropout 0.5) on (B, C, T), then a
single-layer BiLSTM over length-packed sequences.  Here the BiLSTM is a
pair of masked ``lax.scan`` passes with the input projection hoisted into
one MXU matmul (see ops/rnn.py); packed-sequence semantics (zeros at
padding, reverse pass starting at the last valid frame) are reproduced by
carry masking.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops import rnn as R


def init_encoder(rng, n_convolutions: int, embedding_dim: int,
                 kernel_size: int):
    ks = jax.random.split(rng, n_convolutions + 1)
    convs = []
    bn_states = []
    for i in range(n_convolutions):
        k_c, _ = jax.random.split(ks[i])
        conv = N.init_conv1d(
            k_c, embedding_dim, embedding_dim, kernel_size,
            bias=True, w_init_gain="relu",
        )
        bn_params, bn_state = N.init_batchnorm(embedding_dim)
        convs.append({"conv": conv, "bn": bn_params})
        bn_states.append(bn_state)
    params = {
        "convolutions": convs,
        "lstm": R.init_bilstm(ks[-1], embedding_dim, embedding_dim // 2),
    }
    state = {"convolutions": bn_states}
    return params, state


def encoder_apply(
    params,
    state,
    x,
    input_lengths,
    *,
    rng=None,
    train: bool = True,
    dropout_rate: float = 0.5,
    kernel_size: int = 5,
    mask_pad: bool = False,
):
    """Apply the encoder.

    Args:
      x: (B, C, T) embedded character sequence (channels-first).
      input_lengths: (B,) valid lengths.
      mask_pad: zero padded positions before/between the convolutions so
        every conv window beyond the valid tail reads zeros — exactly
        what an unpadded sequence's zero conv padding provides.  Output
        at valid positions then does not depend on the padded length,
        which the serving paths rely on for shape bucketing
        (serving.py:synthesize_batch / synthesize_stream).  Off by
        default: the reference torch encoder does not mask its convs
        (pad embeddings leak into the last kernel//2·n_convs valid
        positions of shorter rows in a padded batch), and the
        bit-parity tests against imported reference weights require
        that exact behavior.

    Returns ``(outputs (B, T, C), new_state)``.
    """
    new_bn_states = []
    n_convs = len(params["convolutions"])
    rngs = (
        jax.random.split(rng, n_convs) if rng is not None else [None] * n_convs
    )
    valid = None
    if mask_pad:
        T = x.shape[-1]
        valid = (
            jnp.arange(T)[None, :] < input_lengths[:, None]
        )[:, None, :]  # (B, 1, T)
        x = jnp.where(valid, x, 0.0)
    for i, layer in enumerate(params["convolutions"]):
        pad = (kernel_size - 1) // 2
        x = N.conv1d(layer["conv"], x, padding=pad)
        x, bn_state = N.batchnorm1d(
            layer["bn"], state["convolutions"][i], x, train=train
        )
        new_bn_states.append(bn_state)
        x = jax.nn.relu(x)
        x = N.dropout(
            rngs[i], x, dropout_rate, deterministic=(not train or rng is None)
        )
        if valid is not None:
            # conv bias + BN shift make pad positions nonzero again;
            # re-zero so the next conv's windows stay pad-independent
            x = jnp.where(valid, x, 0.0)

    x = jnp.swapaxes(x, 1, 2)  # (B, T, C)
    outputs = R.bilstm(params["lstm"], x, input_lengths)
    return outputs, {"convolutions": new_bn_states}
