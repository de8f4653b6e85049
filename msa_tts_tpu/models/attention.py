"""Attention mechanisms for the Tacotron-2 decoder, stateless.

The reference keeps attention state (α, u, attention weights, cumulative
weights, window index) as module attributes mutated every step
(msa_tts/models/modules_tacotron2nv/forward_attn.py:103-116,219).  Here
state is an explicit :class:`AttnState` pytree threaded through the
decoder ``lax.scan`` carry — the TPU-native formulation.

Two mechanisms:
  * ``ForwardAttention`` — Mozilla-TTS-style location-sensitive attention
    with optional forward-attention recursion, transition agent, windowing
    and monotonic inference masking
    (reference: msa_tts/models/modules_tacotron2nv/forward_attn.py).
  * ``LSA`` — NVIDIA-style location-sensitive attention.  The reference's
    LSA is broken as written (undefined attributes, missing init_states —
    msa_tts/models/modules_tacotron2nv/lsa.py:72-73); this implementation
    follows the spec it clearly intends (Tacotron-2 paper LSA) and works.

Note on masking: the reference *comments out* energy masking in
ForwardAttention (forward_attn.py:193-194), so padded encoder positions
do receive attention mass.  We reproduce that by default
(``mask_energies=False``) for parity, but the fixed behavior is one flag
away.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import nn as N

MASK_VALUE = -1e30  # used instead of -inf for XLA-safe softmax


class AttnState(NamedTuple):
    """Per-utterance attention state carried through the decoder scan."""

    attention_weights: jax.Array      # (B, T_in)  — α of previous step
    attention_weights_cum: jax.Array  # (B, T_in)  — Σ alignments
    alpha: jax.Array                  # (B, T_in)  — forward-attn recursion
    u: jax.Array                      # (B, 1)     — transition agent
    win_idx: jax.Array                # (B,) int32 — attention window center


def init_attn_state(batch: int, t_in: int, dtype=jnp.float32) -> AttnState:
    """Initial state (reference: forward_attn.py:85-116)."""
    alpha = jnp.concatenate(
        [
            jnp.ones((batch, 1), dtype),
            jnp.zeros((batch, t_in - 1), dtype) + 1e-7,
        ],
        axis=1,
    )
    return AttnState(
        attention_weights=jnp.zeros((batch, t_in), dtype),
        attention_weights_cum=jnp.zeros((batch, t_in), dtype),
        alpha=alpha,
        u=0.5 * jnp.ones((batch, 1), dtype),
        win_idx=jnp.full((batch,), -1, jnp.int32),
    )


# --------------------------------------------------------------------------
# Parameter initialization
# --------------------------------------------------------------------------

def init_location_layer(rng, attention_dim: int, n_filters: int,
                        kernel_size: int):
    k_conv, k_dense = jax.random.split(rng)
    return {
        "location_conv1d": N.init_conv1d(
            k_conv, 2, n_filters, kernel_size, bias=False
        ),
        "location_dense": N.init_linear(
            k_dense, n_filters, attention_dim, bias=False, w_init_gain="tanh"
        ),
    }


def init_forward_attention(
    rng,
    query_dim: int,
    embedding_dim: int,
    attention_dim: int,
    *,
    location_attention: bool = True,
    attention_location_n_filters: int = 32,
    attention_location_kernel_size: int = 31,
    trans_agent: bool = True,
):
    ks = jax.random.split(rng, 5)
    params = {
        "query_layer": N.init_linear(
            ks[0], query_dim, attention_dim, bias=False, w_init_gain="tanh"
        ),
        "inputs_layer": N.init_linear(
            ks[1], embedding_dim, attention_dim, bias=False, w_init_gain="tanh"
        ),
        "v": N.init_linear(ks[2], attention_dim, 1, bias=True),
    }
    if trans_agent:
        # plain nn.Linear in the reference (default torch init)
        import math

        a = 1.0 / math.sqrt(query_dim + embedding_dim)
        k_w, k_b = jax.random.split(ks[3])
        params["ta"] = {
            "weight": jax.random.uniform(
                k_w, (1, query_dim + embedding_dim), jnp.float32, -a, a
            ),
            "bias": jax.random.uniform(k_b, (1,), jnp.float32, -a, a),
        }
    if location_attention:
        params["location_layer"] = init_location_layer(
            ks[4],
            attention_dim,
            attention_location_n_filters,
            attention_location_kernel_size,
        )
    return params


def init_lsa(rng, query_dim: int, embedding_dim: int, attention_dim: int,
             n_filters: int, kernel_size: int):
    ks = jax.random.split(rng, 4)
    return {
        "query_layer": N.init_linear(
            ks[0], query_dim, attention_dim, bias=False, w_init_gain="tanh"
        ),
        "memory_layer": N.init_linear(
            ks[1], embedding_dim, attention_dim, bias=False, w_init_gain="tanh"
        ),
        "v": N.init_linear(ks[2], attention_dim, 1, bias=False),
        "location_layer": init_location_layer(
            ks[3], attention_dim, n_filters, kernel_size
        ),
    }


# --------------------------------------------------------------------------
# Application
# --------------------------------------------------------------------------

def preprocess_inputs(params, inputs):
    """Project encoder outputs once per utterance (hoisted out of the
    decoder scan — one large MXU matmul)."""
    return N.linear(params["inputs_layer"], inputs)


def _location_features(params, state: AttnState):
    attention_cat = jnp.stack(
        [state.attention_weights, state.attention_weights_cum], axis=1
    )  # (B, 2, T)
    k = params["location_conv1d"]["weight"].shape[-1]
    processed = N.conv1d(
        params["location_conv1d"], attention_cat, padding=(k - 1) // 2
    )  # (B, F, T)
    return N.linear(params["location_dense"], jnp.swapaxes(processed, 1, 2))


def _apply_windowing(attention, state: AttnState, *, win_back=2, win_front=6):
    """Traced equivalent of the reference's inference-time attention window
    (forward_attn.py:139-152).  Computed per batch element (the reference
    uses element 0's argmax for the whole batch; identical for B == 1,
    which is the reference's inference batch shape)."""
    T = attention.shape[1]
    pos = jnp.arange(T)[None, :]
    win = state.win_idx[:, None]
    first_step = win < 0
    back = win - win_back
    front = win + win_front
    window_mask = (pos >= back) & (pos < front)
    keep = first_step | window_mask
    attention = jnp.where(keep, attention, MASK_VALUE)
    # "trick" on the first step: set position 0 to the max energy
    att0 = jnp.where(
        first_step[:, 0],
        jnp.max(attention, axis=1),
        attention[:, 0],
    )
    attention = attention.at[:, 0].set(att0)
    new_win_idx = jnp.argmax(attention, axis=1).astype(jnp.int32)
    return attention, new_win_idx


def _forward_attn_inference_mask(alpha, fwd_shifted_alpha):
    """Monotonic state masking (forward_attn.py:163-173), traced: zero all
    states more than 3 ahead of the previous peak, zero all states before
    it, and leave a 0.01·max smoothing value two steps back."""
    T = alpha.shape[1]
    n = jnp.argmax(fwd_shifted_alpha, axis=1)  # (B,)
    val = jnp.max(alpha, axis=1)  # (B,)
    pos = jnp.arange(T)[None, :]
    n_ = n[:, None]
    out = jnp.where(pos >= n_ + 3, 0.0, alpha)
    out = jnp.where(pos < n_ - 1, 0.0, out)
    out = jnp.where(pos == n_ - 2, 0.01 * val[:, None], out)
    return out


def forward_attention(
    params,
    query,
    inputs,
    processed_inputs,
    state: AttnState,
    mask=None,
    *,
    location_attention: bool = True,
    windowing: bool = False,
    norm: str = "softmax",
    forward_attn: bool = True,
    trans_agent: bool = True,
    forward_attn_mask: bool = False,
    training: bool = True,
    mask_energies: bool = False,
):
    """One attention step.

    Args:
      query: (B, query_dim) attention-RNN hidden state.
      inputs: (B, T_in, embedding_dim) encoder outputs (+ speaker cond.).
      processed_inputs: (B, T_in, attention_dim) from
        :func:`preprocess_inputs`.
      state: previous :class:`AttnState`.
      mask: optional (B, T_in) validity mask (True = valid).

    Returns ``(context (B, D), alignment (B, T_in), new_state)``.
    """
    processed_query = N.linear(params["query_layer"], query[:, None, :])
    if location_attention:
        processed_loc = _location_features(params["location_layer"], state)
        energies = N.linear(
            params["v"],
            jnp.tanh(processed_query + processed_loc + processed_inputs),
        )[..., 0]
    else:
        energies = N.linear(
            params["v"], jnp.tanh(processed_query + processed_inputs)
        )[..., 0]

    if mask_energies and mask is not None:
        energies = jnp.where(mask, energies, MASK_VALUE)

    new_win_idx = state.win_idx
    if windowing and not training:
        energies, new_win_idx = _apply_windowing(energies, state)

    if norm == "softmax":
        alignment = jax.nn.softmax(energies, axis=-1)
    elif norm == "sigmoid":
        sig = jax.nn.sigmoid(energies)
        alignment = sig / jnp.sum(sig, axis=1, keepdims=True)
    else:
        raise ValueError(f"unknown attention norm: {norm}")

    new_cum = state.attention_weights_cum
    if location_attention:
        new_cum = new_cum + alignment

    new_alpha = state.alpha
    if forward_attn:
        fwd_shifted = jnp.pad(state.alpha[:, :-1], ((0, 0), (1, 0)))
        alpha = (
            (1.0 - state.u) * state.alpha + state.u * fwd_shifted + 1e-8
        ) * alignment
        if forward_attn_mask and not training:
            alpha = _forward_attn_inference_mask(alpha, fwd_shifted)
        alignment = alpha / jnp.sum(alpha, axis=1, keepdims=True)
        new_alpha = alignment

    context = jnp.einsum("bt,btd->bd", alignment, inputs)

    new_u = state.u
    if forward_attn and trans_agent:
        ta_input = jnp.concatenate([context, query], axis=-1)
        new_u = jax.nn.sigmoid(N.linear(params["ta"], ta_input))

    new_state = AttnState(
        attention_weights=alignment,
        attention_weights_cum=new_cum,
        alpha=new_alpha,
        u=new_u,
        win_idx=new_win_idx,
    )
    return context, alignment, new_state


def lsa_attention(
    params,
    query,
    inputs,
    processed_inputs,
    state: AttnState,
    mask=None,
    *,
    mask_energies: bool = True,
    **_unused,
):
    """NVIDIA-style location-sensitive attention step (fixed version of the
    reference's broken LSA — see module docstring)."""
    processed_query = N.linear(params["query_layer"], query[:, None, :])
    processed_loc = _location_features(params["location_layer"], state)
    energies = N.linear(
        params["v"],
        jnp.tanh(processed_query + processed_loc + processed_inputs),
    )[..., 0]
    if mask_energies and mask is not None:
        energies = jnp.where(mask, energies, MASK_VALUE)
    alignment = jax.nn.softmax(energies, axis=-1)
    context = jnp.einsum("bt,btd->bd", alignment, inputs)
    new_state = state._replace(
        attention_weights=alignment,
        attention_weights_cum=state.attention_weights_cum + alignment,
    )
    return context, alignment, new_state


def preprocess_inputs_lsa(params, inputs):
    return N.linear(params["memory_layer"], inputs)
