"""Neural-net primitive ops as pure functions over explicit param pytrees.

Parameters use torch-compatible layouts (``weight`` is ``(out, in)`` for
linear layers, ``(out, in, k)`` for 1-D convs, LSTM gates ordered
i, f, g, o) so that reference PyTorch checkpoints can be imported with a
pure key-mapping and validated for output parity.  Initializers reproduce
the reference's (xavier-uniform by nonlinearity gain for Linear/Conv —
msa_tts/models/modules_tacotron2nv/modules.py:6-37 — and
U(−1/√H, 1/√H) for LSTM cells).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

# ----------------------------------------------------------------- gains

_GAINS = {
    "linear": 1.0,
    "sigmoid": 1.0,
    "tanh": 5.0 / 3.0,
    "relu": math.sqrt(2.0),
}


def calculate_gain(nonlinearity: str) -> float:
    return _GAINS[nonlinearity]


# ----------------------------------------------------------------- linear

def init_linear(rng, in_features: int, out_features: int, *,
                bias: bool = True, w_init_gain: str = "linear",
                dtype=jnp.float32):
    gain = calculate_gain(w_init_gain)
    a = gain * math.sqrt(6.0 / (in_features + out_features))
    k_w, _ = jax.random.split(rng)
    params = {
        "weight": jax.random.uniform(
            k_w, (out_features, in_features), dtype, minval=-a, maxval=a
        )
    }
    if bias:
        params["bias"] = jnp.zeros((out_features,), dtype)
    return params


def linear(params, x):
    y = x @ params["weight"].T
    if "bias" in params:
        y = y + params["bias"]
    return y


# ----------------------------------------------------------------- conv1d

def init_conv1d(rng, in_channels: int, out_channels: int, kernel_size: int,
                *, bias: bool = True, w_init_gain: str = "linear",
                dtype=jnp.float32):
    gain = calculate_gain(w_init_gain)
    fan_in = in_channels * kernel_size
    fan_out = out_channels * kernel_size
    a = gain * math.sqrt(6.0 / (fan_in + fan_out))
    k_w, _ = jax.random.split(rng)
    params = {
        "weight": jax.random.uniform(
            k_w, (out_channels, in_channels, kernel_size), dtype,
            minval=-a, maxval=a,
        )
    }
    if bias:
        params["bias"] = jnp.zeros((out_channels,), dtype)
    return params


def conv1d(params, x, *, stride: int = 1, padding: int = 0,
           dilation: int = 1, groups: int = 1):
    """1-D convolution on ``(B, C, T)`` inputs (torch NCW layout)."""
    y = lax.conv_general_dilated(
        x,
        params["weight"],
        window_strides=(stride,),
        padding=[(padding, padding)],
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
    )
    if "bias" in params:
        y = y + params["bias"][None, :, None]
    return y


def init_conv_transpose1d(rng, in_channels: int, out_channels: int,
                          kernel_size: int, *, bias: bool = True,
                          dtype=jnp.float32):
    """torch ConvTranspose1d default init: U(-1/sqrt(fan), 1/sqrt(fan))
    with weight layout (in, out, k)."""
    fan = in_channels * kernel_size
    a = 1.0 / math.sqrt(fan)
    k_w, k_b = jax.random.split(rng)
    params = {
        "weight": jax.random.uniform(
            k_w, (in_channels, out_channels, kernel_size), dtype,
            minval=-a, maxval=a,
        )
    }
    if bias:
        params["bias"] = jax.random.uniform(
            k_b, (out_channels,), dtype, minval=-a, maxval=a
        )
    return params


def conv_transpose1d(params, x, *, stride: int = 1, padding: int = 0):
    """Transposed 1-D convolution on ``(B, C, T)`` (torch semantics)."""
    w = params["weight"]  # (in, out, k)
    k = w.shape[-1]
    # Transposed conv = lhs-dilated conv with flipped kernel.
    y = lax.conv_general_dilated(
        x,
        jnp.flip(w, axis=-1).transpose(1, 0, 2),  # (out, in, k)
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    if "bias" in params:
        y = y + params["bias"][None, :, None]
    return y


# ------------------------------------------------------------- batch norm

def init_batchnorm(num_features: int, dtype=jnp.float32):
    params = {
        "weight": jnp.ones((num_features,), dtype),
        "bias": jnp.zeros((num_features,), dtype),
    }
    state = {
        "running_mean": jnp.zeros((num_features,), dtype),
        "running_var": jnp.ones((num_features,), dtype),
    }
    return params, state


def batchnorm1d(params, state, x, *, train: bool, momentum: float = 0.1,
                eps: float = 1e-5):
    """BatchNorm over ``(B, C, T)`` or ``(B, C)`` inputs; returns
    ``(y, new_state)``.  Uses biased variance for normalization and
    unbiased for the running update (torch semantics)."""
    axes = (0,) if x.ndim == 2 else (0, 2)
    shape = (1, -1) if x.ndim == 2 else (1, -1, 1)
    if train:
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        n = x.shape[0] if x.ndim == 2 else x.shape[0] * x.shape[2]
        unbiased = var * n / max(n - 1, 1)
        new_state = {
            "running_mean": (1 - momentum) * state["running_mean"]
            + momentum * mean,
            "running_var": (1 - momentum) * state["running_var"]
            + momentum * unbiased,
        }
    else:
        mean, var = state["running_mean"], state["running_var"]
        new_state = state
    y = (x - mean.reshape(shape)) * lax.rsqrt(var.reshape(shape) + eps)
    y = y * params["weight"].reshape(shape) + params["bias"].reshape(shape)
    return y, new_state


# ---------------------------------------------------------------- dropout

def dropout(rng, x, rate: float, *, deterministic: bool):
    """Inverted dropout; identity when deterministic or rate == 0."""
    if deterministic or rate == 0.0:
        return x
    keep = 1.0 - rate
    mask = jax.random.bernoulli(rng, keep, x.shape)
    return jnp.where(mask, x / keep, 0.0)


# -------------------------------------------------------------- embedding

def init_embedding(rng, num_embeddings: int, dim: int, *,
                   scaled_uniform: bool = False, dtype=jnp.float32):
    if scaled_uniform:
        # Reference char-embedding init: U(±sqrt(3)·sqrt(2/(V+D)))
        # (msa_tts/models/tacotron2nv.py:19-22).
        std = math.sqrt(2.0 / (num_embeddings + dim))
        val = math.sqrt(3.0) * std
        w = jax.random.uniform(
            rng, (num_embeddings, dim), dtype, minval=-val, maxval=val
        )
    else:
        w = jax.random.normal(rng, (num_embeddings, dim), dtype)
    return {"weight": w}


def embedding(params, ids):
    return params["weight"][ids]
