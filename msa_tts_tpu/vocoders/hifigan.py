"""HiFi-GAN generator (inference vocoder), functional JAX.

Reference: msa_tts/utils/hifigan/models.py:75-126 — conv_pre →
[leaky-relu → transposed-conv upsample → multi-receptive-field fusion of
ResBlock1/2] × n → leaky-relu → conv_post → tanh.  The reference loads a
trained torch checkpoint and removes weight norm before inference
(hifigan.py:14-24); our importer fuses weight-norm (g·v/‖v‖) at load
time so apply() runs plain convolutions on the MXU.

Config is the standard HiFi-GAN JSON (``resblock``, ``upsample_rates``,
``upsample_kernel_sizes``, ``upsample_initial_channel``,
``resblock_kernel_sizes``, ``resblock_dilation_sizes``).
"""

from __future__ import annotations

import json

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn as N

LRELU_SLOPE = 0.1


class AttrDict(dict):
    def __init__(self, *args, **kwargs):
        super().__init__(*args, **kwargs)
        self.__dict__ = self


def load_hifigan_config(path: str) -> AttrDict:
    with open(path) as f:
        return AttrDict(json.load(f))


def get_padding(kernel_size: int, dilation: int = 1) -> int:
    return (kernel_size * dilation - dilation) // 2


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _norm_init_conv(rng, in_ch, out_ch, k, dtype=jnp.float32):
    """HiFi-GAN init: weights ~ N(0, 0.01)."""
    kw, _ = jax.random.split(rng)
    return {
        "weight": 0.01 * jax.random.normal(kw, (out_ch, in_ch, k), dtype),
        "bias": jnp.zeros((out_ch,), dtype),
    }


def _norm_init_convT(rng, in_ch, out_ch, k, dtype=jnp.float32):
    kw, _ = jax.random.split(rng)
    return {
        "weight": 0.01 * jax.random.normal(kw, (in_ch, out_ch, k), dtype),
        "bias": jnp.zeros((out_ch,), dtype),
    }


def init_resblock(rng, kind: str, channels: int, kernel_size: int,
                  dilations):
    ks = jax.random.split(rng, 2 * len(dilations))
    if kind == "1":
        return {
            "convs1": [
                _norm_init_conv(ks[i], channels, channels, kernel_size)
                for i in range(len(dilations))
            ],
            "convs2": [
                _norm_init_conv(
                    ks[len(dilations) + i], channels, channels, kernel_size
                )
                for i in range(len(dilations))
            ],
        }
    return {
        "convs": [
            _norm_init_conv(ks[i], channels, channels, kernel_size)
            for i in range(len(dilations))
        ]
    }


def init_generator(rng, h: dict, n_mels: int = 80):
    h = AttrDict(h)
    ks = jax.random.split(rng, 3 + len(h.upsample_rates) * 8)
    ki = iter(range(len(ks)))
    params = {
        "conv_pre": _norm_init_conv(
            ks[next(ki)], n_mels, h.upsample_initial_channel, 7
        )
    }
    ups = []
    resblocks = []
    ch = h.upsample_initial_channel
    for i, (u, k) in enumerate(
        zip(h.upsample_rates, h.upsample_kernel_sizes)
    ):
        in_ch = h.upsample_initial_channel // (2**i)
        ch = h.upsample_initial_channel // (2 ** (i + 1))
        ups.append(_norm_init_convT(ks[next(ki)], in_ch, ch, k))
        for kk, d in zip(h.resblock_kernel_sizes, h.resblock_dilation_sizes):
            resblocks.append(
                init_resblock(ks[next(ki)], h.resblock, ch, kk, d)
            )
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["conv_post"] = _norm_init_conv(ks[next(ki)], ch, 1, 7)
    return params


# --------------------------------------------------------------------------
# Apply
# --------------------------------------------------------------------------

def _resblock_apply(params, kind: str, x, kernel_size: int, dilations,
                    mask=None):
    def m(t):
        return t if mask is None else jnp.where(mask, t, 0.0)

    if kind == "1":
        for c1, c2, d in zip(params["convs1"], params["convs2"], dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = m(N.conv1d(
                c1, xt, padding=get_padding(kernel_size, d), dilation=d
            ))
            xt = jax.nn.leaky_relu(xt, LRELU_SLOPE)
            xt = m(N.conv1d(c2, xt, padding=get_padding(kernel_size, 1)))
            x = xt + x
    else:
        for c, d in zip(params["convs"], dilations):
            xt = jax.nn.leaky_relu(x, LRELU_SLOPE)
            xt = m(N.conv1d(
                c, xt, padding=get_padding(kernel_size, d), dilation=d
            ))
            x = xt + x
    return x


def generator_apply(params, h: dict, mel, lengths=None):
    """mel: (B, n_mels, T) log-mel ("ap2" flavor) → waveform (B, T·hop).

    ``lengths`` (B,) true frame counts makes the batched run
    pad-invariant to conv semantics: zeroing every conv's output at
    frames ≥ the (per-layer upsampled) true length reproduces the
    implicit zero padding the unpadded single-utterance run sees, layer
    by layer — including *inside* the resblocks, where a second conv
    would otherwise read the bias the first conv wrote into the padded
    region.  Row i's first ``T_i·hop`` samples then equal
    ``inference(mels[i])`` exactly."""
    h = AttrDict(h)
    num_kernels = len(h.resblock_kernel_sizes)

    def mk_mask(T, lens):
        return (jnp.arange(T)[None, :] < lens[:, None])[:, None, :]

    mask = None if lengths is None else mk_mask(mel.shape[2], lengths)

    def m(t):
        return t if mask is None else jnp.where(mask, t, 0.0)

    x = m(N.conv1d(params["conv_pre"], mel, padding=3))
    for i, (u, k) in enumerate(
        zip(h.upsample_rates, h.upsample_kernel_sizes)
    ):
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        x = N.conv_transpose1d(
            params["ups"][i], x, stride=u, padding=(k - u) // 2
        )
        if lengths is not None:
            lengths = lengths * u
            mask = mk_mask(x.shape[2], lengths)
        x = m(x)
        xs = None
        for j in range(num_kernels):
            rb = params["resblocks"][i * num_kernels + j]
            y = _resblock_apply(
                rb,
                h.resblock,
                x,
                h.resblock_kernel_sizes[j],
                h.resblock_dilation_sizes[j],
                mask=mask,
            )
            xs = y if xs is None else xs + y
        x = xs / num_kernels
    x = jax.nn.leaky_relu(x)
    x = N.conv1d(params["conv_post"], x, padding=3)
    return jnp.tanh(x)[:, 0, :]


# --------------------------------------------------------------------------
# Torch checkpoint import (with weight-norm fusion)
# --------------------------------------------------------------------------

def _fuse_weight_norm(sd: dict, key: str) -> np.ndarray:
    """weight = g · v / ‖v‖ with the norm over all dims except dim 0
    (torch weight_norm default)."""
    if key + ".weight" in sd:
        return np.asarray(sd[key + ".weight"], dtype=np.float32)
    g = np.asarray(sd[key + ".weight_g"], dtype=np.float32)
    v = np.asarray(sd[key + ".weight_v"], dtype=np.float32)
    axes = tuple(range(1, v.ndim))
    norm = np.sqrt(np.sum(v**2, axis=axes, keepdims=True))
    return g * v / np.maximum(norm, 1e-12)


def _conv_from_sd(sd, key):
    import jax.numpy as jnp

    p = {"weight": jnp.asarray(_fuse_weight_norm(sd, key))}
    if key + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[key + ".bias"], np.float32))
    return p


def load_torch_generator(checkpoint_path: str, h: dict):
    """Load a torch HiFi-GAN generator checkpoint (the usual
    ``{"generator": state_dict}`` layout or a bare state_dict)."""
    import torch

    raw = torch.load(checkpoint_path, map_location="cpu", weights_only=True)
    sd = raw.get("generator", raw)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    return generator_params_from_state_dict(sd, h)


def generator_params_from_state_dict(sd: dict, h: dict):
    h = AttrDict(h)
    params = {"conv_pre": _conv_from_sd(sd, "conv_pre")}
    ups = []
    for i in range(len(h.upsample_rates)):
        ups.append(_conv_from_sd(sd, f"ups.{i}"))
    params["ups"] = ups
    resblocks = []
    num_kernels = len(h.resblock_kernel_sizes)
    n_res = len(h.upsample_rates) * num_kernels
    for i in range(n_res):
        base = f"resblocks.{i}"
        # one conv per dilation entry — sized from the config, not
        # hardcoded to the v1/v2/v3 presets, so custom dilation lists
        # round-trip instead of raising KeyError / truncating silently
        n_convs = len(h.resblock_dilation_sizes[i % num_kernels])
        if h.resblock == "1":
            resblocks.append(
                {
                    "convs1": [
                        _conv_from_sd(sd, f"{base}.convs1.{j}")
                        for j in range(n_convs)
                    ],
                    "convs2": [
                        _conv_from_sd(sd, f"{base}.convs2.{j}")
                        for j in range(n_convs)
                    ],
                }
            )
        else:
            resblocks.append(
                {
                    "convs": [
                        _conv_from_sd(sd, f"{base}.convs.{j}")
                        for j in range(n_convs)
                    ]
                }
            )
    params["resblocks"] = resblocks
    params["conv_post"] = _conv_from_sd(sd, "conv_post")
    return params


class HiFiGAN:
    """Reference-API wrapper: config JSON + checkpoint → ``inference(mel)``
    (reference hifigan.py:7-25)."""

    def __init__(self, config_path: str, checkpoint_path: str, device=None):
        self.h = load_hifigan_config(config_path)
        self.params = load_torch_generator(checkpoint_path, self.h)
        self._apply = jax.jit(
            lambda p, mel: generator_apply(p, dict(self.h), mel)
        )

    @classmethod
    def from_params(cls, params, h: dict) -> "HiFiGAN":
        """Wrap an in-memory generator (e.g. one trained by
        trainers/hifigan_train.py) without a checkpoint file."""
        obj = cls.__new__(cls)
        obj.h = AttrDict(h)
        obj.params = params
        obj._apply = jax.jit(
            lambda p, mel: generator_apply(p, dict(obj.h), mel)
        )
        return obj

    def inference(self, mel):
        mel = jnp.asarray(mel)
        if mel.ndim == 2:
            mel = mel[None]
        return self._apply(self.params, mel)[0]

    def inference_batch(self, mels) -> list:
        """ONE generator pass for variably-sized mels: shapes are
        quantized by ``utils.batching.pad_mel_batch`` (zero fill) and
        each waveform is cut back to its own frames·hop samples.
        Pad-invariant: zero-filled padding + the per-layer length
        masking in ``generator_apply`` make row i's output equal
        ``inference(mels[i])`` regardless of batch composition."""
        import numpy as np

        from ..utils.batching import pad_mel_batch, pow2_bucket

        hop = 1
        for u in self.h.upsample_rates:
            hop *= u
        if len(mels) == 1:
            return [np.asarray(self.inference(mels[0]))]
        if not hasattr(self, "_apply_masked"):
            self._apply_masked = jax.jit(
                lambda p, mel, lens: generator_apply(
                    p, dict(self.h), mel, lengths=lens
                )
            )
        lens = jnp.asarray(
            [np.asarray(m).shape[1] for m in mels]
            + [np.asarray(mels[-1]).shape[1]]
            * (pow2_bucket(len(mels)) - len(mels)),
            jnp.int32,
        )
        wavs = np.asarray(
            self._apply_masked(
                self.params,
                jnp.asarray(pad_mel_batch(mels, fill="zero")),
                lens,
            )
        )
        return [
            wavs[i][: np.asarray(m).shape[1] * hop]
            for i, m in enumerate(mels)
        ]
