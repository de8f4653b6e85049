"""WaveRNN vocoder (MoL sample-level autoregressive), functional JAX.

Reference: msa_tts/utils/wavernn/{wavernn.py,modules.py} — UpsampleNetwork
(MelResNet + nearest-stretch + mean-filter convs), dual GRU + FC stack,
10-component discretized mix-of-logistics output.  The reference's
``generate`` is a sample-by-sample Python loop (wavernn.py:123-166);
here generation is a single ``lax.scan`` over samples, batched over the
fold axis (fold_with_overlap), so the per-sample matmuls run batched on
the MXU, and the equal-power crossfade unfold matches the reference
(wavernn.py:254-308).
"""

from __future__ import annotations

import math
import time
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import nn as N
from ..ops import rnn as R

LOG_SCALE_MIN = float(np.log(1e-14))


class WaveRNNConfig(NamedTuple):
    mode: str = "MOL"                  # MOL | GAUSS
    n_mels: int = 80
    rnn_dims: int = 512
    fc_dims: int = 512
    compute_dims: int = 128
    res_out_dims: int = 128
    res_blocks: int = 10
    hop_length: int = 256
    sample_rate: int = 22050
    pad: int = 2
    upsample_factors: tuple = (4, 8, 8)
    use_upsample_net: bool = True
    use_aux_net: bool = True

    @property
    def n_classes(self) -> int:
        if self.mode == "MOL":
            return 30
        if self.mode == "GAUSS":
            return 2
        raise ValueError(self.mode)

    @property
    def aux_dims(self) -> int:
        return self.res_out_dims // 4


def config_from_params(**params) -> WaveRNNConfig:
    ap = params["audio_params"]
    return WaveRNNConfig(
        mode=params.get("voc_mode", "MOL"),
        n_mels=ap["n_mels"],
        rnn_dims=params["rnn_dims"],
        fc_dims=params["fc_dims"],
        compute_dims=params["compute_dims"],
        res_out_dims=params["res_out_dims"],
        res_blocks=params["res_blocks"],
        hop_length=ap["hop_length"],
        sample_rate=ap["sample_rate"],
        pad=params["pad"],
        upsample_factors=tuple(params["upsample_factors"]),
        use_upsample_net=params.get("use_upsample_net", True),
        use_aux_net=params.get("use_aux_net", True),
    )


# --------------------------------------------------------------------------
# Init
# --------------------------------------------------------------------------

def _torch_linear(rng, in_f, out_f):
    a = 1.0 / math.sqrt(in_f)
    kw, kb = jax.random.split(rng)
    return {
        "weight": jax.random.uniform(kw, (out_f, in_f), jnp.float32, -a, a),
        "bias": jax.random.uniform(kb, (out_f,), jnp.float32, -a, a),
    }


def _torch_conv(rng, in_c, out_c, k, bias=True):
    a = 1.0 / math.sqrt(in_c * k)
    kw, kb = jax.random.split(rng)
    p = {
        "weight": jax.random.uniform(
            kw, (out_c, in_c, k), jnp.float32, -a, a
        )
    }
    if bias:
        p["bias"] = jax.random.uniform(kb, (out_c,), jnp.float32, -a, a)
    return p


def init_melresnet(rng, cfg: WaveRNNConfig):
    k_size = cfg.pad * 2 + 1
    ks = jax.random.split(rng, cfg.res_blocks + 2)
    layers = []
    state_layers = []
    for i in range(cfg.res_blocks):
        k1, k2 = jax.random.split(ks[i])
        bn1_p, bn1_s = N.init_batchnorm(cfg.compute_dims)
        bn2_p, bn2_s = N.init_batchnorm(cfg.compute_dims)
        layers.append(
            {
                "conv1": _torch_conv(
                    k1, cfg.compute_dims, cfg.compute_dims, 1, bias=False
                ),
                "conv2": _torch_conv(
                    k2, cfg.compute_dims, cfg.compute_dims, 1, bias=False
                ),
                "batch_norm1": bn1_p,
                "batch_norm2": bn2_p,
            }
        )
        state_layers.append({"batch_norm1": bn1_s, "batch_norm2": bn2_s})
    bn_p, bn_s = N.init_batchnorm(cfg.compute_dims)
    params = {
        "conv_in": _torch_conv(
            ks[-2], cfg.n_mels, cfg.compute_dims, k_size, bias=False
        ),
        "batch_norm": bn_p,
        "layers": layers,
        "conv_out": _torch_conv(
            ks[-1], cfg.compute_dims, cfg.res_out_dims, 1
        ),
    }
    state = {"batch_norm": bn_s, "layers": state_layers}
    return params, state


def init_wavernn(rng, cfg: WaveRNNConfig):
    ks = jax.random.split(rng, 8)
    resnet_p, resnet_s = init_melresnet(ks[0], cfg)
    if cfg.use_upsample_net:
        assert int(np.prod(cfg.upsample_factors)) == cfg.hop_length, (
            "upsample_factors must multiply to hop_length "
            f"({cfg.upsample_factors} vs {cfg.hop_length})"
        )
        up_convs = [
            {"weight": jnp.full((1, 1, 2 * s + 1), 1.0 / (2 * s + 1))}
            for s in cfg.upsample_factors
        ]
    else:
        # reference Upsample (modules.py:95-115) has no conv pyramid
        up_convs = []
    in_extra = cfg.aux_dims if cfg.use_aux_net else 0
    params = {
        "upsample": {"resnet": resnet_p, "up_convs": up_convs},
        "I": _torch_linear(ks[1], cfg.n_mels + in_extra + 1, cfg.rnn_dims),
        "rnn1": R.init_gru_cell(ks[2], cfg.rnn_dims, cfg.rnn_dims),
        "rnn2": R.init_gru_cell(
            ks[3], cfg.rnn_dims + in_extra, cfg.rnn_dims
        ),
        "fc1": _torch_linear(
            ks[4], cfg.rnn_dims + in_extra, cfg.fc_dims
        ),
        "fc2": _torch_linear(ks[5], cfg.fc_dims + in_extra, cfg.fc_dims),
        "fc3": _torch_linear(ks[6], cfg.fc_dims, cfg.n_classes),
    }
    state = {"upsample": {"resnet": resnet_s}}
    return params, state


# --------------------------------------------------------------------------
# Upsampling network
# --------------------------------------------------------------------------

def melresnet_apply(params, state, x, *, train: bool = False):
    """x: (B, n_mels, T) → (B, res_out, T − 2·pad)."""
    x = N.conv1d(params["conv_in"], x)  # valid conv trims 2·pad
    x, _ = N.batchnorm1d(params["batch_norm"], state["batch_norm"], x,
                         train=train)
    x = jax.nn.relu(x)
    for layer, st in zip(params["layers"], state["layers"]):
        res = x
        y = N.conv1d(layer["conv1"], x)
        y, _ = N.batchnorm1d(layer["batch_norm1"], st["batch_norm1"], y,
                             train=train)
        y = jax.nn.relu(y)
        y = N.conv1d(layer["conv2"], y)
        y, _ = N.batchnorm1d(layer["batch_norm2"], st["batch_norm2"], y,
                             train=train)
        x = y + res
    return N.conv1d(params["conv_out"], x)


def _stretch_time(x, scale: int):
    """Nearest-neighbor stretch along the last (time) axis."""
    return jnp.repeat(x, scale, axis=-1)


def _linear_interp_time(x, scale: int):
    """Linear interpolation along the last axis to ``T·scale`` samples,
    torch ``F.interpolate(mode='linear', align_corners=True)`` semantics
    (output grid spans exactly [0, T−1])."""
    T = x.shape[-1]
    T_out = T * scale
    coords = jnp.arange(T_out, dtype=x.dtype) * (
        (T - 1) / max(T_out - 1, 1)
    )
    i0 = jnp.floor(coords).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, T - 1)
    frac = (coords - i0.astype(x.dtype))[
        (None,) * (x.ndim - 1) + (slice(None),)
    ]
    return x[..., i0] * (1.0 - frac) + x[..., i1] * frac


def upsample_apply(params, state, cfg: WaveRNNConfig, mels, *,
                   train: bool = False):
    """mels: (B, n_mels, T) (already pad-extended by cfg.pad on both
    sides) → (mels_up (B, T'·hop, n_mels), aux (B, T'·hop, 4·aux)).

    ``use_upsample_net=True``: learned stretch+mean-filter pyramid with
    nearest-neighbor-stretched resnet aux (reference modules.py:61-93).
    ``use_upsample_net=False``: the reference's basic ``Upsample``
    (modules.py:95-115) — linear interpolation by ``hop_length`` with
    align_corners, trim ``pad·hop`` from both ends, scale by the
    empirical 0.045; aux linearly interpolated from the resnet's
    already-(2·pad)-trimmed frames, so its length equals mels_up's."""
    if not cfg.use_upsample_net:
        scale = cfg.hop_length
        aux = None
        if cfg.use_aux_net:
            aux = melresnet_apply(
                params["resnet"], state["resnet"], mels, train=train
            )
            aux = _linear_interp_time(aux, scale)
            aux = jnp.swapaxes(aux, 1, 2)
        indent = cfg.pad * scale
        m = _linear_interp_time(mels, scale)
        m = m[:, :, indent : m.shape[-1] - indent]  # safe at pad == 0
        m = m * 0.045
        return jnp.swapaxes(m, 1, 2), aux

    total_scale = int(np.prod(cfg.upsample_factors))
    aux = None
    if cfg.use_aux_net:
        aux = melresnet_apply(
            params["resnet"], state["resnet"], mels, train=train
        )
        aux = _stretch_time(aux, total_scale)
        aux = jnp.swapaxes(aux, 1, 2)

    m = mels
    B, C, _ = m.shape
    for conv, s in zip(params["up_convs"], cfg.upsample_factors):
        m = _stretch_time(m, s)
        # shared (1, 2s+1) mean filter across all channels
        flat = m.reshape(B * C, 1, m.shape[-1])
        flat = N.conv1d(conv, flat, padding=s)
        m = flat.reshape(B, C, -1)
    indent = cfg.pad * total_scale
    m = m[:, :, indent : m.shape[-1] - indent]  # safe at pad == 0
    return jnp.swapaxes(m, 1, 2), aux


# --------------------------------------------------------------------------
# Core network
# --------------------------------------------------------------------------

def wavernn_forward(params, state, cfg: WaveRNNConfig, x, mels, *,
                    train: bool = False):
    """Teacher-forced training pass.

    x: (B, T) previous samples; mels: (B, n_mels, T_mel).
    Returns logits (B, T, n_classes).

    Defaults to ``train=False``: the MelResNet batch-norms are treated
    as FIXED preprocessing (module docstring of trainers/wavernn_train)
    because this function returns only logits — under ``train=True`` it
    would normalize with batch statistics while silently discarding the
    running-stat updates, so training and generation would normalize
    differently.  ``train=True`` exists for parity experiments that
    thread state themselves; the shipped trainer and the generation
    path both run ``train=False`` against the same frozen stats.
    """
    mels_up, aux = upsample_apply(
        params["upsample"], state["upsample"], cfg, mels, train=train
    )
    d = cfg.aux_dims
    if cfg.use_aux_net:
        a1, a2, a3, a4 = (aux[:, :, i * d : (i + 1) * d] for i in range(4))
        inp = jnp.concatenate([x[:, :, None], mels_up, a1], axis=2)
    else:
        inp = jnp.concatenate([x[:, :, None], mels_up], axis=2)
    h = N.linear(params["I"], inp)
    res = h
    h = R.gru(params["rnn1"], h)
    h = h + res
    res = h
    h2_in = jnp.concatenate([h, a2], axis=2) if cfg.use_aux_net else h
    h = R.gru(params["rnn2"], h2_in)
    h = h + res
    h = jnp.concatenate([h, a3], axis=2) if cfg.use_aux_net else h
    h = jax.nn.relu(N.linear(params["fc1"], h))
    h = jnp.concatenate([h, a4], axis=2) if cfg.use_aux_net else h
    h = jax.nn.relu(N.linear(params["fc2"], h))
    return N.linear(params["fc3"], h)


# --------------------------------------------------------------------------
# MoL / Gaussian distributions
# --------------------------------------------------------------------------

def sample_from_discretized_mix_logistic(logits, rng,
                                         log_scale_min=LOG_SCALE_MIN):
    """logits: (B, 3·K) → samples (B,) in [−1, 1]."""
    K = logits.shape[-1] // 3
    logit_probs = logits[:, :K]
    means = logits[:, K : 2 * K]
    log_scales = jnp.maximum(logits[:, 2 * K :], log_scale_min)
    k_sel, k_u = jax.random.split(rng)
    # Gumbel-max mixture selection
    u = jax.random.uniform(
        k_sel, logit_probs.shape, minval=1e-5, maxval=1.0 - 1e-5
    )
    sel = jnp.argmax(logit_probs - jnp.log(-jnp.log(u)), axis=-1)
    onehot = jax.nn.one_hot(sel, K)
    mean = jnp.sum(means * onehot, axis=-1)
    log_scale = jnp.sum(log_scales * onehot, axis=-1)
    u2 = jax.random.uniform(
        k_u, mean.shape, minval=1e-5, maxval=1.0 - 1e-5
    )
    x = mean + jnp.exp(log_scale) * (jnp.log(u2) - jnp.log1p(-u2))
    return jnp.clip(x, -1.0, 1.0)


def discretized_mix_logistic_loss(y_hat, y, num_classes=65536,
                                  log_scale_min=LOG_SCALE_MIN):
    """Negative log-likelihood of a discretized logistic mixture.

    y_hat: (B, T, 3·K); y: (B, T, 1) in [−1, 1].
    """
    K = y_hat.shape[-1] // 3
    logit_probs = y_hat[..., :K]
    means = y_hat[..., K : 2 * K]
    log_scales = jnp.maximum(y_hat[..., 2 * K :], log_scale_min)

    centered = y - means  # broadcast (B, T, K)
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / (num_classes - 1))
    cdf_plus = jax.nn.sigmoid(plus_in)
    min_in = inv_stdv * (centered - 1.0 / (num_classes - 1))
    cdf_min = jax.nn.sigmoid(min_in)

    log_cdf_plus = plus_in - jax.nn.softplus(plus_in)      # log CDF at -1 edge
    log_one_minus_cdf_min = -jax.nn.softplus(min_in)       # at +1 edge
    cdf_delta = cdf_plus - cdf_min
    mid_in = inv_stdv * centered
    log_pdf_mid = mid_in - log_scales - 2.0 * jax.nn.softplus(mid_in)

    inner = jnp.where(
        cdf_delta > 1e-5,
        jnp.log(jnp.maximum(cdf_delta, 1e-12)),
        log_pdf_mid - np.log((num_classes - 1) / 2),
    )
    log_probs = jnp.where(
        y < -0.999,
        log_cdf_plus,
        jnp.where(y > 0.999, log_one_minus_cdf_min, inner),
    )
    log_probs = log_probs + jax.nn.log_softmax(logit_probs, axis=-1)
    return -jnp.mean(jax.nn.logsumexp(log_probs, axis=-1))


def gaussian_loss(y_hat, y, log_std_min=-7.0):
    mean = y_hat[..., :1]
    log_std = jnp.maximum(y_hat[..., 1:], log_std_min)
    log_probs = -0.5 * (
        -math.log(2.0 * math.pi)
        - 2.0 * log_std
        - (y - mean) ** 2 * jnp.exp(-2.0 * log_std)
    )
    return jnp.mean(log_probs)


def sample_from_gaussian(y_hat, rng, log_std_min=-7.0, scale_factor=1.0):
    mean = y_hat[..., 0]
    log_std = jnp.maximum(y_hat[..., 1], log_std_min)
    eps = jax.random.normal(rng, mean.shape)
    return jnp.clip(
        mean + jnp.exp(log_std) * eps, -scale_factor, scale_factor
    )


# --------------------------------------------------------------------------
# Generation (batched folds + lax.scan over samples)
# --------------------------------------------------------------------------

def _fold_counts(T: int, target: int, overlap: int):
    """Static fold bookkeeping for a (T, F) conditioning signal:
    returns ``(num_folds, n_pad_folds)`` where ``n_pad_folds`` buckets
    the fold count to a multiple of 4 (bounds recompiles); callers
    slice generated samples back to the real ``num_folds``."""
    num_folds = (T - overlap) // (target + overlap)
    extended = num_folds * (overlap + target) + overlap
    if T - extended != 0:
        num_folds += 1
    n_pad = -(-num_folds // 4) * 4
    return num_folds, n_pad


def _fold_device(x, target: int, overlap: int):
    """Device-side fold of (T, F) conditioning into
    ``(n_pad_folds, target + 2·overlap, F)`` overlapping segments via a
    gather (shapes are static under jit).  Returns ``(folded,
    num_folds)`` with ``num_folds`` the REAL fold count."""
    T = x.shape[0]
    L = target + 2 * overlap
    num_folds, n_pad = _fold_counts(T, target, overlap)
    last_start = (n_pad - 1) * (target + overlap)
    pad_T = max(last_start + L - T, 0)
    flat = jnp.pad(x, ((0, pad_T), (0, 0)))
    idx = (
        np.arange(n_pad)[:, None] * (target + overlap)
        + np.arange(L)[None, :]
    )
    return flat[jnp.asarray(idx)], num_folds


def fold_with_overlap(x: np.ndarray, target: int, overlap: int) -> np.ndarray:
    """(1, T, F) → (num_folds, target + 2·overlap, F) with shared overlap
    regions (reference wavernn.py:211-252)."""
    _, total_len, features = x.shape
    # floor-div goes NEGATIVE when total_len < overlap (a sub-overlap
    # utterance, ~12 ms at the default 275) and the unpatched formula
    # then yields ZERO folds — silently empty audio (round-5 review;
    # the reference's own fold shares the formula and the bug).  Clamp:
    # such inputs become one padded fold.
    num_folds = max((total_len - overlap) // (target + overlap), 0)
    extended_len = num_folds * (overlap + target) + overlap
    remaining = total_len - extended_len
    if remaining != 0:
        num_folds += 1
        padding = target + 2 * overlap - remaining
        x = np.pad(x, ((0, 0), (0, padding), (0, 0)))
    folded = np.zeros((num_folds, target + 2 * overlap, features), x.dtype)
    for i in range(num_folds):
        start = i * (target + overlap)
        folded[i] = x[0, start : start + target + 2 * overlap]
    return folded


def xfade_and_unfold(y: np.ndarray, target: int, overlap: int) -> np.ndarray:
    """Equal-power crossfade + overlap-add unfold
    (reference wavernn.py:254-308)."""
    num_folds, length = y.shape
    target = length - 2 * overlap
    total_len = num_folds * (target + overlap) + overlap

    silence_len = overlap // 2
    fade_len = overlap - silence_len
    silence = np.zeros(silence_len, dtype=np.float64)
    t = np.linspace(-1, 1, fade_len, dtype=np.float64)
    fade_in = np.concatenate([silence, np.sqrt(0.5 * (1 + t))])
    fade_out = np.concatenate([np.sqrt(0.5 * (1 - t)), silence])

    y = y.astype(np.float64).copy()
    y[:, :overlap] *= fade_in
    y[:, -overlap:] *= fade_out

    unfolded = np.zeros(total_len, dtype=np.float64)
    for i in range(num_folds):
        start = i * (target + overlap)
        unfolded[start : start + target + 2 * overlap] += y[i]
    return unfolded


def _mm(x, w):
    """x @ w.T with the inputs cast to the WEIGHT's dtype and the
    accumulation forced to f32 — the sample loop is weight-bandwidth
    bound (±15 MB of GRU/FC weights re-read from HBM every timestep),
    so bf16 weights halve the per-step floor while fp32 accumulation
    keeps the gate math stable."""
    return jax.lax.dot_general(
        x.astype(w.dtype), w,
        (((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _gru_cell_mm(p, x, h):
    """GRU step (torch gate order r, z, n) via _mm; gates in f32."""
    gi = _mm(x, p["weight_ih"]) + p["bias_ih"]
    gh = _mm(h, p["weight_hh"]) + p["bias_hh"]
    i_r, i_z, i_n = jnp.split(gi, 3, axis=-1)
    h_r, h_z, h_n = jnp.split(gh, 3, axis=-1)
    r = jax.nn.sigmoid(i_r + h_r)
    z = jax.nn.sigmoid(i_z + h_z)
    n = jnp.tanh(i_n + r * h_n)
    return (1.0 - z) * n + z * h


def cast_generation_params(params, dtype):
    """Cast the sample-loop weight MATRICES to ``dtype`` (biases and the
    one-shot upsample network stay f32).  Returns a new pytree; the
    original full-precision params are untouched (training/export keep
    using them)."""
    if dtype is None:
        return params
    out = dict(params)
    for name in ("I", "rnn1", "rnn2", "fc1", "fc2", "fc3"):
        layer = dict(params[name])
        for k in ("weight", "weight_ih", "weight_hh"):
            if k in layer:
                layer[k] = jnp.asarray(layer[k], dtype)
        out[name] = layer
    return out


def _make_generate_scan(cfg: WaveRNNConfig, with_noise: bool = False,
                        backend: str = "xla"):
    """Build the jitted ``run(params, mels_up, aux, rng) -> samples``
    (or, with ``with_noise``, ``run(params, mels_up, aux, noise1,
    noise2)`` taking the pre-drawn sampling noise — used by the
    multi-utterance batch path, which draws per-utterance noise from
    per-utterance keys).

    ``backend="pallas"`` swaps the ``lax.scan`` for the whole-loop
    Pallas TPU kernel (pallas_gen.py): sample-loop weights stay resident
    in VMEM for the entire generation instead of being re-read from HBM
    every step — measured 1.3-1.65× at every fold batch from 16 to 320
    rows and parity-tested against this scan.  One row group with a
    chunk sized down as B grows keeps the streams inside VMEM; only an
    absurd >1536-row batch falls back to this scan (pallas_gen.py,
    BENCHMARKS.md).

    Two structural optimizations over a naive per-step port
    (reference loop: msa_tts/utils/wavernn/wavernn.py:123-166):

      * the conditioning part of the input projection ``I`` does not
        depend on the generated sample, so it is hoisted out of the scan
        as ONE (B·T, F) matmul (MXU-shaped) — inside the scan only the
        rank-1 sample column remains;
      * all in-scan matmuls run at the weights' dtype (bf16 via
        ``cast_generation_params``) with f32 accumulation.
    """
    d = cfg.aux_dims

    def step(params, w_x, carry, inputs):
        x, h1, h2 = carry
        i_static_t, a_t, n1_t, n2_t = inputs
        # z = I(concat(x, cond)) with the cond half precomputed
        z = i_static_t + x * w_x  # (B,1)·(rnn,) → (B, rnn)
        h1 = _gru_cell_mm(params["rnn1"], z, h1)
        z = z + h1
        inp2 = (
            jnp.concatenate([z, a_t[:, :d]], axis=1)
            if cfg.use_aux_net else z
        )
        h2 = _gru_cell_mm(params["rnn2"], inp2, h2)
        z = z + h2
        if cfg.use_aux_net:
            z = jnp.concatenate([z, a_t[:, d : 2 * d]], axis=1)
        z = jax.nn.relu(_mm(z, params["fc1"]["weight"])
                        + params["fc1"]["bias"])
        if cfg.use_aux_net:
            z = jnp.concatenate([z, a_t[:, 2 * d :]], axis=1)
        z = jax.nn.relu(_mm(z, params["fc2"]["weight"])
                        + params["fc2"]["bias"])
        logits = _mm(z, params["fc3"]["weight"]) + params["fc3"]["bias"]
        if cfg.mode == "MOL":
            sample = _sample_mol_noise(logits, n1_t, n2_t)
        elif cfg.mode == "GAUSS":
            mean = logits[:, 0]
            log_std = jnp.maximum(logits[:, 1], -7.0)
            sample = jnp.clip(mean + jnp.exp(log_std) * n1_t, -1.0, 1.0)
        else:
            raise ValueError(cfg.mode)
        return (sample[:, None], h1, h2), sample

    def run_with_noise(params, mels_up, aux, noise1, noise2):
        B, T, _ = mels_up.shape
        W_I = params["I"]["weight"]  # (rnn, 1 + F [+ d])
        w_x = W_I[:, 0].astype(jnp.float32)
        if cfg.use_aux_net:
            static_in = jnp.concatenate([mels_up, aux[:, :, :d]], axis=2)
            a_rest = aux[:, :, d:]
        else:
            static_in = mels_up
            a_rest = jnp.zeros((B, T, 0))
        # hoisted conditioning projection: one large batched matmul
        i_static = _mm(static_in, W_I[:, 1:]) + params["I"]["bias"]

        # The kernel wins at every measured batch (1.3-1.65×,
        # BENCHMARKS.md) with ONE row group and a chunk sized so the
        # double-buffered conditioning stream fits VMEM (~128 MB on
        # v5e, probed).  Row groups would serialize extra time loops —
        # only the absurd->1536-row case falls back to the scan rather
        # than pay that.
        if backend == "pallas" and B <= 1536:
            from .pallas_gen import (
                make_pallas_generate,
                split_generation_params,
            )

            w = split_generation_params(params, cfg)
            chunk = 8
            while chunk < 128 and chunk * 2 * B <= 12288:
                chunk *= 2
            Tp = -(-T // chunk) * chunk
            ist = jnp.swapaxes(i_static, 0, 1)
            ar = jnp.swapaxes(a_rest, 0, 1)
            n1, n2 = noise1, noise2
            if Tp != T:
                # trailing pad steps generate trimmed-away garbage; zero
                # noise keeps them finite
                pad = Tp - T

                def padt(x):
                    return jnp.pad(
                        x, ((0, pad),) + ((0, 0),) * (x.ndim - 1)
                    )

                ist, ar, n1, n2 = padt(ist), padt(ar), padt(n1), padt(n2)
            run_k = make_pallas_generate(cfg, B, Tp, chunk=chunk)
            return run_k(w, ist, ar, n1, n2)[:, :T]

        carry = (
            jnp.zeros((B, 1)),
            jnp.zeros((B, cfg.rnn_dims)),
            jnp.zeros((B, cfg.rnn_dims)),
        )
        _, samples = jax.lax.scan(
            lambda c, i: step(params, w_x, c, i),
            carry,
            (
                jnp.swapaxes(i_static, 0, 1),
                jnp.swapaxes(a_rest, 0, 1),
                noise1,
                noise2,
            ),
        )
        return jnp.swapaxes(samples, 0, 1)  # (B, T)

    if with_noise:
        return run_with_noise

    def run(params, mels_up, aux, rng):
        # sampling noise is independent of the autoregression, so the
        # PRNG work (≈40% of a step's time) is hoisted into two big
        # vectorized draws; inside the scan sampling is gather+arithmetic
        B, T, _ = mels_up.shape
        noise1, noise2 = _generation_noise(cfg, rng, T, B)
        return run_with_noise(params, mels_up, aux, noise1, noise2)

    return run


def _generation_noise(cfg: WaveRNNConfig, rng, T: int, B: int):
    """Per-step sampling noise, drawn in two vectorized calls.

    MOL: (gumbel (T,B,K) for mixture selection, logistic (T,B) for the
    sample); GAUSS: (standard normal (T,B), zeros)."""
    if cfg.mode == "MOL":
        K = cfg.n_classes // 3
        k1, k2 = jax.random.split(rng)
        u1 = jax.random.uniform(
            k1, (T, B, K), minval=1e-5, maxval=1.0 - 1e-5
        )
        u2 = jax.random.uniform(
            k2, (T, B), minval=1e-5, maxval=1.0 - 1e-5
        )
        gumbel = -jnp.log(-jnp.log(u1))
        logistic = jnp.log(u2) - jnp.log1p(-u2)
        return gumbel, logistic
    if cfg.mode == "GAUSS":
        eps = jax.random.normal(rng, (T, B))
        return eps, jnp.zeros((T, B))
    raise ValueError(cfg.mode)


def _sample_mol_noise(logits, gumbel, logistic,
                      log_scale_min=LOG_SCALE_MIN):
    """MoL sample from pre-drawn noise: logits (B, 3K), gumbel (B, K),
    logistic (B,) → samples (B,) in [−1, 1]."""
    K = logits.shape[-1] // 3
    sel = jnp.argmax(logits[:, :K] + gumbel, axis=-1)
    onehot = jax.nn.one_hot(sel, K)
    mean = jnp.sum(logits[:, K : 2 * K] * onehot, axis=-1)
    log_scale = jnp.maximum(
        jnp.sum(logits[:, 2 * K :] * onehot, axis=-1), log_scale_min
    )
    return jnp.clip(mean + jnp.exp(log_scale) * logistic, -1.0, 1.0)


def _fresh_generation_key():
    """Entropy-seeded PRNG key for callers that pass no rng.  A
    wall-clock-second seed would hand identical sampling noise to every
    same-second call (easy under serving load) and only ever visit a
    few thousand distinct seeds."""
    import os

    return jax.random.PRNGKey(int.from_bytes(os.urandom(4), "little"))


class WaveRNN:
    """Reference-API vocoder wrapper with jitted batched generation."""

    def __init__(self, params=None, state=None, cfg: WaveRNNConfig = None,
                 rng=None, gen_dtype: str | None = "bfloat16",
                 gen_backend: str = "auto", **ref_params):
        if cfg is None:
            cfg = config_from_params(**ref_params)
            gen_dtype = ref_params.get("gen_dtype", gen_dtype)
            gen_backend = ref_params.get("gen_backend", gen_backend)
        self.cfg = cfg
        if params is None:
            params, state = init_wavernn(
                rng if rng is not None else jax.random.PRNGKey(0), cfg
            )
        self.params = params
        self.state = state
        # low-precision twin of the sample-loop weights (see
        # cast_generation_params); full-precision self.params is what
        # training/export continue to see
        self._gen_params = cast_generation_params(
            params, jnp.dtype(gen_dtype) if gen_dtype else None
        )
        # auto: the whole-loop Pallas kernel (pallas_gen.py) on real TPU
        # hardware, the lax.scan everywhere else (CPU/GPU/interpret)
        from ..utils.backend import resolve_kernel_backend

        self.gen_backend = resolve_kernel_backend(gen_backend)
        self._run = jax.jit(
            _make_generate_scan(cfg, backend=self.gen_backend)
        )
        self._upsample = jax.jit(
            lambda p, s, m: upsample_apply(p, s, cfg, m, train=False)
        )
        # jitted upsample→fold→scan pipelines keyed by (target, overlap);
        # jax.jit caches per input shape underneath
        self._pipelines: dict = {}

    def _folded_pipeline(self, target: int, overlap: int):
        """Whole batched-generation pipeline as ONE device program.

        Folding on the host (reference wavernn.py:211-252 does, and so
        did round 1) downloads the upsampled conditioning (~120 MB for
        6 s of audio) and re-uploads it folded — on the axon relay that
        host↔device round trip costs ~15× the sample scan itself.  Here
        the fold is a device-side gather; the host only uploads the raw
        mel (~0.2 MB) and downloads the samples (~0.5 MB)."""
        key = (target, overlap)
        if key in self._pipelines:
            return self._pipelines[key]
        cfg = self.cfg
        scan_run = _make_generate_scan(cfg, backend=self.gen_backend)

        def fold(x):  # (1, T, F) → (n_pad_folds, target+2·overlap, F)
            folded, num_folds = _fold_device(x[0], target, overlap)
            return folded, num_folds

        def pipeline(up_params, up_state, gen_params, mels, rng):
            mels_up, aux = upsample_apply(
                up_params, up_state, cfg, mels, train=False
            )
            folded, num_folds = fold(mels_up)
            aux_folded = fold(aux)[0] if aux is not None else None
            samples = scan_run(gen_params, folded, aux_folded, rng)
            return samples, num_folds

        fn = jax.jit(pipeline)
        self._pipelines[key] = fn
        return fn

    def _batch_pipeline(self, target: int, overlap: int):
        """Multi-utterance generation as ONE device program: all
        utterances' folds are concatenated into a single sample scan, so
        the per-step weight traffic (the HBM-bandwidth floor) is
        amortized over every fold of every utterance.  Noise is drawn
        per utterance from per-utterance keys, so a batch row is
        bit-equivalent to a single-utterance run with that key."""
        key = ("batch", target, overlap)
        if key in self._pipelines:
            return self._pipelines[key]
        cfg = self.cfg
        scan_noise = _make_generate_scan(
            cfg, with_noise=True, backend=self.gen_backend
        )

        def pipeline(up_params, up_state, gen_params, mels, rngs):
            # mels: (B, n_mels, T) already cfg.pad-extended; rngs: (B, 2)
            mels_up, aux = upsample_apply(
                up_params, up_state, cfg, mels, train=False
            )
            num_folds, _ = _fold_counts(
                mels_up.shape[1], target, overlap
            )
            folded = jax.vmap(
                lambda m: _fold_device(m, target, overlap)[0]
            )(mels_up)                      # (B, n_pad, L, F)
            B, n_pad, L, F = folded.shape
            if aux is not None:
                # aux and mels_up have identical time lengths in BOTH
                # upsampler modes (melresnet's valid conv already trims
                # the 2·pad frames before interpolation), so the folds
                # bucket identically
                aux_folded = jax.vmap(
                    lambda a: _fold_device(a, target, overlap)[0]
                )(aux)
                aux_flat = aux_folded.reshape(B * n_pad, L, -1)
            else:
                aux_flat = None
            n1, n2 = jax.vmap(
                lambda k: _generation_noise(cfg, k, L, n_pad)
            )(rngs)                          # (B, L, n_pad, ...)
            # (B, L, n_pad, ...) → (L, B·n_pad, ...): time-major with the
            # batch axis matching the fold concatenation order
            n1 = jnp.moveaxis(n1, 0, 1).reshape((L, B * n_pad) + n1.shape[3:])
            n2 = jnp.moveaxis(n2, 0, 1).reshape((L, B * n_pad) + n2.shape[3:])
            samples = scan_noise(
                gen_params, folded.reshape(B * n_pad, L, F), aux_flat,
                n1, n2,
            )
            return samples.reshape(B, n_pad, L), num_folds

        fn = jax.jit(pipeline)
        self._pipelines[key] = fn
        return fn

    def generate_batch(self, mels_list, target: int = 2_750,
                       overlap: int = 550, rng=None, rngs=None,
                       bucket_frames: int = 32, verbose: bool = True):
        """Vocode several utterances in ONE sample scan.

        ``mels_list``: list of (n_mels, T_i) log-mels (lengths may
        differ; they are zero-padded to a common bucketed length —
        padding only conditions samples past each utterance's true
        length, which are discarded).  ``rngs`` optionally pins one PRNG
        key per utterance (default: split of ``rng``).  Returns a list
        of float64 waveforms of length ``(T_i − 1)·hop``.

        This is the serving-throughput path the reference cannot
        express (its fold batching is per-utterance only,
        msa_tts/utils/wavernn/wavernn.py:211-252): beyond ~8 folds a
        single utterance stops scaling because the scan is weight-
        bandwidth-bound per STEP, not per ROW — rows are nearly free on
        the MXU, so stacking utterances multiplies throughput.
        """
        cfg = self.cfg
        B = len(mels_list)
        if rngs is None:
            if rng is None:
                rng = _fresh_generation_key()
            rngs = list(jax.random.split(rng, B))
        rngs = jnp.stack([jnp.asarray(k) for k in rngs])
        t_lens = [np.asarray(m).shape[-1] for m in mels_list]
        T = -(-max(t_lens) // bucket_frames) * bucket_frames
        mels = np.empty((B, cfg.n_mels, T), np.float32)
        for i, m in enumerate(mels_list):
            m = np.asarray(m)
            # pad with each mel's own silence floor: 0.0 is FULL-scale
            # energy in the log-mel domain and would bleed loud garbage
            # into the end of shorter utterances through the upsampler's
            # conv receptive fields
            mels[i] = np.pad(
                m, ((0, 0), (0, T - t_lens[i])),
                constant_values=float(m.min()),
            )
        mels = jnp.pad(
            jnp.asarray(mels), ((0, 0), (0, 0), (cfg.pad, cfg.pad))
        )
        t0 = time.time()
        samples, n_folds = self._batch_pipeline(target, overlap)(
            self.params["upsample"], self.state["upsample"],
            self._gen_params, mels, rngs,
        )
        samples = np.asarray(samples).astype(np.float64)
        outs = []
        for i in range(B):
            # ≥ 1 hop of output even for a degenerate 1-frame mel (an
            # untrained gate firing at step 1), so downstream wav writes
            # never see a zero-length signal
            wave_len = max(t_lens[i] - 1, 1) * cfg.hop_length
            out = xfade_and_unfold(
                samples[i, : int(n_folds)], target, overlap
            )
            outs.append(out[:wave_len])
        if verbose:
            n = sum(len(o) for o in outs)
            rate_khz = n / max(time.time() - t0, 1e-9) / 1000.0
            print(
                f"WaveRNN batch x{B}: {n} samples, gen_rate: "
                f"{rate_khz:.1f} kHz -- x_realtime: "
                f"{rate_khz * 1000 / cfg.sample_rate:.2f}"
            )
        return outs

    def generate(self, mels, batched: bool = True, target: int = 11_000,
                 overlap: int = 550, rng=None, verbose: bool = True):
        """mels: (1, n_mels, T_mel) log-mel → waveform np.float64.

        Matches the reference's output contract (wavernn.py:95-180):
        length ``(T_mel − 1)·hop``, batched fold/xfade when ``batched``.
        """
        cfg = self.cfg
        if rng is None:
            rng = _fresh_generation_key()
        mels = jnp.asarray(mels)
        if mels.ndim == 2:
            mels = mels[None]
        wave_len = (mels.shape[-1] - 1) * cfg.hop_length
        # pad mels on both sides (reference pad_tensor 'both')
        mels = jnp.pad(mels, ((0, 0), (0, 0), (cfg.pad, cfg.pad)))
        t0 = time.time()
        if batched:
            samples, n_folds = self._folded_pipeline(target, overlap)(
                self.params["upsample"], self.state["upsample"],
                self._gen_params, mels, rng,
            )
            samples = np.asarray(samples).astype(np.float64)[:int(n_folds)]
        else:
            mels_up, aux = self._upsample(
                self.params["upsample"], self.state["upsample"], mels
            )
            samples = np.asarray(
                self._run(self._gen_params, mels_up, aux, rng)
            ).astype(np.float64)
        if verbose:
            n = samples.size
            rate_khz = n / max(time.time() - t0, 1e-9) / 1000.0
            print(
                f"WaveRNN: {n} samples, gen_rate: {rate_khz:.1f} kHz "
                f"-- x_realtime: {rate_khz * 1000 / cfg.sample_rate:.2f}"
            )
        if batched:
            output = xfade_and_unfold(samples, target, overlap)
        else:
            output = samples[0]
        return output[:wave_len]


# --------------------------------------------------------------------------
# Torch checkpoint import
# --------------------------------------------------------------------------

def wavernn_params_from_state_dict(sd: dict, cfg: WaveRNNConfig):
    """Map a reference WaveRNN ``state_dict`` into our pytrees."""
    g = lambda k: jnp.asarray(np.asarray(sd[k], dtype=np.float32))

    def lin(k):
        return {"weight": g(k + ".weight"), "bias": g(k + ".bias")}

    def gru(k):
        return {
            "weight_ih": g(k + ".weight_ih_l0"),
            "weight_hh": g(k + ".weight_hh_l0"),
            "bias_ih": g(k + ".bias_ih_l0"),
            "bias_hh": g(k + ".bias_hh_l0"),
        }

    def bn(k):
        return (
            {"weight": g(k + ".weight"), "bias": g(k + ".bias")},
            {
                "running_mean": g(k + ".running_mean"),
                "running_var": g(k + ".running_var"),
            },
        )

    rn = "upsample.resnet"
    bn_p, bn_s = bn(f"{rn}.batch_norm")
    layers, layer_states = [], []
    i = 0
    while f"{rn}.layers.{i}.conv1.weight" in sd:
        b1p, b1s = bn(f"{rn}.layers.{i}.batch_norm1")
        b2p, b2s = bn(f"{rn}.layers.{i}.batch_norm2")
        layers.append(
            {
                "conv1": {"weight": g(f"{rn}.layers.{i}.conv1.weight")},
                "conv2": {"weight": g(f"{rn}.layers.{i}.conv2.weight")},
                "batch_norm1": b1p,
                "batch_norm2": b2p,
            }
        )
        layer_states.append({"batch_norm1": b1s, "batch_norm2": b2s})
        i += 1
    resnet_p = {
        "conv_in": {"weight": g(f"{rn}.conv_in.weight")},
        "batch_norm": bn_p,
        "layers": layers,
        "conv_out": lin_conv(sd, f"{rn}.conv_out"),
    }
    resnet_s = {"batch_norm": bn_s, "layers": layer_states}

    up_convs = []
    i = 0
    # torch module list interleaves [stretch, conv]; convs at odd indices
    while f"upsample.up_layers.{i}.weight" in sd or i < 2 * len(
        cfg.upsample_factors
    ):
        key = f"upsample.up_layers.{i}.weight"
        if key in sd:
            w = np.asarray(sd[key], np.float32)  # (1, 1, 1, k)
            up_convs.append({"weight": jnp.asarray(w[:, :, 0, :])})
        i += 1
        if i > 2 * len(cfg.upsample_factors):
            break

    params = {
        "upsample": {"resnet": resnet_p, "up_convs": up_convs},
        "I": lin("I"),
        "rnn1": gru("rnn1"),
        "rnn2": gru("rnn2"),
        "fc1": lin("fc1"),
        "fc2": lin("fc2"),
        "fc3": lin("fc3"),
    }
    state = {"upsample": {"resnet": resnet_s}}
    return params, state


def lin_conv(sd, k):
    import jax.numpy as jnp

    p = {"weight": jnp.asarray(np.asarray(sd[k + ".weight"], np.float32))}
    if k + ".bias" in sd:
        p["bias"] = jnp.asarray(np.asarray(sd[k + ".bias"], np.float32))
    return p


def get_wavernn(device=None, **params):
    """Reference-API loader (msa_tts/utils/helpers.py:7-17): build a
    WaveRNN from params and load its torch checkpoint."""
    import torch

    cfg = config_from_params(**params)
    sd = torch.load(
        params["checkpoint_path"], map_location="cpu", weights_only=True
    )
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    p, s = wavernn_params_from_state_dict(sd, cfg)
    print("Loaded WaveRNN checkpoint.\n")
    return WaveRNN(
        params=p, state=s, cfg=cfg,
        gen_dtype=params.get("gen_dtype", "bfloat16"),
        # honor a configured backend like gen_dtype above — dropping it
        # would silently auto-detect past an operator's explicit choice
        gen_backend=params.get("gen_backend", "auto"),
    )
