"""HiFi-GAN discriminators and GAN losses (training-side completeness).

Reference: msa_tts/utils/hifigan/models.py:128-283 — Multi-Period
(periods 2/3/5/7/11, strided 2-D convs over period-folded audio) and
Multi-Scale (grouped 1-D convs at 3 time scales) discriminators, plus
the LSGAN discriminator/generator losses and feature-matching loss.
The reference ships these but only uses the generator at inference; they
are provided here so HiFi-GAN can also be *trained* in this framework.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import lax

from ..ops import nn as N

LRELU_SLOPE = 0.1

MPD_PERIODS = (2, 3, 5, 7, 11)
MPD_CHANNELS = (32, 128, 512, 1024, 1024)
MSD_SPECS = [
    # (in, out, kernel, stride, groups)
    (1, 128, 15, 1, 1),
    (128, 128, 41, 2, 4),
    (128, 256, 41, 2, 16),
    (256, 512, 41, 4, 16),
    (512, 1024, 41, 4, 16),
    (1024, 1024, 41, 1, 16),
    (1024, 1024, 5, 1, 1),
]


def _conv_init(rng, in_ch, out_ch, kshape):
    k = math.prod(kshape)
    a = 1.0 / math.sqrt(in_ch * k)
    kw, kb = jax.random.split(rng)
    return {
        "weight": jax.random.uniform(
            kw, (out_ch, in_ch) + tuple(kshape), jnp.float32, -a, a
        ),
        "bias": jax.random.uniform(kb, (out_ch,), jnp.float32, -a, a),
    }


def conv2d(params, x, *, stride=(1, 1), padding=((0, 0), (0, 0))):
    y = lax.conv_general_dilated(
        x, params["weight"], window_strides=stride, padding=padding,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + params["bias"][None, :, None, None]


# ------------------------------------------------------------- period disc

def init_discriminator_p(rng, kernel_size: int = 5, stride: int = 3):
    ks = jax.random.split(rng, 6)
    chans = (1,) + MPD_CHANNELS
    convs = [
        _conv_init(ks[i], chans[i], chans[i + 1], (kernel_size, 1))
        for i in range(5)
    ]
    return {
        "convs": convs,
        "conv_post": _conv_init(ks[5], MPD_CHANNELS[-1], 1, (3, 1)),
    }


def discriminator_p_apply(params, x, period: int, *, kernel_size=5,
                          stride=3):
    """x: (B, 1, T) → (score (B, n), feature maps)."""
    B, C, T = x.shape
    if T % period != 0:
        n_pad = period - (T % period)
        x = jnp.pad(x, ((0, 0), (0, 0), (0, n_pad)), mode="reflect")
        T = T + n_pad
    x = x.reshape(B, C, T // period, period)
    fmap = []
    pad = (kernel_size - 1) // 2
    for i, conv in enumerate(params["convs"]):
        s = stride if i < 4 else 1
        p = pad if i < 4 else 2
        x = conv2d(conv, x, stride=(s, 1), padding=((p, p), (0, 0)))
        x = jax.nn.leaky_relu(x, LRELU_SLOPE)
        fmap.append(x)
    x = conv2d(params["conv_post"], x, padding=((1, 1), (0, 0)))
    fmap.append(x)
    return x.reshape(B, -1), fmap


def init_mpd(rng):
    ks = jax.random.split(rng, len(MPD_PERIODS))
    return {"discriminators": [init_discriminator_p(k) for k in ks]}


def mpd_apply(params, y, y_hat):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for d, period in zip(params["discriminators"], MPD_PERIODS):
        s_r, f_r = discriminator_p_apply(d, y, period)
        s_g, f_g = discriminator_p_apply(d, y_hat, period)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# -------------------------------------------------------------- scale disc

def init_discriminator_s(rng):
    ks = jax.random.split(rng, len(MSD_SPECS) + 1)
    convs = []
    for i, (ic, oc, k, s, g) in enumerate(MSD_SPECS):
        convs.append(_conv_init(ks[i], ic // g, oc, (k,)))
    return {
        "convs": convs,
        "conv_post": _conv_init(ks[-1], 1024, 1, (3,)),
    }


def discriminator_s_apply(params, x):
    fmap = []
    for conv, (ic, oc, k, s, g) in zip(params["convs"], MSD_SPECS):
        pad = k // 2
        y = lax.conv_general_dilated(
            x, conv["weight"], window_strides=(s,),
            padding=[(pad, pad)], dimension_numbers=("NCH", "OIH", "NCH"),
            feature_group_count=g,
        ) + conv["bias"][None, :, None]
        x = jax.nn.leaky_relu(y, LRELU_SLOPE)
        fmap.append(x)
    x = N.conv1d(params["conv_post"], x, padding=1)
    fmap.append(x)
    return x.reshape(x.shape[0], -1), fmap


def _avg_pool1d(x, kernel=4, stride=2, padding=2):
    return lax.reduce_window(
        x, 0.0, lax.add, (1, 1, kernel), (1, 1, stride),
        [(0, 0), (0, 0), (padding, padding)],
    ) / kernel


def init_msd(rng):
    ks = jax.random.split(rng, 3)
    return {"discriminators": [init_discriminator_s(k) for k in ks]}


def msd_apply(params, y, y_hat):
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = [], [], [], []
    for i, d in enumerate(params["discriminators"]):
        if i != 0:
            y = _avg_pool1d(y)
            y_hat = _avg_pool1d(y_hat)
        s_r, f_r = discriminator_s_apply(d, y)
        s_g, f_g = discriminator_s_apply(d, y_hat)
        y_d_rs.append(s_r)
        y_d_gs.append(s_g)
        fmap_rs.append(f_r)
        fmap_gs.append(f_g)
    return y_d_rs, y_d_gs, fmap_rs, fmap_gs


# ------------------------------------------------------------------ losses

def feature_loss(fmap_r, fmap_g):
    loss = 0.0
    for dr, dg in zip(fmap_r, fmap_g):
        for rl, gl in zip(dr, dg):
            loss = loss + jnp.mean(jnp.abs(rl - gl))
    return loss * 2.0


def discriminator_loss(disc_real_outputs, disc_generated_outputs):
    loss = 0.0
    r_losses, g_losses = [], []
    for dr, dg in zip(disc_real_outputs, disc_generated_outputs):
        r = jnp.mean((1.0 - dr) ** 2)
        g = jnp.mean(dg**2)
        loss = loss + r + g
        r_losses.append(r)
        g_losses.append(g)
    return loss, r_losses, g_losses


def generator_loss(disc_outputs):
    loss = 0.0
    gen_losses = []
    for dg in disc_outputs:
        l = jnp.mean((1.0 - dg) ** 2)
        gen_losses.append(l)
        loss = loss + l
    return loss, gen_losses
