"""HiFi-GAN discriminator shape/behavior tests."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from msa_tts_tpu.vocoders.hifigan_discriminators import (
    discriminator_loss,
    feature_loss,
    generator_loss,
    init_mpd,
    init_msd,
    mpd_apply,
    msd_apply,
)


def test_mpd_shapes_and_losses(rng):
    params = init_mpd(rng)
    y = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 1, 400)),
        dtype=jnp.float32,
    )
    y_hat = y + 0.1
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = mpd_apply(params, y, y_hat)
    assert len(y_d_rs) == 5
    assert all(s.ndim == 2 and s.shape[0] == 2 for s in y_d_rs)
    d_loss, r_losses, g_losses = discriminator_loss(y_d_rs, y_d_gs)
    g_loss, _ = generator_loss(y_d_gs)
    f_loss = feature_loss(fmap_rs, fmap_gs)
    for v in (d_loss, g_loss, f_loss):
        assert np.isfinite(float(v))
    # identical inputs → zero feature loss
    _, _, fr, fg = mpd_apply(params, y, y)
    assert float(feature_loss(fr, fg)) == 0.0


@pytest.mark.slow
def test_msd_shapes(rng):
    params = init_msd(rng)
    y = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 1, 512)),
        dtype=jnp.float32,
    )
    y_d_rs, y_d_gs, fmap_rs, fmap_gs = msd_apply(params, y, y * 0.5)
    assert len(y_d_rs) == 3
    assert all(len(f) == 8 for f in fmap_rs)  # 7 convs + post
    d_loss, _, _ = discriminator_loss(y_d_rs, y_d_gs)
    assert np.isfinite(float(d_loss))


def test_disc_losses_discriminate(rng):
    """A trained-free sanity check: LSGAN losses move in the right
    direction — perfect real (1) / fake (0) scores give zero loss."""
    ones = [jnp.ones((2, 8))]
    zeros = [jnp.zeros((2, 8))]
    d_loss, _, _ = discriminator_loss(ones, zeros)
    assert float(d_loss) == 0.0
    g_loss, _ = generator_loss(ones)
    assert float(g_loss) == 0.0
