"""Multi-utterance batched WaveRNN generation (serving-throughput path).

The batch pipeline concatenates every utterance's crossfade folds into
ONE sample scan (amortizing the per-step weight traffic) while drawing
sampling noise from per-utterance keys — so a batch row must be
bit-equivalent to the single-utterance fold path with the same key."""

import jax
import numpy as np
import pytest

from msa_tts_tpu.vocoders.wavernn import WaveRNN, WaveRNNConfig

CFG = WaveRNNConfig(
    mode="MOL", n_mels=16, rnn_dims=24, fc_dims=24, compute_dims=16,
    res_out_dims=16, res_blocks=2, hop_length=64, sample_rate=16000,
    pad=2, upsample_factors=(4, 4, 4),
)


@pytest.fixture(scope="module")
def voc():
    return WaveRNN(cfg=CFG, rng=jax.random.PRNGKey(0), gen_dtype=None)


def _mel(t, seed):
    return (
        np.random.default_rng(seed)
        .standard_normal((CFG.n_mels, t))
        .astype(np.float32)
        * 0.1
    )


def test_same_key_rows_identical(voc):
    m = _mel(40, 0)
    k = jax.random.PRNGKey(3)
    outs = voc.generate_batch(
        [m, m], target=400, overlap=100, rngs=[k, k], verbose=False
    )
    np.testing.assert_array_equal(outs[0], outs[1])


def test_batch_of_one_equals_single_generate(voc):
    """With T already at the bucket boundary, batch-of-one must
    reproduce the single-utterance fold path exactly (same fold layout,
    same per-utterance noise key)."""
    m = _mel(40, 1)
    k = jax.random.PRNGKey(5)
    batch = voc.generate_batch(
        [m], target=400, overlap=100, rngs=[k], bucket_frames=8,
        verbose=False,
    )[0]
    single = voc.generate(
        m[None], batched=True, target=400, overlap=100, rng=k,
        verbose=False,
    )
    np.testing.assert_allclose(batch, single, atol=1e-5)


def test_mixed_lengths(voc):
    m1, m2, m3 = _mel(40, 2), _mel(28, 3), _mel(33, 4)
    outs = voc.generate_batch(
        [m1, m2, m3], target=400, overlap=100,
        rng=jax.random.PRNGKey(0), verbose=False,
    )
    for m, o in zip((m1, m2, m3), outs):
        assert o.shape == ((m.shape[1] - 1) * CFG.hop_length,)
        assert np.isfinite(o).all()
        assert np.abs(o).max() <= 1.0  # samples clipped to [-1, 1]


def test_gauss_mode_batch():
    cfg = CFG._replace(mode="GAUSS")
    voc = WaveRNN(cfg=cfg, rng=jax.random.PRNGKey(1), gen_dtype=None)
    outs = voc.generate_batch(
        [_mel(40, 5), _mel(28, 6)], target=400, overlap=100,
        rng=jax.random.PRNGKey(7), verbose=False,
    )
    assert all(np.isfinite(o).all() for o in outs)


def test_bf16_weights_batch(voc):
    voc16 = WaveRNN(
        cfg=CFG, params=voc.params, state=voc.state, gen_dtype="bfloat16"
    )
    outs = voc16.generate_batch(
        [_mel(40, 8)], target=400, overlap=100,
        rng=jax.random.PRNGKey(2), verbose=False,
    )
    assert np.isfinite(outs[0]).all()


def test_mixed_length_padding_uses_silence_floor(voc):
    """A short utterance in a mixed-length batch is padded to the common
    frame count with its own log-mel floor, not 0.0 (= full-scale energy
    that would bleed a loud burst into its tail through the upsampler's
    receptive field).  Pin it by equivalence: the batch row must match
    generating the explicitly floor-padded mel at the common length."""
    m_long, m_short = _mel(40, 8), _mel(25, 9)
    k = jax.random.PRNGKey(11)
    mixed = voc.generate_batch(
        [m_long, m_short], target=400, overlap=100,
        rngs=[jax.random.PRNGKey(12), k], bucket_frames=8,
        verbose=False,
    )[1]

    T = 40  # already a bucket multiple
    explicit = np.pad(
        m_short, ((0, 0), (0, T - m_short.shape[1])),
        constant_values=float(m_short.min()),
    )
    ref = voc.generate_batch(
        [explicit], target=400, overlap=100, rngs=[k], bucket_frames=8,
        verbose=False,
    )[0]
    assert mixed.shape == ((m_short.shape[1] - 1) * CFG.hop_length,)
    np.testing.assert_allclose(ref[: len(mixed)], mixed, atol=1e-5)
