"""Shape, determinism, and behavioral tests for the Tacotron2NV model."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from msa_tts_tpu.models import (
    ModelConfig,
    init_tacotron2nv,
    tacotron2nv_forward,
    tacotron2nv_infer,
)

TINY_ATTN = {
    "attention_type": "ForwardAttention",
    "attention_dim": 16,
    "attention_location_n_filters": 4,
    "attention_location_kernel_size": 7,
    "windowing": False,
    "norm": "softmax",
    "forward_attn": True,
    "trans_agent": True,
    "forward_attn_mask": False,
    "location_attention": True,
}


def tiny_config(**over):
    base = dict(
        n_symbols=40,
        symbols_embedding_dim=16,
        encoder_n_convolutions=2,
        encoder_embedding_dim=16,
        encoder_kernel_size=5,
        n_mel_channels=8,
        n_frames_per_step=1,
        speaker_emb_type="static",
        num_speakers=3,
        speaker_embedding_dim=6,
        speaker_embedding_dim_lin=4,
        attention_rnn_dim=20,
        decoder_rnn_dim=20,
        prenet_dim=12,
        max_decoder_steps=30,
        gate_threshold=0.5,
        p_attention_dropout=0.1,
        p_decoder_dropout=0.1,
        early_stopping=True,
        postnet_embedding_dim=16,
        postnet_kernel_size=5,
        postnet_n_convolutions=3,
        attention_params=dict(TINY_ATTN),
        mask_padding=True,
    )
    base.update(over)
    return ModelConfig(**base)


def make_batch(cfg, B=2, T_in=11, T_mel=16, seed=0):
    rng = np.random.default_rng(seed)
    inputs = rng.integers(1, cfg.n_symbols, (B, T_in))
    input_lengths = np.sort(
        rng.integers(T_in // 2, T_in + 1, B)
    )[::-1].copy()
    input_lengths[0] = T_in
    mels = rng.standard_normal((B, cfg.n_mel_channels, T_mel)).astype(
        np.float32
    )
    mel_lengths = np.sort(rng.integers(T_mel // 2, T_mel + 1, B))[::-1].copy()
    mel_lengths[0] = T_mel
    spk = rng.standard_normal((B, cfg.speaker_embedding_dim)).astype(
        np.float32
    )
    return (
        jnp.asarray(inputs),
        jnp.asarray(input_lengths),
        jnp.asarray(mels),
        jnp.asarray(mel_lengths),
        jnp.asarray(spk),
    )


@pytest.fixture(scope="module")
def model():
    cfg = tiny_config()
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    return cfg, params, state


def test_forward_shapes(model):
    cfg, params, state = model
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)
    outs, new_state = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk,
        jax.random.PRNGKey(1),
    )
    mel_out, mel_post, gate, align = outs
    B, D, T = mels.shape
    assert mel_out.shape == (B, D, T)
    assert mel_post.shape == (B, D, T)
    assert gate.shape == (B, T)
    assert align.shape == (B, T // cfg.n_frames_per_step, inputs.shape[1])
    # batch-norm state updated
    assert not np.allclose(
        np.asarray(new_state["encoder"]["convolutions"][0]["running_mean"]),
        0.0,
    )


def test_forward_masking(model):
    """Padded frames must be zero in mels and 1e3 in gate energies."""
    cfg, params, state = model
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)
    outs, _ = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk,
        jax.random.PRNGKey(1),
    )
    mel_out, mel_post, gate, _ = outs
    for b in range(mels.shape[0]):
        L = int(mel_len[b])
        assert np.allclose(np.asarray(mel_out)[b, :, L:], 0.0)
        assert np.allclose(np.asarray(mel_post)[b, :, L:], 0.0)
        assert np.allclose(np.asarray(gate)[b, L:], 1e3)


def test_forward_jit_and_grad(model):
    """Forward must be jittable and produce finite grads through the scan."""
    cfg, params, state = model
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)

    from msa_tts_tpu.models.loss import tacotron2_loss

    def loss_fn(p):
        outs, _ = tacotron2nv_forward(
            p, state, cfg, inputs, in_len, mels, mel_len, spk,
            jax.random.PRNGKey(1),
        )
        mel_out, mel_post, gate, _ = outs
        stop_labels = (
            jnp.arange(mels.shape[2])[None, :] >= (mel_len - 1)[:, None]
        ).astype(jnp.float32)
        return tacotron2_loss(
            (mel_out, mel_post, gate, None),
            (mels, stop_labels),
            mel_len,
            reduction="none",
            pos_weight=1.0,
        )

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    # some gradient must reach the embedding and the attention v-layer
    assert float(jnp.abs(grads["embedding"]["weight"]).sum()) > 0
    assert (
        float(
            jnp.abs(
                grads["decoder"]["attention_layer"]["v"]["weight"]
            ).sum()
        )
        > 0
    )


def test_alignment_rows_sum_to_one(model):
    cfg, params, state = model
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)
    outs, _ = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk,
        jax.random.PRNGKey(1),
    )
    align = np.asarray(outs[3])
    np.testing.assert_allclose(align.sum(-1), 1.0, atol=1e-4)


def test_infer_shapes_and_early_stop(model):
    cfg, params, state = model
    inputs, in_len, _, _, spk = make_batch(cfg)
    mel_post, mel_lengths, align = tacotron2nv_infer(
        params, state, cfg, inputs, in_len, spk, jax.random.PRNGKey(2)
    )
    B = inputs.shape[0]
    assert mel_post.shape == (
        B, cfg.n_mel_channels, cfg.max_decoder_steps * cfg.n_frames_per_step
    )
    assert mel_lengths.shape == (B,)
    assert align.shape == (B, cfg.max_decoder_steps, inputs.shape[1])
    assert (np.asarray(mel_lengths) <= cfg.max_decoder_steps).all()


def test_speaker_conditioning_changes_output(model):
    cfg, params, state = model
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)
    outs1, _ = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk,
        jax.random.PRNGKey(1),
    )
    outs2, _ = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk + 1.0,
        jax.random.PRNGKey(1),
    )
    assert not np.allclose(np.asarray(outs1[0]), np.asarray(outs2[0]))


def test_speaker_emb_modes():
    for mode in ["learnable_lookup", "static+linear"]:
        cfg = tiny_config(speaker_emb_type=mode)
        params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
        inputs, in_len, mels, mel_len, spk = make_batch(cfg)
        if mode == "learnable_lookup":
            spk_in = jnp.asarray([0, 2])
        else:
            spk_in = spk
        outs, _ = tacotron2nv_forward(
            params, state, cfg, inputs, in_len, mels, mel_len, spk_in,
            jax.random.PRNGKey(1),
        )
        assert outs[0].shape == mels.shape


@pytest.mark.slow
def test_freeze_blocks_gradients():
    cfg = tiny_config(freeze_encoder=True, freeze_charemb=True)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    inputs, in_len, mels, mel_len, spk = make_batch(cfg)

    def loss_fn(p):
        outs, _ = tacotron2nv_forward(
            p, state, cfg, inputs, in_len, mels, mel_len, spk,
            jax.random.PRNGKey(1),
        )
        return jnp.sum(outs[1] ** 2)

    grads = jax.grad(loss_fn)(params)
    assert float(jnp.abs(grads["embedding"]["weight"]).sum()) == 0.0
    enc_leaves = jax.tree_util.tree_leaves(grads["encoder"])
    assert all(float(jnp.abs(l).sum()) == 0.0 for l in enc_leaves)


def test_reduction_factor_2():
    cfg = tiny_config(n_frames_per_step=2)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    inputs, in_len, mels, mel_len, spk = make_batch(cfg, T_mel=16)
    outs, _ = tacotron2nv_forward(
        params, state, cfg, inputs, in_len, mels, mel_len, spk,
        jax.random.PRNGKey(1),
    )
    mel_out, _, gate, align = outs
    assert mel_out.shape == mels.shape
    assert gate.shape == (2, 16)
    assert align.shape == (2, 8, inputs.shape[1])


@pytest.mark.slow
@pytest.mark.parametrize("remat_mode", [True, "dots"])
def test_scan_remat_gradient_parity(remat_mode):
    """scan_remat changes WHERE activations come from on the backward
    pass (recompute vs storage), never the math: loss and gradients
    must match the no-remat forward to float tolerance.  This guards
    the memory lever used for large meta-batches (bench.py --remat /
    --remat-dots; "dots" keeps matmul outputs and recomputes only the
    elementwise ops — jax.checkpoint_policies.dots_saveable)."""
    cfg = tiny_config()
    cfg_r = tiny_config(scan_remat=remat_mode)
    params, state = init_tacotron2nv(jax.random.PRNGKey(0), cfg)
    batch = make_batch(cfg)
    rng = jax.random.PRNGKey(7)

    def loss_of(c):
        def f(p):
            outs, _ = tacotron2nv_forward(
                p, state, c, *batch, rng, train=True
            )
            return sum(jnp.sum(o.astype(jnp.float32) ** 2) for o in outs)
        return f

    l0, g0 = jax.value_and_grad(loss_of(cfg))(params)
    l1, g1 = jax.value_and_grad(loss_of(cfg_r))(params)
    np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
    flat0 = jax.tree_util.tree_leaves(g0)
    flat1 = jax.tree_util.tree_leaves(g1)
    for a, b in zip(flat0, flat1):
        # recompute reorders float reductions; measured reassociation
        # noise is ≤2e-4 absolute on O(10..50) gradients of this loss
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-2
        )
