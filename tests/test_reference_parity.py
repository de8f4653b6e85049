"""End-to-end output-parity tests against the reference PyTorch model.

These tests import the reference implementation from /root/reference
(read-only) when present, copy its random-initialized weights into our
param pytrees via the torch importer, and require near-bit-identical
outputs.  Skipped automatically when the reference or torch is absent, so
the suite stays hermetic.
"""

import os
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REFERENCE_ROOT = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(REFERENCE_ROOT, "msa_tts")),
    reason="reference repo not mounted",
)

if os.path.isdir(os.path.join(REFERENCE_ROOT, "msa_tts")):
    sys.path.insert(0, REFERENCE_ROOT)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from msa_tts_tpu.models import (  # noqa: E402
    config_from_params,
    tacotron2nv_forward,
    tacotron2nv_infer,
)
from msa_tts_tpu.utils.torch_import import state_dict_to_pytrees  # noqa: E402

MODEL_PARAMS = {
    "mask_padding": True,
    "n_mel_channels": 10,
    "n_frames_per_step": 1,
    "n_symbols": 50,
    "symbols_embedding_dim": 16,
    "encoder_n_convolutions": 2,
    "encoder_embedding_dim": 16,
    "encoder_kernel_size": 5,
    "speaker_emb_type": "static",
    "num_speakers": 4,
    "speaker_embedding_dim": 6,
    "speaker_embedding_dim_lin": 4,
    # equal rnn dims sidestep the reference's swapped-argument quirk
    # (tacotron2nv.py:52-54)
    "attention_rnn_dim": 24,
    "decoder_rnn_dim": 24,
    "prenet_dim": 12,
    "max_decoder_steps": 25,
    "gate_threshold": 0.5,
    "p_attention_dropout": 0.1,
    "p_decoder_dropout": 0.1,
    "decoder_no_early_stopping": False,
    "postnet_embedding_dim": 16,
    "postnet_kernel_size": 5,
    "postnet_n_convolutions": 3,
    "use_residual_encoder": False,
    "freeze_charemb": False,
    "freeze_encoder": False,
    "freeze_decoder": False,
    "attention_params": {
        "attention_type": "ForwardAttention",
        "attention_dim": 16,
        "attention_location_n_filters": 8,
        "attention_location_kernel_size": 15,
        "windowing": False,
        "norm": "softmax",
        "forward_attn": True,
        "trans_agent": True,
        "forward_attn_mask": False,
    },
}


@pytest.fixture(scope="module")
def ref_model():
    from msa_tts.models.tacotron2nv import Tacotron2NV

    torch.manual_seed(0)
    model = Tacotron2NV(dict(MODEL_PARAMS))
    model.eval()
    return model


@pytest.fixture(scope="module")
def our_model(ref_model):
    params_dict = dict(MODEL_PARAMS)
    params_dict["p_prenet_dropout"] = 0.0  # disabled for determinism
    cfg = config_from_params(params_dict)
    params, state = state_dict_to_pytrees(ref_model.state_dict(), cfg)
    return cfg, params, state


@pytest.fixture()
def no_dropout(monkeypatch):
    """Disable the reference's always-on prenet dropout for determinism."""
    monkeypatch.setattr(
        torch.nn.functional, "dropout",
        lambda x, *a, **k: x,
    )


def _batch(seed=0, B=3, T_in=12, T_mel=18):
    rng = np.random.default_rng(seed)
    lengths = np.array([T_in, T_in - 3, T_in - 5])
    inputs = rng.integers(1, MODEL_PARAMS["n_symbols"], (B, T_in))
    for b, L in enumerate(lengths):
        inputs[b, L:] = 0
    mels = rng.standard_normal(
        (B, MODEL_PARAMS["n_mel_channels"], T_mel)
    ).astype(np.float32)
    mel_lengths = np.array([T_mel, T_mel - 4, T_mel - 7])
    spk = rng.standard_normal(
        (B, MODEL_PARAMS["speaker_embedding_dim"])
    ).astype(np.float32)
    return inputs, lengths, mels, mel_lengths, spk


def test_forward_parity(ref_model, our_model, no_dropout):
    inputs, in_len, mels, mel_len, spk = _batch()
    with torch.no_grad():
        t_out = ref_model(
            torch.from_numpy(inputs).long(),
            torch.from_numpy(in_len).long(),
            torch.from_numpy(mels),
            torch.from_numpy(mel_len).long(),
            torch.from_numpy(spk),
        )
    cfg, params, state = our_model
    outs, _ = tacotron2nv_forward(
        params, state, cfg,
        jnp.asarray(inputs), jnp.asarray(in_len), jnp.asarray(mels),
        jnp.asarray(mel_len), jnp.asarray(spk),
        jax.random.PRNGKey(0), train=False,
    )
    names = ["mel", "mel_postnet", "gate", "alignments"]
    for name, ours, theirs in zip(names, outs, t_out):
        np.testing.assert_allclose(
            np.asarray(ours),
            theirs.numpy(),
            atol=2e-4,
            rtol=1e-3,
            err_msg=f"output {name} diverges from reference",
        )


def test_forward_parity_learnable_lookup(no_dropout):
    from msa_tts.models.tacotron2nv import Tacotron2NV

    mp = dict(MODEL_PARAMS)
    mp["speaker_emb_type"] = "learnable_lookup"
    torch.manual_seed(1)
    ref = Tacotron2NV(mp)
    ref.eval()

    mp2 = dict(mp)
    mp2["p_prenet_dropout"] = 0.0
    cfg = config_from_params(mp2)
    params, state = state_dict_to_pytrees(ref.state_dict(), cfg)

    inputs, in_len, mels, mel_len, _ = _batch(seed=3)
    spk_ids = np.array([0, 1, 3])
    with torch.no_grad():
        t_out = ref(
            torch.from_numpy(inputs).long(),
            torch.from_numpy(in_len).long(),
            torch.from_numpy(mels),
            torch.from_numpy(mel_len).long(),
            torch.from_numpy(spk_ids).long(),
        )
    outs, _ = tacotron2nv_forward(
        params, state, cfg,
        jnp.asarray(inputs), jnp.asarray(in_len), jnp.asarray(mels),
        jnp.asarray(mel_len), jnp.asarray(spk_ids),
        jax.random.PRNGKey(0), train=False,
    )
    np.testing.assert_allclose(
        np.asarray(outs[1]), t_out[1].numpy(), atol=2e-4, rtol=1e-3
    )


def test_infer_parity(ref_model, our_model, no_dropout):
    """Autoregressive inference must match the reference step for step."""
    inputs, in_len, _, _, spk = _batch(seed=5)
    with torch.no_grad():
        mel_t, _, _, mel_len_t = _ref_infer(ref_model, inputs, in_len, spk)

    cfg, params, state = our_model
    mel_post, mel_lengths, align = tacotron2nv_infer(
        params, state, cfg,
        jnp.asarray(inputs), jnp.asarray(in_len), jnp.asarray(spk),
        jax.random.PRNGKey(0),
    )
    n_steps = mel_t.shape[2]
    np.testing.assert_array_equal(
        np.asarray(mel_lengths), mel_len_t.numpy()
    )
    np.testing.assert_allclose(
        np.asarray(mel_post)[:, :, :n_steps],
        mel_t.numpy(),
        atol=5e-4,
        rtol=1e-2,
    )


def _ref_infer(ref_model, inputs, in_len, spk):
    mel_post, mel_lengths, _align = ref_model.infer(
        torch.from_numpy(inputs).long(),
        torch.from_numpy(in_len).long(),
        torch.from_numpy(spk),
    )
    return mel_post, None, None, mel_lengths


def test_torch_export_roundtrip(our_model, tmp_path):
    """Export our params to a reference-layout .pt, reload, and require
    identical pytrees — and loadable by the reference model itself."""
    from msa_tts_tpu.utils.torch_import import (
        load_torch_checkpoint,
        save_torch_checkpoint,
    )

    cfg, params, state = our_model
    path = str(tmp_path / "export.pt")
    save_torch_checkpoint(path, params, state, cfg)
    params2, state2 = load_torch_checkpoint(path, cfg)
    import jax

    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(params2)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # the reference model accepts the exported state_dict verbatim
    from msa_tts.models.tacotron2nv import Tacotron2NV

    ref = Tacotron2NV(dict(MODEL_PARAMS))
    sd = torch.load(path, weights_only=True)
    ref.load_state_dict(sd)
