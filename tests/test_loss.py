"""Loss parity tests against a torch oracle built from torch.nn losses."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from msa_tts_tpu.models.loss import tacotron2_loss  # noqa: E402


def _torch_oracle(out_post, out_inner, stop_values, mel, stop_labels,
                  mel_len, reduction, pos_weight, r=1):
    """Direct torch expression of the reference loss formula
    (transcribed from the published Tacotron2 loss definition)."""
    l1 = torch.nn.L1Loss(reduction=reduction)
    mse = torch.nn.MSELoss(reduction=reduction)
    bce = torch.nn.BCEWithLogitsLoss(
        reduction=reduction, pos_weight=torch.tensor(pos_weight)
    )
    mel_t = mel.transpose(1, 2)
    a = out_inner.transpose(1, 2)
    b = out_post.transpose(1, 2)
    l1_loss = l1(b, mel_t) + l1(a, mel_t)
    mse_loss = mse(b, mel_t) + mse(a, mel_t)
    bce_loss = bce(stop_values, stop_labels)
    if reduction == "none":
        B, T, D = mel_t.shape
        ml = mel_len.numpy()
        max_len = T
        masks = torch.zeros(B, max_len, dtype=torch.bool)
        for i in range(B):
            masks[i, : ml[i]] = True
        masks = masks.unsqueeze(-1)
        weights = masks.float() / masks.sum(dim=1, keepdim=True).float()
        out_weights = weights.div(mel.size(0) * mel.size(1))
        logit_weights = weights.div(mel.size(0))
        l1_loss = l1_loss.mul(out_weights).masked_select(masks).sum()
        mse_loss = mse_loss.mul(out_weights).masked_select(masks).sum()
        bce_loss = (
            bce_loss.mul(logit_weights.squeeze(-1))
            .masked_select(masks.squeeze(-1))
            .sum()
        )
    return (l1_loss + mse_loss + bce_loss).item()


@pytest.mark.parametrize("reduction", ["none", "mean", "sum"])
def test_loss_matches_torch(np_rng, reduction):
    B, D, T = 3, 8, 12
    out_post = np_rng.standard_normal((B, D, T)).astype(np.float32)
    out_inner = np_rng.standard_normal((B, D, T)).astype(np.float32)
    stop_values = np_rng.standard_normal((B, T)).astype(np.float32)
    mel = np_rng.standard_normal((B, D, T)).astype(np.float32)
    stop_labels = (np_rng.random((B, T)) > 0.8).astype(np.float32)
    mel_len = np.array([12, 9, 5])

    expected = _torch_oracle(
        torch.from_numpy(out_post),
        torch.from_numpy(out_inner),
        torch.from_numpy(stop_values),
        torch.from_numpy(mel),
        torch.from_numpy(stop_labels),
        torch.from_numpy(mel_len),
        reduction,
        5.0,
    )
    got = float(
        tacotron2_loss(
            (
                jnp.asarray(out_inner),
                jnp.asarray(out_post),
                jnp.asarray(stop_values),
                None,
            ),
            (jnp.asarray(mel), jnp.asarray(stop_labels)),
            jnp.asarray(mel_len),
            n_frames_per_step=1,
            reduction=reduction,
            pos_weight=5.0,
        )
    )
    assert got == pytest.approx(expected, rel=1e-4)
