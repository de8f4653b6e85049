"""Tacotron-2 training loss.

L1 + MSE on both pre- and post-net mels plus positively-weighted BCE stop
loss, with the reference's per-frame weighted "none"-reduction variant
(mask normalized per utterance, mel term divided by ``B·n_mel``, gate
term by ``B`` — msa_tts/models/modules_tacotron2nv/tacotron2nv_loss.py:29-50).
Implemented as one fused masked jnp expression; runs inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bce_with_logits(logits, labels, pos_weight: float):
    """Elementwise BCE-with-logits with positive-class weighting
    (torch.nn.BCEWithLogitsLoss semantics)."""
    log_sig = jax.nn.log_sigmoid(logits)
    log_sig_neg = jax.nn.log_sigmoid(-logits)
    return -(pos_weight * labels * log_sig + (1.0 - labels) * log_sig_neg)


def _pad_mask(mel_lengths, t_pad: int):
    """Valid-frame mask of length ``t_pad``.  The reference's _pad_mask
    (tacotron2nv_loss.py:55-61) pads the mask length to a reduction-
    factor multiple; here the collator already guarantees ``t_pad`` is
    one, so only the valid-length comparison remains."""
    ids = jnp.arange(t_pad)
    return (ids[None, :] < mel_lengths[:, None]).astype(jnp.float32)


def tacotron2_loss(
    model_output,
    targets,
    mel_lengths,
    *,
    n_frames_per_step: int = 1,
    reduction: str = "none",
    pos_weight: float = 1.0,
):
    """Compute the total loss.

    Args:
      model_output: ``(mel_outputs, mel_outputs_postnet, gate_outputs,
        alignments)`` — note the trainer passes them in the order
        ``(out_post, out_inner, ...)``; the loss is symmetric in the two
        mel terms so ordering does not matter.
      targets: ``(mel_gt (B, n_mel, T), stop_labels (B, T))``.
      mel_lengths: (B,) valid mel frame counts.

    Returns scalar loss.
    """
    outputs, postnet_outputs, stop_values, _ = model_output
    mel, stop_labels = targets

    # (B, n_mel, T) → (B, T, n_mel)
    mel_t = jnp.swapaxes(mel, 1, 2)
    out_t = jnp.swapaxes(outputs, 1, 2)
    post_t = jnp.swapaxes(postnet_outputs, 1, 2)

    l1 = jnp.abs(post_t - mel_t) + jnp.abs(out_t - mel_t)
    mse = (post_t - mel_t) ** 2 + (out_t - mel_t) ** 2
    bce = _bce_with_logits(stop_values, stop_labels, pos_weight)

    if reduction == "mean":
        return l1.mean() + mse.mean() + bce.mean()
    if reduction == "sum":
        return l1.sum() + mse.sum() + bce.sum()
    if reduction != "none":
        raise ValueError(f"unknown reduction: {reduction}")

    B, T, n_mel = mel_t.shape
    mask = _pad_mask(mel_lengths, T)  # (B, T)
    weights = mask / jnp.maximum(
        jnp.sum(mask, axis=1, keepdims=True), 1.0
    )
    # weights already zero out padded frames — no second mask needed
    out_weights = (weights / (B * n_mel))[..., None]  # (B, T, 1)
    logit_weights = weights / B  # (B, T)

    l1_loss = jnp.sum(l1 * out_weights)
    mse_loss = jnp.sum(mse * out_weights)
    bce_loss = jnp.sum(bce * logit_weights)
    return l1_loss + mse_loss + bce_loss


class Tacotron2Loss:
    """Callable wrapper mirroring the reference's criterion API."""

    def __init__(self, n_frames_per_step: int, reduction: str,
                 pos_weight: float, device=None):
        self.n_frames_per_step = n_frames_per_step
        self.reduction = reduction
        self.pos_weight = pos_weight

    def __call__(self, model_output, targets, mel_len):
        return tacotron2_loss(
            model_output,
            targets,
            mel_len,
            n_frames_per_step=self.n_frames_per_step,
            reduction=self.reduction,
            pos_weight=self.pos_weight,
        )
