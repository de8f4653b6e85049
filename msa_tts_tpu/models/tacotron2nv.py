"""Speaker-conditioned Tacotron-2 acoustic model (flagship model).

Functional re-design of the reference model
(msa_tts/models/tacotron2nv.py): char embedding → conv+BiLSTM encoder
(optional residual) → speaker conditioning concat (``learnable_lookup`` /
``static`` d-vector / ``static+linear`` projected d-vector) → AR decoder
→ postnet residual → padding-masked output parse (gate energies filled
with 1e3 at padding, :68-79).

Everything is a pure function of ``(params, state, inputs, rng)``;
module freezing (``freeze_charemb``/``freeze_encoder``/``freeze_decoder``)
is implemented with ``stop_gradient``, the JAX equivalent of the
reference's ``.detach()`` calls (:90-121).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops.masking import sequence_mask
from .decoder import (
    DecoderConfig,
    decoder_forward,
    decoder_infer,
    init_decoder,
    init_postnet,
    postnet_apply,
)
from .encoder import encoder_apply, init_encoder


class ModelConfig(NamedTuple):
    """Static model hyperparameters (mirrors the reference's
    ``params["model"]`` dict vocabulary)."""

    n_symbols: int
    symbols_embedding_dim: int
    encoder_n_convolutions: int
    encoder_embedding_dim: int
    encoder_kernel_size: int
    n_mel_channels: int
    n_frames_per_step: int
    speaker_emb_type: str          # learnable_lookup | static | static+linear
    num_speakers: int
    speaker_embedding_dim: int
    speaker_embedding_dim_lin: int
    attention_rnn_dim: int
    decoder_rnn_dim: int
    prenet_dim: int
    max_decoder_steps: int
    gate_threshold: float
    p_attention_dropout: float
    p_decoder_dropout: float
    early_stopping: bool
    postnet_embedding_dim: int
    postnet_kernel_size: int
    postnet_n_convolutions: int
    attention_params: dict
    mask_padding: bool = True
    use_residual_encoder: bool = False
    freeze_charemb: bool = False
    freeze_encoder: bool = False
    freeze_decoder: bool = False
    p_prenet_dropout: float = 0.5
    scan_unroll: int = 1
    scan_remat: bool | str = False  # False | True (full) | "dots" (selective)

    @property
    def conditioned_embedding_dim(self) -> int:
        d = self.encoder_embedding_dim
        if self.speaker_emb_type in ("learnable_lookup", "static"):
            return d + self.speaker_embedding_dim
        if self.speaker_emb_type == "static+linear":
            return d + self.speaker_embedding_dim_lin
        raise ValueError(
            f"unknown speaker_emb_type: {self.speaker_emb_type}"
        )

    def decoder_config(self) -> DecoderConfig:
        return DecoderConfig(
            n_mel_channels=self.n_mel_channels,
            n_frames_per_step=self.n_frames_per_step,
            encoder_embedding_dim=self.conditioned_embedding_dim,
            attention_rnn_dim=self.attention_rnn_dim,
            decoder_rnn_dim=self.decoder_rnn_dim,
            prenet_dim=self.prenet_dim,
            max_decoder_steps=self.max_decoder_steps,
            gate_threshold=self.gate_threshold,
            p_attention_dropout=self.p_attention_dropout,
            p_decoder_dropout=self.p_decoder_dropout,
            early_stopping=self.early_stopping,
            attention_params=self.attention_params,
            p_prenet_dropout=self.p_prenet_dropout,
            scan_unroll=self.scan_unroll,
            scan_remat=self.scan_remat,
        )


def config_from_params(model_params: dict) -> ModelConfig:
    """Build a :class:`ModelConfig` from a reference-style ``model`` dict."""
    p = dict(model_params)
    return ModelConfig(
        n_symbols=p["n_symbols"],
        symbols_embedding_dim=p["symbols_embedding_dim"],
        encoder_n_convolutions=p["encoder_n_convolutions"],
        encoder_embedding_dim=p["encoder_embedding_dim"],
        encoder_kernel_size=p["encoder_kernel_size"],
        n_mel_channels=p["n_mel_channels"],
        n_frames_per_step=p["n_frames_per_step"],
        speaker_emb_type=p["speaker_emb_type"],
        num_speakers=p.get("num_speakers", 1),
        speaker_embedding_dim=p.get("speaker_embedding_dim", 0),
        speaker_embedding_dim_lin=p.get("speaker_embedding_dim_lin", 0),
        attention_rnn_dim=p["attention_rnn_dim"],
        decoder_rnn_dim=p["decoder_rnn_dim"],
        prenet_dim=p["prenet_dim"],
        max_decoder_steps=p["max_decoder_steps"],
        gate_threshold=p["gate_threshold"],
        p_attention_dropout=p["p_attention_dropout"],
        p_decoder_dropout=p["p_decoder_dropout"],
        early_stopping=not p.get("decoder_no_early_stopping", False),
        postnet_embedding_dim=p["postnet_embedding_dim"],
        postnet_kernel_size=p["postnet_kernel_size"],
        postnet_n_convolutions=p["postnet_n_convolutions"],
        attention_params=p["attention_params"],
        mask_padding=p.get("mask_padding", True),
        use_residual_encoder=p.get("use_residual_encoder", False),
        freeze_charemb=p.get("freeze_charemb", False),
        freeze_encoder=p.get("freeze_encoder", False),
        freeze_decoder=p.get("freeze_decoder", False),
        p_prenet_dropout=p.get("p_prenet_dropout", 0.5),
        scan_unroll=p.get("scan_unroll", 1),
        scan_remat=p.get("scan_remat", False),
    )


def init_tacotron2nv(rng, cfg: ModelConfig):
    """Initialize parameters and mutable state (batch-norm statistics)."""
    ks = jax.random.split(rng, 5)
    params: dict[str, Any] = {
        "embedding": N.init_embedding(
            ks[0], cfg.n_symbols, cfg.symbols_embedding_dim,
            scaled_uniform=True,
        )
    }
    enc_params, enc_state = init_encoder(
        ks[1], cfg.encoder_n_convolutions, cfg.encoder_embedding_dim,
        cfg.encoder_kernel_size,
    )
    params["encoder"] = enc_params

    if cfg.speaker_emb_type == "learnable_lookup":
        params["speaker_embedder"] = N.init_embedding(
            ks[2], cfg.num_speakers, cfg.speaker_embedding_dim
        )
    elif cfg.speaker_emb_type == "static+linear":
        import math

        a = 1.0 / math.sqrt(cfg.speaker_embedding_dim)
        kw, kb = jax.random.split(ks[2])
        params["speaker_lin"] = {
            "weight": jax.random.uniform(
                kw,
                (cfg.speaker_embedding_dim_lin, cfg.speaker_embedding_dim),
                jnp.float32, -a, a,
            ),
            "bias": jax.random.uniform(
                kb, (cfg.speaker_embedding_dim_lin,), jnp.float32, -a, a
            ),
        }

    params["decoder"] = init_decoder(ks[3], cfg.decoder_config())
    post_params, post_state = init_postnet(
        ks[4], cfg.n_mel_channels, cfg.postnet_embedding_dim,
        cfg.postnet_kernel_size, cfg.postnet_n_convolutions,
    )
    params["postnet"] = post_params
    state = {"encoder": enc_state, "postnet": post_state}
    return params, state


def _encode(params, state, cfg: ModelConfig, inputs, input_lengths,
            speaker_vecs, rng, train: bool, mask_pad: bool = False):
    """Shared embedding→encoder→speaker-conditioning path.

    ``mask_pad`` makes the encoder output at valid positions independent
    of the padded length (see encoder.py:encoder_apply) — used by the
    serving paths; the training/parity paths keep reference semantics.
    """
    emb = N.embedding(params["embedding"], inputs)  # (B, T, D)
    if cfg.freeze_charemb:
        emb = jax.lax.stop_gradient(emb)

    k_enc = jax.random.fold_in(rng, 1) if rng is not None else None
    enc_out, enc_state = encoder_apply(
        params["encoder"], state["encoder"], jnp.swapaxes(emb, 1, 2),
        input_lengths, rng=k_enc, train=train,
        kernel_size=cfg.encoder_kernel_size, mask_pad=mask_pad,
    )
    if cfg.use_residual_encoder:
        enc_out = enc_out + emb
    if cfg.freeze_encoder:
        enc_out = jax.lax.stop_gradient(enc_out)

    if cfg.speaker_emb_type == "learnable_lookup":
        spk = N.embedding(params["speaker_embedder"], speaker_vecs)
    elif cfg.speaker_emb_type == "static":
        spk = speaker_vecs
    elif cfg.speaker_emb_type == "static+linear":
        spk = N.linear(params["speaker_lin"], speaker_vecs)
    else:
        raise ValueError(cfg.speaker_emb_type)
    spk = jnp.broadcast_to(
        spk[:, None, :], (enc_out.shape[0], enc_out.shape[1], spk.shape[-1])
    )
    return jnp.concatenate([enc_out, spk], axis=-1), enc_state


def parse_output(cfg: ModelConfig, outputs, output_lengths):
    """Zero mel outputs and fill gate energies with 1e3 at padded frames
    (reference tacotron2nv.py:68-79)."""
    if not cfg.mask_padding or output_lengths is None:
        return outputs
    mel_outputs, mel_outputs_postnet, gate_outputs, alignments = outputs
    T = mel_outputs.shape[2]
    valid = sequence_mask(output_lengths, T)  # (B, T)
    mel_mask = valid[:, None, :]
    mel_outputs = jnp.where(mel_mask, mel_outputs, 0.0)
    mel_outputs_postnet = jnp.where(mel_mask, mel_outputs_postnet, 0.0)
    gate_outputs = jnp.where(valid, gate_outputs, 1e3)
    return [mel_outputs, mel_outputs_postnet, gate_outputs, alignments]


def tacotron2nv_forward(
    params,
    state,
    cfg: ModelConfig,
    inputs,
    input_lengths,
    melspecs,
    melspec_lengths,
    speaker_vecs,
    rng,
    *,
    train: bool = True,
):
    """Teacher-forced forward pass.

    Returns ``([mel_outputs, mel_outputs_postnet, gate_outputs,
    alignments], new_state)`` with the reference's output layout
    (mels (B, n_mel, T)).
    """
    enc_cond, enc_state = _encode(
        params, state, cfg, inputs, input_lengths, speaker_vecs, rng, train
    )

    k_dec = jax.random.fold_in(rng, 2)
    mel_outputs, gate_outputs, alignments = decoder_forward(
        params["decoder"], cfg.decoder_config(), enc_cond, melspecs,
        input_lengths, k_dec, training=train,
    )
    if cfg.freeze_decoder:
        mel_outputs = jax.lax.stop_gradient(mel_outputs)
        gate_outputs = jax.lax.stop_gradient(gate_outputs)
        alignments = jax.lax.stop_gradient(alignments)

    k_post = jax.random.fold_in(rng, 3)
    post_res, post_state = postnet_apply(
        params["postnet"], state["postnet"], mel_outputs,
        rng=k_post, train=train, kernel_size=cfg.postnet_kernel_size,
    )
    mel_outputs_postnet = mel_outputs + post_res

    outputs = parse_output(
        cfg,
        [mel_outputs, mel_outputs_postnet, gate_outputs, alignments],
        melspec_lengths,
    )
    return outputs, {"encoder": enc_state, "postnet": post_state}


def tacotron2nv_infer(
    params,
    state,
    cfg: ModelConfig,
    inputs,
    input_lengths,
    speaker_vecs,
    rng,
    *,
    train: bool = False,
    mask_pad: bool = False,
    decoder_backend: str = "xla",
):
    """Autoregressive synthesis.

    Returns ``(mel_outputs_postnet (B, n_mel, max_steps·r),
    mel_lengths (B,), alignments (B, max_steps, T_in))``.
    ``mel_lengths`` is in decoder steps (multiply by ``n_frames_per_step``
    for frames).  The trailing buffer beyond ``mel_lengths`` is padding.
    ``mask_pad`` decouples the result from text-padding length (serving
    shape bucketing); default keeps reference parity — see ``_encode``.

    ``decoder_backend="pallas"`` runs the AR loop as ONE whole-loop
    Pallas kernel (models/pallas_decoder.py) — decoder weights and
    attention state VMEM-resident instead of re-read from HBM every
    step; parity-tested, falls back here when the attention config
    isn't lowered.
    """
    enc_cond, _ = _encode(
        params, state, cfg, inputs, input_lengths, speaker_vecs, rng, train,
        mask_pad=mask_pad,
    )
    k_dec = jax.random.fold_in(rng, 2)
    dcfg = cfg.decoder_config()
    use_pallas = decoder_backend == "pallas" and not train
    if use_pallas:
        from .pallas_decoder import fits_vmem, profitable, supports_config

        B_, T_ = enc_cond.shape[0], enc_cond.shape[1]
        use_pallas = (
            supports_config(dcfg)
            and profitable(B_, dcfg.n_frames_per_step)
            and fits_vmem(
                dcfg, B_, T_,
                params["decoder"]["attention_rnn"]["weight_ih"].dtype,
            )
        )
    if use_pallas:
        from .pallas_decoder import pallas_decoder_infer

        mel_outputs, gate_outputs, alignments, mel_lengths, n_steps = (
            pallas_decoder_infer(
                params["decoder"], dcfg, enc_cond, input_lengths, k_dec
            )
        )
        # The kernel accumulates in f32 regardless of the weight dtype
        # (AR exactness); the XLA decoder emits the compute dtype.
        # Re-cast so the postnet sees one dtype on either backend —
        # under bf16-cast params a f32 mel would otherwise crash the
        # postnet conv (mixed-dtype conv_general_dilated).
        mel_outputs = mel_outputs.astype(enc_cond.dtype)
    else:
        mel_outputs, gate_outputs, alignments, mel_lengths, n_steps = (
            decoder_infer(
                params["decoder"], dcfg, enc_cond,
                input_lengths, k_dec, training=train,
            )
        )
    k_post = jax.random.fold_in(rng, 3)
    post_res, _ = postnet_apply(
        params["postnet"], state["postnet"], mel_outputs,
        rng=k_post, train=train, kernel_size=cfg.postnet_kernel_size,
    )
    mel_outputs_postnet = mel_outputs + post_res
    return mel_outputs_postnet, mel_lengths, alignments
