"""Tacotron-2 autoregressive decoder as masked fixed-shape scans.

Reference semantics (msa_tts/models/modules_tacotron2nv/decoder.py):
prenet (dropout always active, :9-20) → attention LSTMCell → attention →
decoder LSTMCell → linear mel projection + gate.  The reference training
loop is a Python ``while`` over frames dispatching ~10 small kernels per
step (:276-331); here it is a single ``lax.scan`` whose per-step matmuls
XLA fuses, with the prenet for *all* teacher-forced frames hoisted into
one batched MXU matmul before the scan.  Inference is a
``lax.while_loop`` with preallocated output buffers, gate-threshold early
stopping, and ``max_decoder_steps`` capping (:333-411).

Note: the reference caller swaps ``attention_rnn_dim``/``decoder_rnn_dim``
(tacotron2nv.py:52-54 vs decoder.py:80-82).  We use the correct mapping;
configs with equal dims (the usual case) are unaffected.

With ``n_frames_per_step > 1`` the reference's gate/stop-label shapes
disagree (decoder emits one gate per step, labels are per frame); we
repeat the gate over the reduction factor, which is the NVIDIA-Tacotron2
behavior and is identical for r == 1.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import nn as N
from ..ops import rnn as R
from ..ops.masking import sequence_mask
from . import attention as ATT


# --------------------------------------------------------------------------
# Prenet
# --------------------------------------------------------------------------

def init_prenet(rng, in_dim: int, sizes):
    in_sizes = [in_dim] + list(sizes[:-1])
    ks = jax.random.split(rng, len(sizes))
    return {
        "layers": [
            N.init_linear(k, i, o, bias=False)
            for k, i, o in zip(ks, in_sizes, sizes)
        ]
    }


def prenet_apply(params, x, rng, dropout_rate: float = 0.5):
    """Prenet with dropout *always* active (reference decoder.py:17-20) —
    the rng is therefore required even at inference."""
    for i, layer in enumerate(params["layers"]):
        x = jax.nn.relu(N.linear(layer, x))
        x = N.dropout(
            jax.random.fold_in(rng, i), x, dropout_rate, deterministic=False
        )
    return x


# --------------------------------------------------------------------------
# Postnet
# --------------------------------------------------------------------------

def init_postnet(rng, n_mel_channels: int, embedding_dim: int,
                 kernel_size: int, n_convolutions: int):
    ks = jax.random.split(rng, n_convolutions)
    convs = []
    state = []
    for i in range(n_convolutions):
        in_ch = n_mel_channels if i == 0 else embedding_dim
        out_ch = n_mel_channels if i == n_convolutions - 1 else embedding_dim
        gain = "linear" if i == n_convolutions - 1 else "tanh"
        conv = N.init_conv1d(
            ks[i], in_ch, out_ch, kernel_size, bias=True, w_init_gain=gain
        )
        bn_p, bn_s = N.init_batchnorm(out_ch)
        convs.append({"conv": conv, "bn": bn_p})
        state.append(bn_s)
    return {"convolutions": convs}, {"convolutions": state}


def postnet_apply(params, state, x, *, rng=None, train: bool = True,
                  kernel_size: int = 5, dropout_rate: float = 0.5,
                  width=None):
    """Postnet on (B, n_mel, T): conv→BN→tanh (except last) → dropout.

    ``width`` (traced scalar) makes the stack behave as if the input
    were only ``width`` frames wide inside a fixed-``T`` buffer: zeroing
    columns ≥ width before EVERY conv reproduces the conv zero-padding a
    ``width``-frame input would see at its right edge (columns past
    width turn non-zero after BN, so one up-front mask is not enough).
    Columns < width of the result are then bit-identical to running the
    stack on ``x[..., :width]``; callers slice those and discard the
    rest.  Serving streams use this to run every postnet window — the
    data-dependent final window included — through one compiled shape.
    """
    n = len(params["convolutions"])
    new_state = []
    rngs = jax.random.split(rng, n) if rng is not None else [None] * n
    pad = (kernel_size - 1) // 2
    valid = (
        None if width is None
        else jnp.arange(x.shape[-1]) < width
    )
    for i, layer in enumerate(params["convolutions"]):
        if valid is not None:
            x = jnp.where(valid, x, 0.0)
        x = N.conv1d(layer["conv"], x, padding=pad)
        x, bn_s = N.batchnorm1d(
            layer["bn"], state["convolutions"][i], x, train=train
        )
        new_state.append(bn_s)
        if i < n - 1:
            x = jnp.tanh(x)
        x = N.dropout(
            rngs[i], x, dropout_rate,
            deterministic=(not train or rng is None),
        )
    return x, {"convolutions": new_state}


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

class DecoderConfig(NamedTuple):
    n_mel_channels: int
    n_frames_per_step: int
    encoder_embedding_dim: int
    attention_rnn_dim: int
    decoder_rnn_dim: int
    prenet_dim: int
    max_decoder_steps: int
    gate_threshold: float
    p_attention_dropout: float
    p_decoder_dropout: float
    early_stopping: bool
    attention_params: dict
    p_prenet_dropout: float = 0.5
    # lax.scan unroll factor for the teacher-forced frame loop (TPU perf
    # knob: higher = fewer scan iterations, bigger compiled body).
    scan_unroll: int = 1
    # Rematerialize each teacher-forced step on the backward pass:
    # stores only the inter-step carries (~KBs/row) instead of every
    # step's internals (~100s of KB/row × T_dec), trading recompute the
    # latency-bound decoder has spare cycles for.  This is THE memory
    # lever for large meta-batches (see BENCHMARKS.md batch sweep).
    # True  = full remat (save only the carries; recompute everything).
    # "dots" = selective remat (jax.checkpoint_policies.dots_saveable):
    #          keep every matmul (dot_general) output — the LSTM gate
    #          PRE-activations included — and recompute elementwise ops
    #          (post-sigmoid/tanh gate values among them): far cheaper
    #          recompute than full remat at a fraction of no-remat's
    #          activation memory.
    scan_remat: bool | str = False


def init_decoder(rng, cfg: DecoderConfig):
    ks = jax.random.split(rng, 6)
    ap = cfg.attention_params
    attn_type = ap["attention_type"]
    if attn_type == "ForwardAttention":
        attn = ATT.init_forward_attention(
            ks[2],
            cfg.attention_rnn_dim,
            cfg.encoder_embedding_dim,
            ap["attention_dim"],
            location_attention=ap.get("location_attention", True),
            attention_location_n_filters=ap["attention_location_n_filters"],
            attention_location_kernel_size=ap["attention_location_kernel_size"],
            trans_agent=ap.get("trans_agent", True),
        )
    elif attn_type == "LSA":
        attn = ATT.init_lsa(
            ks[2],
            cfg.attention_rnn_dim,
            cfg.encoder_embedding_dim,
            ap["attention_dim"],
            ap["attention_location_n_filters"],
            ap["attention_location_kernel_size"],
        )
    else:
        raise ValueError(f"attention type {attn_type} not defined")

    return {
        "prenet": init_prenet(
            ks[0],
            cfg.n_mel_channels * cfg.n_frames_per_step,
            [cfg.prenet_dim, cfg.prenet_dim],
        ),
        "attention_rnn": R.init_lstm_cell(
            ks[1],
            cfg.prenet_dim + cfg.encoder_embedding_dim,
            cfg.attention_rnn_dim,
        ),
        "attention_layer": attn,
        "decoder_rnn": R.init_lstm_cell(
            ks[3],
            cfg.attention_rnn_dim + cfg.encoder_embedding_dim,
            cfg.decoder_rnn_dim,
        ),
        "linear_projection": N.init_linear(
            ks[4],
            cfg.decoder_rnn_dim + cfg.encoder_embedding_dim,
            cfg.n_mel_channels * cfg.n_frames_per_step,
        ),
        "gate_layer": N.init_linear(
            ks[5],
            cfg.decoder_rnn_dim + cfg.encoder_embedding_dim,
            1,
            bias=True,
            w_init_gain="sigmoid",
        ),
    }


class DecoderCarry(NamedTuple):
    attention_hidden: jax.Array
    attention_cell: jax.Array
    decoder_hidden: jax.Array
    decoder_cell: jax.Array
    attention_context: jax.Array
    attn_state: ATT.AttnState


def _init_carry(cfg: DecoderConfig, batch: int, t_in: int, dtype):
    return DecoderCarry(
        attention_hidden=jnp.zeros((batch, cfg.attention_rnn_dim), dtype),
        attention_cell=jnp.zeros((batch, cfg.attention_rnn_dim), dtype),
        decoder_hidden=jnp.zeros((batch, cfg.decoder_rnn_dim), dtype),
        decoder_cell=jnp.zeros((batch, cfg.decoder_rnn_dim), dtype),
        attention_context=jnp.zeros(
            (batch, cfg.encoder_embedding_dim), dtype
        ),
        attn_state=ATT.init_attn_state(batch, t_in, dtype),
    )


def _attn_fns(cfg: DecoderConfig):
    ap = cfg.attention_params
    if ap["attention_type"] == "ForwardAttention":
        prep = ATT.preprocess_inputs

        def step(params, query, inputs, processed, st, mask, training):
            return ATT.forward_attention(
                params, query, inputs, processed, st, mask,
                location_attention=ap.get("location_attention", True),
                windowing=ap.get("windowing", False),
                norm=ap.get("norm", "softmax"),
                forward_attn=ap.get("forward_attn", True),
                trans_agent=ap.get("trans_agent", True),
                forward_attn_mask=ap.get("forward_attn_mask", False),
                training=training,
                mask_energies=ap.get("mask_energies", False),
            )

        return prep, step
    else:
        return ATT.preprocess_inputs_lsa, (
            lambda params, query, inputs, processed, st, mask, training:
            ATT.lsa_attention(params, query, inputs, processed, st, mask)
        )


def _decode_step(
    params,
    cfg: DecoderConfig,
    attn_step_fn,
    carry: DecoderCarry,
    prenet_out,
    encoder_outputs,
    processed_inputs,
    mask,
    rng,
    *,
    training: bool,
):
    """One decoder step (reference decoder.py:234-274)."""
    cell_input = jnp.concatenate(
        [prenet_out, carry.attention_context], axis=-1
    )
    attn_h, attn_c = R.lstm_cell(
        params["attention_rnn"],
        cell_input,
        (carry.attention_hidden, carry.attention_cell),
    )
    k1, k2 = (
        jax.random.split(rng) if rng is not None else (None, None)
    )
    attn_h = N.dropout(
        k1, attn_h, cfg.p_attention_dropout,
        deterministic=(not training or rng is None),
    )

    context, alignment, attn_state = attn_step_fn(
        params["attention_layer"],
        attn_h,
        encoder_outputs,
        processed_inputs,
        carry.attn_state,
        mask,
        training,
    )

    dec_input = jnp.concatenate([attn_h, context], axis=-1)
    dec_h, dec_c = R.lstm_cell(
        params["decoder_rnn"],
        dec_input,
        (carry.decoder_hidden, carry.decoder_cell),
    )
    dec_h = N.dropout(
        k2, dec_h, cfg.p_decoder_dropout,
        deterministic=(not training or rng is None),
    )

    dec_h_ctx = jnp.concatenate([dec_h, context], axis=-1)
    mel_out = N.linear(params["linear_projection"], dec_h_ctx)
    gate = N.linear(params["gate_layer"], dec_h_ctx)

    new_carry = DecoderCarry(
        attention_hidden=attn_h,
        attention_cell=attn_c,
        decoder_hidden=dec_h,
        decoder_cell=dec_c,
        attention_context=context,
        attn_state=attn_state,
    )
    return new_carry, (mel_out, gate, alignment)


def decoder_forward(
    params,
    cfg: DecoderConfig,
    encoder_outputs,
    decoder_targets,
    input_lengths,
    rng,
    *,
    training: bool = True,
):
    """Teacher-forced decoding.

    Args:
      encoder_outputs: (B, T_in, E).
      decoder_targets: (B, n_mel, T_mel) ground-truth mels, T_mel a
        multiple of ``n_frames_per_step``.
      input_lengths: (B,) encoder valid lengths.
      rng: PRNG key (prenet dropout is always active, so required).

    Returns ``(mel_outputs (B, n_mel, T_mel), gate_outputs (B, T_mel),
    alignments (B, T_dec, T_in))``.
    """
    B, n_mel, T_mel = decoder_targets.shape
    r = cfg.n_frames_per_step
    T_dec = T_mel // r
    dtype = encoder_outputs.dtype

    # (B, n_mel, T_mel) → (T_dec, B, n_mel·r); prepend the go frame.
    tgt = jnp.swapaxes(decoder_targets, 1, 2).reshape(B, T_dec, n_mel * r)
    tgt = jnp.swapaxes(tgt, 0, 1)
    go = jnp.zeros((1, B, n_mel * r), dtype)
    dec_in = jnp.concatenate([go, tgt[:-1]], axis=0)

    k_pre, k_scan = jax.random.split(rng)
    # Prenet over all frames at once — one batched MXU matmul.
    dec_in = prenet_apply(
        params["prenet"], dec_in, k_pre, dropout_rate=cfg.p_prenet_dropout
    )

    mask = sequence_mask(input_lengths, encoder_outputs.shape[1])
    prep_fn, attn_step_fn = _attn_fns(cfg)
    processed_inputs = prep_fn(params["attention_layer"], encoder_outputs)

    carry0 = _init_carry(cfg, B, encoder_outputs.shape[1], dtype)
    step_keys = jax.random.split(k_scan, T_dec)

    def scan_body(carry, inp):
        prenet_t, key_t = inp
        new_carry, outs = _decode_step(
            params, cfg, attn_step_fn, carry, prenet_t,
            encoder_outputs, processed_inputs, mask, key_t,
            training=training,
        )
        return new_carry, outs

    if cfg.scan_remat:
        # prevent_cse=False is the documented-safe setting under scan
        # (no cross-iteration CSE to defend against) and avoids the
        # checkpoint wrapper pessimizing the forward pass.
        if cfg.scan_remat == "dots":
            scan_body = jax.checkpoint(
                scan_body, prevent_cse=False,
                policy=jax.checkpoint_policies.dots_saveable,
            )
        else:
            scan_body = jax.checkpoint(scan_body, prevent_cse=False)
    _, (mels, gates, aligns) = jax.lax.scan(
        scan_body, carry0, (dec_in, step_keys), unroll=cfg.scan_unroll
    )

    # Parse outputs (reference decoder.py:207-232).
    mel_outputs = jnp.swapaxes(mels, 0, 1)  # (B, T_dec, n_mel·r)
    mel_outputs = mel_outputs.reshape(B, T_mel, n_mel)
    mel_outputs = jnp.swapaxes(mel_outputs, 1, 2)  # (B, n_mel, T_mel)
    gate_outputs = jnp.swapaxes(gates[..., 0], 0, 1)  # (B, T_dec)
    gate_outputs = jnp.repeat(gate_outputs, r, axis=1)  # (B, T_mel)
    alignments = jnp.swapaxes(aligns, 0, 1)  # (B, T_dec, T_in)
    return mel_outputs, gate_outputs, alignments


def decoder_infer(
    params,
    cfg: DecoderConfig,
    encoder_outputs,
    input_lengths,
    rng,
    *,
    training: bool = False,
):
    """Autoregressive inference with gate-threshold early stopping.

    Fixed-shape: output buffers are preallocated at ``max_decoder_steps``
    and the while-loop exits early once every utterance has fired its
    gate (or at the cap).  Returns
    ``(mel_outputs (B, n_mel, max_steps·r), gate_outputs (B, max_steps·r),
    alignments (B, max_steps, T_in), mel_lengths (B,), n_steps)``
    where ``mel_lengths`` counts decoder steps while un-finished
    (reference decoder.py:394-398).
    """
    B, T_in, _ = encoder_outputs.shape
    r = cfg.n_frames_per_step
    n_mel = cfg.n_mel_channels
    max_steps = cfg.max_decoder_steps
    dtype = encoder_outputs.dtype

    mask = sequence_mask(input_lengths, T_in)
    prep_fn, attn_step_fn = _attn_fns(cfg)
    processed_inputs = prep_fn(params["attention_layer"], encoder_outputs)
    carry0 = _init_carry(cfg, B, T_in, dtype)

    mels_buf = jnp.zeros((max_steps, B, n_mel * r), dtype)
    gates_buf = jnp.full((max_steps, B), 1e3, dtype)
    aligns_buf = jnp.zeros((max_steps, B, T_in), dtype)

    init_state = dict(
        step=jnp.asarray(0, jnp.int32),
        decoder_input=jnp.zeros((B, n_mel * r), dtype),
        carry=carry0,
        not_finished=jnp.ones((B,), jnp.int32),
        mel_lengths=jnp.zeros((B,), jnp.int32),
        mels=mels_buf,
        gates=gates_buf,
        aligns=aligns_buf,
    )

    def cond(s):
        under_cap = s["step"] < max_steps
        if cfg.early_stopping:
            return under_cap & (jnp.sum(s["not_finished"]) > 0)
        return under_cap

    def body(s):
        step = s["step"]
        core = {k: s[k] for k in _INFER_CORE_KEYS}
        new_core, (mel_out, gate_col, alignment) = _infer_step(
            params, cfg, attn_step_fn, encoder_outputs,
            processed_inputs, mask, rng, core, training=training,
        )
        return dict(
            new_core,
            mels=s["mels"].at[step].set(mel_out),
            gates=s["gates"].at[step].set(gate_col),
            aligns=s["aligns"].at[step].set(alignment),
        )

    final = jax.lax.while_loop(cond, body, init_state)

    mel_outputs = jnp.swapaxes(final["mels"], 0, 1)  # (B, S, n_mel·r)
    mel_outputs = mel_outputs.reshape(B, max_steps * r, n_mel)
    mel_outputs = jnp.swapaxes(mel_outputs, 1, 2)
    gate_outputs = jnp.repeat(
        jnp.swapaxes(final["gates"], 0, 1), r, axis=1
    )
    alignments = jnp.swapaxes(final["aligns"], 0, 1)
    return (
        mel_outputs,
        gate_outputs,
        alignments,
        final["mel_lengths"],
        final["step"],
    )


# ---------------------------------------------------------------------------
# Streaming (segmented) inference
# ---------------------------------------------------------------------------

_INFER_CORE_KEYS = (
    "step", "decoder_input", "carry", "not_finished", "mel_lengths",
)


def _infer_step(params, cfg: DecoderConfig, attn_step_fn, encoder_outputs,
                processed_inputs, mask, rng, s, *, training: bool):
    """ONE autoregressive decoder step, shared by the offline while-loop
    (``decoder_infer``) and the streaming segment scan
    (``decoder_infer_segment``).  The streaming path's bit-exact-chaining
    contract rests on both using this single body: same
    ``fold_in(rng, absolute_step)`` key schedule, same gate/carry math."""
    step = s["step"]
    k_step = jax.random.fold_in(rng, step)
    k_pre, k_dec = jax.random.split(k_step)
    prenet_out = prenet_apply(
        params["prenet"], s["decoder_input"], k_pre,
        dropout_rate=cfg.p_prenet_dropout,
    )
    new_carry, (mel_out, gate, alignment) = _decode_step(
        params, cfg, attn_step_fn, s["carry"], prenet_out,
        encoder_outputs, processed_inputs, mask, k_dec,
        training=training,
    )
    dec = (
        jax.nn.sigmoid(gate[:, 0]) <= cfg.gate_threshold
    ).astype(jnp.int32)
    not_finished = s["not_finished"] * dec
    new_s = dict(
        step=step + 1,
        decoder_input=mel_out,
        carry=new_carry,
        not_finished=not_finished,
        mel_lengths=s["mel_lengths"] + not_finished,
    )
    return new_s, (mel_out, gate[:, 0], alignment)


def decoder_stream_init(cfg: DecoderConfig, batch: int, t_in: int, dtype):
    """Initial carried state for segmented autoregressive decoding —
    the same quantities ``decoder_infer``'s while-loop carries, minus
    the preallocated output buffers (segments return their own)."""
    return dict(
        step=jnp.asarray(0, jnp.int32),
        decoder_input=jnp.zeros(
            (batch, cfg.n_mel_channels * cfg.n_frames_per_step), dtype
        ),
        carry=_init_carry(cfg, batch, t_in, dtype),
        not_finished=jnp.ones((batch,), jnp.int32),
        mel_lengths=jnp.zeros((batch,), jnp.int32),
    )


def decoder_infer_segment(
    params,
    cfg: DecoderConfig,
    encoder_outputs,
    input_lengths,
    rng,
    state: dict,
    n_seg: int,
    *,
    training: bool = False,
):
    """Run ``n_seg`` autoregressive steps from ``state`` and return
    ``(new_state, mels (B, n_mel, n_seg·r), gates (B, n_seg),
    alignments (B, n_seg, T_in))``.

    Chaining segments reproduces ``decoder_infer`` EXACTLY (same
    ``fold_in(rng, absolute_step)`` per-step keys, same carry math) —
    the streaming path is the offline path cut into jit-once pieces, so
    time-to-first-audio shrinks without a quality fork.  Steps past the
    gate keep running inside a segment (wasted-but-correct compute);
    the caller stops requesting segments once ``not_finished`` is all
    zero or ``step`` reaches ``max_decoder_steps``.
    """
    B, T_in, _ = encoder_outputs.shape
    dtype = encoder_outputs.dtype
    mask = sequence_mask(input_lengths, T_in)
    prep_fn, attn_step_fn = _attn_fns(cfg)
    processed_inputs = prep_fn(params["attention_layer"], encoder_outputs)

    def body(s, _):
        return _infer_step(
            params, cfg, attn_step_fn, encoder_outputs,
            processed_inputs, mask, rng, s, training=training,
        )

    new_state, (mels, gates, aligns) = jax.lax.scan(
        body, state, None, length=n_seg
    )
    r = cfg.n_frames_per_step
    mels = jnp.swapaxes(mels, 0, 1)                 # (B, n_seg, n_mel·r)
    mels = mels.reshape(B, n_seg * r, cfg.n_mel_channels)
    mels = jnp.swapaxes(mels, 1, 2)                 # (B, n_mel, n_seg·r)
    gates = jnp.swapaxes(gates, 0, 1)
    aligns = jnp.swapaxes(aligns, 0, 1)
    return new_state, mels, gates, aligns
